"""In-process per-move wall-clock of the three search bots (one process,
variants interleaved, best-of-2 — docs/PERF.md benchmark rule #7)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from splendax.utils.cache import setup_runtime
setup_runtime()
import jax
from splendax.eval import suite
from splendax.search import mc_search_policy, gumbel_search_policy, uct_search_policy
from splendax.train.checkpoint import import_params_npz
from splendax.utils.sync import sync

params = import_params_npz("runs/ppo_splendor_2b_h768/ppo_splendor_params.npz")
bots = {
    "mc(r8,h4)": mc_search_policy(8, 4, params),
    "gumbel(m16,k6,h4)": gumbel_search_policy(m=16, k0=6, horizon=4, params=params),
    "uct(s64)": uct_search_policy(64, params=params),
    "greedy": suite.model_greedy_policy(params),
}
N = 100  # games per eval; the scan always runs 100 turns
results = {}
for rep in range(2):
    for name, bot in bots.items():
        t0 = time.perf_counter()
        r = suite.eval_vs_opponent(bot, suite.model_greedy_policy(params), N, seed=7)
        dt = time.perf_counter() - t0
        results.setdefault(name, []).append(dt)
        print(f"rep{rep} {name}: {dt:.1f}s for {N}-game eval (wr={r['win_rate']:.3f})", flush=True)
print("--- best-of-2 (first rep includes compile):")
for name, ts in results.items():
    best = min(ts)
    # 100 scan turns x 1 search move per turn (agent side)
    print(f"{name}: {best:.1f}s warm -> {best/100*1000:.0f} ms per search move "
          f"(batch {N} games)", flush=True)
