#!/usr/bin/env bash
# Headline strength evals for the round-4 strongest bots (gumbel greedy_final,
# and the obs-only censored variant) against the standard opponents:
# basic_priority and the reference's trained checkpoint.  Seat-averaged.
set -u
cd "$(dirname "$0")/.."
GAMES="${1:-100}"
NPZ=runs/ppo_splendor_2b_h768/ppo_splendor_params.npz
REF_PT=/root/reference/runs/ppo_splendor/ppo_splendor_latest.pt
OUT=runs/search_duels
mkdir -p "$OUT"

echo "=== basic vs gumbel-gf ==="
timeout 5400 python -u -m splendax.eval.cli vs-search --algo gumbel \
  --greedy-final --gumbel-m 16 --gumbel-k0 6 --horizon 4 \
  --search-npz "$NPZ" --agent basic --games "$GAMES" --both-seats \
  --json-out "$OUT/basic_vs_gumbelgf_r4.json" || echo "FAILED ($?)"

echo "=== reference checkpoint vs gumbel-gf ==="
timeout 5400 python -u -m splendax.eval.cli vs-search --algo gumbel \
  --greedy-final --gumbel-m 16 --gumbel-k0 6 --horizon 4 \
  --search-npz "$NPZ" --torch-pt "$REF_PT" --games "$GAMES" --both-seats \
  --json-out "$OUT/refckpt_vs_gumbelgf_r4.json" || echo "FAILED ($?)"

echo "=== basic vs cgumbel-gf (obs-only) ==="
timeout 5400 python -u -m splendax.eval.cli vs-search --algo cgumbel \
  --greedy-final --gumbel-m 16 --gumbel-k0 6 --horizon 4 \
  --search-npz "$NPZ" --agent basic --games "$GAMES" --both-seats \
  --json-out "$OUT/basic_vs_cgumbelgf_r4.json" || echo "FAILED ($?)"

echo "headline evals complete"
