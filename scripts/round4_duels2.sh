#!/usr/bin/env bash
# Round-4 duel batch 2: the greedy_final acting-rule sweep.
# The argmax force-include alone moved gumbel-vs-greedy 0.850 -> 0.875;
# the remaining gap to flat-MC's 0.985 is the Gumbel acting noise (the
# paper's g+logits+sigma(q) final argmax).  greedy_final compares the last
# survivors by q-hat alone (eval-bot exploitation).  Targets: >= 0.95 vs
# greedy while staying >= 0.5 vs flat-MC at matched budget.
set -u
cd "$(dirname "$0")/.."
GAMES="${1:-100}"
NPZ=runs/ppo_splendor_2b_h768/ppo_splendor_params.npz
OUT=runs/search_duels
mkdir -p "$OUT"

echo "=== gumbel(gf) vs greedy ==="
timeout 5400 python -u scripts/search_duel.py --npz "$NPZ" \
  --a gumbel --b greedy --greedy-final --games "$GAMES" \
  --json-out "$OUT/gumbelgf_vs_greedy_h768_r4.json" || echo "FAILED ($?)"

echo "=== gumbel(gf) vs mc ==="
timeout 5400 python -u scripts/search_duel.py --npz "$NPZ" \
  --a gumbel --b mc --greedy-final --games "$GAMES" \
  --json-out "$OUT/gumbelgf_vs_mc_h768_r4.json" || echo "FAILED ($?)"

echo "=== cgumbel(gf) vs greedy ==="
timeout 5400 python -u scripts/search_duel.py --npz "$NPZ" \
  --a cgumbel --b greedy --greedy-final --games "$GAMES" \
  --json-out "$OUT/cgumbelgf_vs_greedy_h768_r4.json" || echo "FAILED ($?)"

echo "round4 duel batch 2 complete"
