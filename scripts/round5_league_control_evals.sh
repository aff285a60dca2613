#!/usr/bin/env bash
# De-risking evals for the 500M league claim (VERDICT r4 item 2):
#   (a) seed-43 replicate of the league run (strided static slot) vs the
#       uniform control and basic anchor;
#   (b) the wall-clock-matched control: uniform sampling given the league
#       run's wall budget (1.75B steps) vs the seed-42 league run.
# Seat-averaged paired mirrored-deal h2h throughout.
set -u
cd "$(dirname "$0")/.."
GAMES="${1:-400}"
L43=runs/ppo_splendor_500m_search_static_s43/ppo_splendor_params.npz
L42=runs/ppo_splendor_500m_search/ppo_splendor_params.npz
U42=runs/ppo_splendor_500m_uniform/ppo_splendor_params.npz
WM=runs/ppo_splendor_1750m_uniform_wallmatch/ppo_splendor_params.npz
OUT=runs/search_duels
mkdir -p "$OUT"

echo "=== s43 league replicate vs uniform control ==="
timeout 5400 python -u -m splendax.eval.cli vs-model \
  --npz "$L43" --opp-npz "$U42" --games "$GAMES" --both-seats \
  --json-out "$OUT/league_s43_vs_uniform.json" || echo "FAILED ($?)"

echo "=== s43 league replicate vs basic ==="
timeout 5400 python -u -m splendax.eval.cli vs-basic \
  --npz "$L43" --games "$GAMES" --both-seats \
  --json-out "$OUT/league_s43_vs_basic.json" || echo "FAILED ($?)"

echo "=== s42 league vs wall-matched 1.75B uniform ==="
timeout 5400 python -u -m splendax.eval.cli vs-model \
  --npz "$L42" --opp-npz "$WM" --games "$GAMES" --both-seats \
  --json-out "$OUT/league_s42_vs_wallmatch.json" || echo "FAILED ($?)"

echo "=== wall-matched 1.75B uniform vs basic ==="
timeout 5400 python -u -m splendax.eval.cli vs-basic \
  --npz "$WM" --games "$GAMES" --both-seats \
  --json-out "$OUT/wallmatch_vs_basic.json" || echo "FAILED ($?)"

echo "=== s43 league vs s42 league (cross-seed consistency) ==="
timeout 5400 python -u -m splendax.eval.cli vs-model \
  --npz "$L43" --opp-npz "$L42" --games "$GAMES" --both-seats \
  --json-out "$OUT/league_s43_vs_league_s42.json" || echo "FAILED ($?)"

echo "league control evals complete"
