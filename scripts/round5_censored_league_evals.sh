#!/usr/bin/env bash
# Information-fair league slot evals (VERDICT r4 item 7): the censored-sentinel
# 500M run vs its privileged-sentinel twin (identical protocol, seed 43,
# strided static slot — the ONLY difference is search_censored), plus the
# basic_priority anchor row.  Seat-averaged paired mirrored-deal h2h.
set -u
cd "$(dirname "$0")/.."
GAMES="${1:-400}"
CENS=runs/ppo_splendor_500m_search_censored_s43/ppo_splendor_params.npz
PRIV=runs/ppo_splendor_500m_search_static_s43/ppo_splendor_params.npz
OUT=runs/search_duels
mkdir -p "$OUT"

echo "=== censored-league vs privileged-league (s43 twins) ==="
timeout 5400 python -u -m splendax.eval.cli vs-model \
  --npz "$CENS" --opp-npz "$PRIV" --games "$GAMES" --both-seats \
  --json-out "$OUT/censored_vs_priv_league_s43.json" || echo "FAILED ($?)"

echo "=== censored-league vs basic_priority ==="
timeout 5400 python -u -m splendax.eval.cli vs-basic \
  --npz "$CENS" --games "$GAMES" --both-seats \
  --json-out "$OUT/censored_league_vs_basic_s43.json" || echo "FAILED ($?)"

echo "censored-league evals complete"
