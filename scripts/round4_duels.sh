#!/usr/bin/env bash
# Round-4 duel matrix (VERDICT r3 items 1-2), one process per duel so a
# tunnel wedge loses at most one matchup; each writes its own JSON under
# runs/search_duels/.  Sequential on purpose: the TPU is single-tenant.
#
#   bash scripts/round4_duels.sh [games-per-order]
#
# Matchups:
#   1. gumbel vs greedy  — validates the argmax force-include fix
#                          (target >= 0.95, was 0.850)
#   2. gumbel vs mc      — fix must not cost the head-to-head
#                          (stay >= 0.5 at matched budget)
#   3. cmc    vs greedy  — does the CENSORED search keep the privileged
#                          search's edge over the raw policy?
#   4. cmc    vs mc      — how much of flat-MC's strength is privileged
#                          information?
#   5. cgumbel vs greedy — same question for the gumbel search
#   6. cgumbel vs gumbel — censored-vs-privileged at matched budget
set -u
cd "$(dirname "$0")/.."
GAMES="${1:-100}"
NPZ=runs/ppo_splendor_2b_h768/ppo_splendor_params.npz
OUT=runs/search_duels
mkdir -p "$OUT"

run_duel() {
  local a="$1" b="$2" tag="$3"
  echo "=== duel $a vs $b ($GAMES games/order) ==="
  timeout 5400 python -u scripts/search_duel.py --npz "$NPZ" \
    --a "$a" --b "$b" --games "$GAMES" \
    --json-out "$OUT/${tag}_r4.json" || echo "DUEL $tag FAILED (exit $?)"
}

run_duel gumbel  greedy  gumbel_vs_greedy_h768
run_duel gumbel  mc      gumbel_vs_mc_h768
run_duel cmc     greedy  cmc_vs_greedy_h768
run_duel cmc     mc      cmc_vs_mc_h768
run_duel cgumbel greedy  cgumbel_vs_greedy_h768
run_duel cgumbel gumbel  cgumbel_vs_gumbel_h768
echo "round4 duel matrix complete"
