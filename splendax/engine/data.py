"""Device-constant card/noble tables for the Splendor engine.

TPU-first re-design of the reference data layer (reference:
`splendor_gym/engine/state.py:113-178` reloads + revalidates JSON from disk on
EVERY `reset()`).  Here the JSON is parsed exactly once at import time into
immutable numpy struct-of-arrays tables; the JAX rules/encode kernels close
over them as compile-time constants, so resets are pure device computation.

Card identity: integer id 0..89 in data-file order (tier 1 = ids 0..39,
tier 2 = 40..69, tier 3 = 70..89), matching the reference's sequential card-id
assignment (`state.py:122-142`) so deck-shuffle seed parity is meaningful.
Sentinel id -1 means "no card"; feature tables carry a leading all-zeros row so
`table[id + 1]` encodes absent cards as zero vectors for free.
"""

from __future__ import annotations

import json
import os

import numpy as np

# Canonical color order (reference engine/state.py:10-13).
TOKEN_COLORS = ("white", "blue", "green", "red", "black", "gold")
STANDARD_COLORS = TOKEN_COLORS[:-1]
GOLD = 5  # index of gold in token vectors

NUM_CARDS = 90
NUM_NOBLES = 10
NUM_TIERS = 3
TIER_SIZES = np.array([40, 30, 20], dtype=np.int32)  # cards per tier 1..3
TIER_OFFSETS = np.array([0, 40, 70], dtype=np.int32)  # first card id per tier
MAX_DECK = 40  # padding width for per-tier deck permutation arrays

# Default bank for the 2-player game (reference state.py:26-33).
DEFAULT_BANK = np.array([4, 4, 4, 4, 4, 5], dtype=np.int32)

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def _load() -> tuple[np.ndarray, ...]:
    with open(os.path.join(_DATA_DIR, "cards.json"), "r", encoding="utf-8") as f:
        cards = json.load(f)
    with open(os.path.join(_DATA_DIR, "nobles.json"), "r", encoding="utf-8") as f:
        nobles = json.load(f)

    tier = np.asarray(cards["tier"], dtype=np.int32)
    points = np.asarray(cards["points"], dtype=np.int32)
    color = np.asarray(cards["color"], dtype=np.int32)
    cost = np.asarray(cards["cost"], dtype=np.int32)
    if tier.shape != (NUM_CARDS,) or cost.shape != (NUM_CARDS, 5):
        raise ValueError("cards.json has unexpected shape")
    # Strict 40/30/20 validation, as the reference enforces (state.py:146-148).
    for t in (1, 2, 3):
        if int((tier == t).sum()) != int(TIER_SIZES[t - 1]):
            raise ValueError(f"cards.json must contain {TIER_SIZES[t-1]} tier-{t} cards")
    # Ids must be contiguous per tier for the TIER_OFFSETS scheme.
    if not (np.sort(tier) == tier).all():
        raise ValueError("cards.json must be ordered tier 1, then 2, then 3")

    noble_points = np.asarray(nobles["points"], dtype=np.int32)
    noble_req = np.asarray(nobles["req"], dtype=np.int32)
    if noble_req.shape != (NUM_NOBLES, 5):
        raise ValueError("nobles.json must contain 10 nobles")
    return tier, points, color, cost, noble_points, noble_req


CARD_TIER, CARD_POINTS, CARD_COLOR, CARD_COST, NOBLE_POINTS, NOBLE_REQ = _load()

# ---------------------------------------------------------------------------
# Precomputed feature tables (row 0 = "absent" sentinel; index with id + 1).
# ---------------------------------------------------------------------------

# 13-dim card features: [present, tier, points, color_onehot(5), cost(5)]
# (observation layout per reference encode.py:77-96).
CARD_FEAT13 = np.zeros((NUM_CARDS + 1, 13), dtype=np.int32)
CARD_FEAT13[1:, 0] = 1
CARD_FEAT13[1:, 1] = CARD_TIER
CARD_FEAT13[1:, 2] = CARD_POINTS
CARD_FEAT13[np.arange(1, NUM_CARDS + 1), 3 + CARD_COLOR] = 1
CARD_FEAT13[1:, 8:13] = CARD_COST

# 6-dim noble features: [present, req(5)] (reference encode.py:170-178).
NOBLE_FEAT6 = np.zeros((NUM_NOBLES + 1, 6), dtype=np.int32)
NOBLE_FEAT6[1:, 0] = 1
NOBLE_FEAT6[1:, 1:] = NOBLE_REQ

# Cost table padded with an all-zero row for id -1 (safe gathers).
CARD_COST_PAD = np.zeros((NUM_CARDS + 1, 5), dtype=np.int32)
CARD_COST_PAD[1:] = CARD_COST
CARD_COLOR_PAD = np.zeros(NUM_CARDS + 1, dtype=np.int32)
CARD_COLOR_PAD[1:] = CARD_COLOR
CARD_POINTS_PAD = np.zeros(NUM_CARDS + 1, dtype=np.int32)
CARD_POINTS_PAD[1:] = CARD_POINTS

# Take-3 combos: lexicographic 3-combinations of colors 0..4
# (reference encode.py:35); COMBO_MASK[i, c] == 1 iff combo i includes color c.
_combos = []
for a in range(5):
    for b in range(a + 1, 5):
        for c in range(b + 1, 5):
            _combos.append((a, b, c))
TAKE3_COMBOS = tuple(_combos)
COMBO_MASK = np.zeros((10, 5), dtype=np.int32)
for i, (a, b, c) in enumerate(TAKE3_COMBOS):
    COMBO_MASK[i, a] = COMBO_MASK[i, b] = COMBO_MASK[i, c] = 1
