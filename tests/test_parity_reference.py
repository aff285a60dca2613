"""Bit-parity vs the reference python engine (skipped if not mounted).

The heavyweight sweep lives in scripts/parity_check.py; this keeps a compact
always-on regression (2 full games + MT19937 oracle draws)."""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_PATH, requires_reference


@requires_reference
def test_full_game_bit_parity():
    sys.path.insert(0, REFERENCE_PATH)
    from splendax.utils.parity import play_parity_game

    rng = np.random.RandomState(7)
    for _ in range(2):
        seed = int(rng.randint(1_000_000_000))
        plies = play_parity_game(seed, rng)
        assert plies > 0


@requires_reference
def test_initial_state_parity_many_seeds():
    sys.path.insert(0, REFERENCE_PATH)
    from splendor_gym.engine import initial_state as ref_init
    from splendor_gym.engine.encode import encode_observation as ref_encode
    import splendax as sx

    for seed in [0, 1, 42, 12345, 999999937]:
        ref_obs = ref_encode(ref_init(num_players=2, seed=seed))
        my_obs = np.asarray(sx.encode_observation(sx.initial_state_parity(seed)))
        assert (ref_obs == my_obs).all(), seed


def test_mt19937_matches_cpython():
    import random
    import jax
    import jax.numpy as jnp
    from splendax.engine import mt19937 as mt

    @jax.jit
    def draws(lo, hi, ns):
        stream = mt.init_from_seed_words(lo, hi)

        def body(stream, n):
            stream, r = mt.randbelow(stream, n)
            return stream, r

        _, rs = jax.lax.scan(body, stream, ns)
        return rs

    ns_py = [5, 5, 3, 2, 4, 1, 5, 2, 3, 4] * 4
    ns = jnp.asarray(ns_py, jnp.int32)
    for seed in [0, 1, 42, 2654435761, 2**32, 131542391100, 2**38 - 1]:
        lo = np.uint32(seed & 0xFFFFFFFF)
        hi = np.uint32(seed >> 32)
        got = [int(x) for x in draws(lo, hi, ns)]
        rng = random.Random(seed)
        want = [rng._randbelow(n) for n in ns_py]
        assert got == want, seed


@requires_reference
@pytest.mark.slow
def test_full_game_bit_parity_fuzz_wide():
    """Wider fuzz: 10 random-seeded full games, every ply compared against
    the reference engine (masks, observations, rewards, terminal state)."""
    sys.path.insert(0, REFERENCE_PATH)
    from splendax.utils.parity import play_parity_game

    rng = np.random.RandomState(1234)
    total = 0
    for _ in range(10):
        seed = int(rng.randint(1_000_000_000))
        total += play_parity_game(seed, rng)
    assert total > 100
