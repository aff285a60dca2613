"""Pallas kernels: numerical parity with the XLA reference path.

Runs in interpreter mode on the CPU test platform; the compiled-TPU path is
exercised by bench/train runs on hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from splendax.models.actor_critic import init_params
from splendax.ops.fused_actor_critic import (
    fused_masked_forward,
    reference_masked_forward,
)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = init_params(key)
    obs = jax.random.randint(jax.random.PRNGKey(1), (300, 297), 0, 8, jnp.int32)
    mask = jax.random.bernoulli(jax.random.PRNGKey(2), 0.4, (300, 45))
    return params, obs, mask


def test_fused_matches_reference(setup):
    params, obs, mask = setup
    lf, vf = fused_masked_forward(params, obs, mask, interpret=True)
    lr, vr = reference_masked_forward(params, obs, mask)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lr), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vr), rtol=1e-5, atol=1e-5)


def test_fused_handles_no_legal_rows(setup):
    params, obs, mask = setup
    mask = mask.at[0].set(False)  # row with zero legal actions
    lf, _ = fused_masked_forward(params, obs, mask, interpret=True)
    # contract: row left unmasked (finite logits), not all BIG_NEG
    assert np.isfinite(np.asarray(lf[0])).all()
    assert (np.asarray(lf[0]) > -1e8).all()


def test_fused_non_tile_batch(setup):
    """Batch sizes that are not TILE_B multiples are padded internally."""
    params, obs, mask = setup
    for b in (1, 17, 256, 257):
        lf, vf = fused_masked_forward(params, obs[:b], mask[:b], interpret=True)
        assert lf.shape == (b, 45) and vf.shape == (b,)


def test_slab_take_rows_interpret_parity():
    """ops/ring_take.py: the monotone-slab kernel reproduces win[rank]
    exactly (interpret mode), including unaligned slab bases and the
    all-done worst case.  (Not wired into env.ring — kept as the measured
    record of a pallas-in-scan anti-optimization; see its docstring.)"""
    import numpy as np

    from splendax.ops.ring_take import SLAB, slab_take_rows

    rng = np.random.RandomState(0)
    W = 512
    win = rng.randint(-1, 90, size=(W + SLAB, 135)).astype(np.int8)
    for p in (0.03, 0.5, 1.0):
        done = rng.rand(1024) < p
        rank = np.minimum(
            np.concatenate([[0], np.cumsum(done)[:-1]]).astype(np.int32), W
        )
        got = np.asarray(
            slab_take_rows(jnp.asarray(win), jnp.asarray(rank), interpret=True)
        )
        np.testing.assert_array_equal(got, win[rank], err_msg=f"p={p}")
