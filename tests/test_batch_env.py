"""Batched lockstep env: vmap consistency, autoreset, full random rollouts."""

import jax
import jax.numpy as jnp
import numpy as np

import splendax as sx


def test_batched_reset_shapes():
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    states, obs, masks = sx.reset_batch(keys)
    assert obs.shape == (8, 297) and obs.dtype == jnp.int32
    assert masks.shape == (8, 45)
    assert np.asarray(masks).any(axis=1).all()
    # Different keys -> different deals.
    assert not (np.asarray(obs[0]) == np.asarray(obs[1])).all()


def test_batched_step_matches_single():
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    states, obs, masks = sx.reset_batch(keys)
    actions = jnp.asarray(
        [int(np.flatnonzero(np.asarray(masks[i]))[0]) for i in range(4)], jnp.int32
    )
    next_states, outs = jax.vmap(sx.step)(states, actions)
    for i in range(4):
        single = jax.tree.map(lambda x: x[i], states)
        ns, out = sx.step(single, actions[i])
        assert (np.asarray(out.obs) == np.asarray(outs.obs[i])).all()
        assert float(out.reward) == float(outs.reward[i])
        assert (np.asarray(ns.bank) == np.asarray(next_states.bank[i])).all()


def test_autoreset_replaces_done_games():
    # Force a stalemate-ish short game by driving a game to terminal manually,
    # then check autoreset swaps in a fresh state.
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    states, obs, masks = sx.reset_batch(keys)
    # Make game 0 pre-terminal: game_over after this move.
    states = states.replace(
        prestige=states.prestige.at[0, 0].set(20),
        game_over=states.game_over.at[0].set(True),
        to_play=states.to_play.at[0].set(1),
    )
    actions = jnp.asarray(
        [int(np.flatnonzero(np.asarray(sx.legal_mask(jax.tree.map(lambda x: x[i], states))))[0]) for i in range(B)],
        jnp.int32,
    )
    carry, out, obs_next, mask_next = sx.step_autoreset(states, actions, jax.random.PRNGKey(3))
    assert bool(out.terminated[0])
    assert float(out.reward[0]) != 0.0
    # Carried state 0 is a fresh game.
    assert int(carry.move_count[0]) == 0
    assert not bool(carry.game_over[0])
    assert int(np.asarray(obs_next[0])[293]) == 1  # turn_count reset
    # Games 1..3 carried forward normally.
    assert int(carry.move_count[1]) == int(states.move_count[1]) + 1


def test_full_random_rollout_on_device():
    """Thousands of plies of random legal play inside one jitted scan:
    every mask must stay consistent and games terminate & reset."""
    B, T = 16, 256

    def policy(key, mask):
        logits = jnp.where(mask, 0.0, -jnp.inf)
        return jax.random.categorical(key, logits)

    @jax.jit
    def rollout(key):
        keys = jax.random.split(key, B)
        states, obs, masks = jax.vmap(sx.reset)(keys)

        def body(carry, key):
            states, masks = carry
            akeys = jax.random.split(key, B + 1)
            actions = jax.vmap(policy)(akeys[:B], masks)
            states, out, obs_next, mask_next = sx.step_autoreset(states, actions, akeys[B])
            return (states, mask_next), (out.terminated, out.illegal_action, out.reward)

        (states, _), (dones, illegals, rewards) = jax.lax.scan(
            body, (states, masks), jax.random.split(key, T)
        )
        return dones, illegals, rewards

    dones, illegals, rewards = rollout(jax.random.PRNGKey(4))
    assert not bool(np.asarray(illegals).any()), "legal-policy rollout hit illegal action"
    assert bool(np.asarray(dones).any()), "no game finished in 256 plies"
    # Terminal rewards are in {-1, -0.1, 0, 1} and only at terminal steps.
    r = np.asarray(rewards)
    d = np.asarray(dones)
    assert set(np.round(np.unique(r[d]), 3)).issubset({-1.0, -0.1, 0.0, 1.0})
    assert (r[~d] == 0).all()


def test_lazy_import_inside_trace_is_safe():
    """Module tables must stay concrete even when engine modules are first
    imported from INSIDE an active jit trace (make_ring defers its core
    import; without ensure_compile_time_eval the bf16 tables staged into the
    open jaxpr and escaped as leaked tracers)."""
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import splendax as sx
B = 8
mk = jax.jit(lambda k: sx.make_ring(k, B))   # first engine import: mid-trace
r = mk(jax.random.PRNGKey(0))
jax.block_until_ready(r.packed)
s, obs, m = sx.reset_batch(jax.random.split(jax.random.PRNGKey(1), B))
jax.block_until_ready(obs)
print("OK", obs.shape)
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK (8, 297)" in out.stdout
