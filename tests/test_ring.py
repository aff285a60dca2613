"""Fresh-game ring autoreset (splendax/env/ring.py).

The ring must reproduce `step_autoreset` semantics exactly — done lanes get
a valid, independent fresh game; live lanes are untouched; `out` keeps the
terminal step data — while consuming pre-generated games in ring order.
"""

import jax
import jax.numpy as jnp
import numpy as np

import splendax as sx
from splendax.env import ring as ring_lib


def _first_legal_actions(states, B):
    return jnp.asarray(
        [
            int(
                np.flatnonzero(
                    np.asarray(sx.legal_mask(jax.tree.map(lambda x: x[i], states)))
                )[0]
            )
            for i in range(B)
        ],
        jnp.int32,
    )


def test_make_ring_entries_are_fresh_games():
    ring = sx.make_ring(jax.random.PRNGKey(0), 16)
    assert ring.size == 16
    assert ring.obs.shape == (16, 297)
    assert ring.mask.shape == (16, 45)
    assert int(ring.ptr) == 0
    # Every entry is a consistent (state, obs, mask) triple of a fresh game.
    obs_re = jax.vmap(sx.encode_observation)(ring.state)
    mask_re = jax.vmap(sx.legal_mask)(ring.state)
    assert (np.asarray(obs_re) == np.asarray(ring.obs)).all()
    assert (np.asarray(mask_re) == np.asarray(ring.mask)).all()
    assert (np.asarray(ring.state.move_count) == 0).all()
    # Entries are distinct deals.
    assert not (np.asarray(ring.obs[0]) == np.asarray(ring.obs[1])).all()


def test_packed_rows_roundtrip_bit_exact():
    # The packed ring row must reconstruct EVERY GameState leaf of fast-mode
    # initial_state bit-for-bit.
    from splendax.env import ring as ring_mod

    keys = jax.random.split(jax.random.PRNGKey(3), 32)
    states, _, _ = sx.reset_batch(keys)
    rows = ring_mod._pack(states)
    assert rows.shape == (32, ring_mod.PACKED_WIDTH)
    rebuilt = ring_mod._unpack_state(rows)
    for name in states.__dataclass_fields__:
        a, b = np.asarray(getattr(states, name)), np.asarray(getattr(rebuilt, name))
        assert a.dtype == b.dtype and (a == b).all(), name


def test_initial_legal_mask_is_deal_independent():
    """The ring stores ONE initial mask (ring.mask0) for all fresh games —
    valid because with zero tokens no card is affordable and every
    take/reserve action is legal regardless of the deal.  Guard that
    assumption against future rules changes."""
    ring = sx.make_ring(jax.random.PRNGKey(7), 64)
    masks = jax.vmap(sx.legal_mask)(ring.state)
    assert (np.asarray(masks) == np.asarray(ring.mask0)[None, :]).all()


def test_take_assigns_ring_entries_in_order_and_advances_ptr():
    ring = sx.make_ring(jax.random.PRNGKey(1), 8)
    done = jnp.asarray([False, True, False, True, True, False, False, False])
    fresh_state, fresh_mask, ring2 = ring_lib.take(ring, done)
    fresh_obs = jax.vmap(sx.encode_observation)(fresh_state)
    # Done lanes 1, 3, 4 get ring entries 0, 1, 2 respectively.
    for lane, entry in [(1, 0), (3, 1), (4, 2)]:
        assert (np.asarray(fresh_obs[lane]) == np.asarray(ring.obs[entry])).all()
        assert (np.asarray(fresh_mask[lane]) == np.asarray(ring.mask[entry])).all()
    assert int(ring2.ptr) == 3
    # A second take continues from entry 3 and wraps modulo size.
    done2 = jnp.ones(8, bool)
    fresh_state2, _, ring3 = ring_lib.take(ring2, done2)
    fresh_obs2 = jax.vmap(sx.encode_observation)(fresh_state2)
    assert (np.asarray(fresh_obs2[0]) == np.asarray(ring.obs[3])).all()
    assert (np.asarray(fresh_obs2[5]) == np.asarray(ring.obs[0])).all()  # wrap
    assert int(ring3.ptr) == (3 + 8) % 8


def test_take_window_exact_and_overflow_counted():
    """Window fast path: exact while <= window lanes finish per step; beyond
    that, overflow lanes clamp to the window's last entry and are counted."""
    ring = sx.make_ring(jax.random.PRNGKey(1), 4, window=2)
    assert ring.window == 2 and ring.size == 4
    done = jnp.asarray([True, True, True, False])
    fresh_state, _, ring2 = ring_lib.take(ring, done)
    fresh_obs = jax.vmap(sx.encode_observation)(fresh_state)
    # Ranks 0,1 exact; rank 2 overflows the 2-wide window -> clamped to the
    # window's last entry (ring entry 1), and counted.
    assert (np.asarray(fresh_obs[0]) == np.asarray(ring.obs[0])).all()
    assert (np.asarray(fresh_obs[1]) == np.asarray(ring.obs[1])).all()
    assert (np.asarray(fresh_obs[2]) == np.asarray(ring.obs[1])).all()
    assert int(ring2.overflow) == 1
    assert int(ring2.ptr) == 3  # ptr still advances by the TRUE done count
    # Window covering the whole batch can never overflow.
    big = sx.make_ring(jax.random.PRNGKey(2), 8, window=8)
    _, _, big2 = ring_lib.take(big, jnp.ones(8, bool))
    assert int(big2.overflow) == 0


def test_step_autoreset_ring_matches_naive_semantics():
    """Done lane -> fresh ring game carried, terminal data kept in `out`;
    live lanes step identically to the naive path."""
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    states, obs, masks = sx.reset_batch(keys)
    # Make game 0 pre-terminal, as in test_autoreset_replaces_done_games.
    states = states.replace(
        prestige=states.prestige.at[0, 0].set(20),
        game_over=states.game_over.at[0].set(True),
        to_play=states.to_play.at[0].set(1),
    )
    actions = _first_legal_actions(states, B)

    ring = sx.make_ring(jax.random.PRNGKey(3), 8)
    carry_r, out_r, obs_r, mask_r, ring2 = sx.step_autoreset_ring(
        states, actions, ring
    )
    carry_n, out_n, obs_n, mask_n = sx.step_autoreset(
        states, actions, jax.random.PRNGKey(4)
    )

    # The step outputs (terminal data) are identical — resets don't touch out.
    for f in ("obs", "reward", "terminated", "action_mask", "final_rewards"):
        assert (
            np.asarray(getattr(out_r, f)) == np.asarray(getattr(out_n, f))
        ).all(), f

    # Lane 0 terminated and received ring entry 0.
    assert bool(out_r.terminated[0])
    assert (np.asarray(obs_r[0]) == np.asarray(ring.obs[0])).all()
    assert int(carry_r.move_count[0]) == 0
    assert not bool(carry_r.game_over[0])
    assert int(ring2.ptr) == 1

    # Live lanes carried identically to the naive path.
    live = ~np.asarray(out_r.terminated)
    assert (np.asarray(obs_r)[live] == np.asarray(obs_n)[live]).all()
    assert (np.asarray(mask_r)[live] == np.asarray(mask_n)[live]).all()
    assert (
        np.asarray(carry_r.bank)[live] == np.asarray(carry_n.bank)[live]
    ).all()


def test_ring_rollout_long_random_games_stay_valid():
    """64-step scan with ring autoreset: masks stay consistent with states,
    finished lanes restart, and the ring pointer advances by total dones."""
    B, T = 16, 64
    key = jax.random.PRNGKey(5)
    states, obs, masks = sx.reset_batch(jax.random.split(key, B))
    ring = sx.make_ring(jax.random.fold_in(key, 1), 2 * B)

    @jax.jit
    def run(states, masks, ring, key):
        def body(carry, k):
            states, masks, ring = carry
            logits = jnp.where(masks, 0.0, -1e9)
            a = jax.random.categorical(k, logits, axis=-1).astype(jnp.int32)
            states, out, obs_next, masks, ring = sx.step_autoreset_ring(
                states, a, ring, mask=masks
            )
            return (states, masks, ring), out.terminated.sum()

        (states, masks, ring), dones = jax.lax.scan(
            body, (states, masks, ring), jax.random.split(key, T)
        )
        return states, masks, ring, dones.sum()

    states, masks, ring, n_done = run(states, masks, ring, jax.random.fold_in(key, 2))
    # Carried masks always match a rebuild from the carried states.
    mask_re = jax.vmap(sx.legal_mask)(states)
    live = ~np.asarray(states.game_over)
    assert (np.asarray(masks)[live] == np.asarray(mask_re)[live]).all()
    assert int(ring.ptr) == int(n_done) % ring.size
    # No carried game is past the turn limit.
    assert (np.asarray(states.turn_count) <= 100).all()


def test_trainer_ring_and_naive_rollout_both_learn_shapes():
    """update_step runs under both reset paths and produces finite metrics."""
    from splendax.train import ppo
    from splendax.train.config import PPOConfig

    for mult in (0, 2):
        cfg = PPOConfig(
            num_envs=8,
            num_steps=8,
            minibatch_size=32,
            total_timesteps=8 * 8 * 2,
            pool_size=2,
            reset_ring_mult=mult,
        )
        ts = ppo.init_train_state(cfg)
        ts, metrics = ppo.update_step(cfg, ts)
        assert np.isfinite(float(metrics["loss"])), mult
        assert np.isfinite(float(metrics["approx_kl"])), mult
