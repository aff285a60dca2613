"""SplendaxVectorEnv: gymnasium vector API over the batched JAX engine.

Covers the vector analogue of the single-env contract (reference
`splendor_env.py` + SyncVectorEnv composition, `ppo_splendor.py:151-159`):
spaces, info dict, NEXT_STEP and SAME_STEP autoreset conventions,
determinism, and mask/obs invariants over long random rollouts.
"""

import numpy as np
import pytest

from gymnasium.vector import AutoresetMode

from splendax.env.vector import SplendaxVectorEnv

# Observation tail offsets (frozen 297-dim layout, SURVEY.md §2.1).
OFF_TURN, OFF_TOPLAY, OFF_MOVES, OFF_ROUND_OVER = 293, 294, 295, 296

N = 8


def sample_legal(rng, mask_rows):
    """Uniform legal action per row; 0 where no legal action exists."""
    acts = np.zeros(len(mask_rows), dtype=np.int32)
    for i, row in enumerate(mask_rows):
        legal = np.flatnonzero(row)
        if len(legal):
            acts[i] = rng.choice(legal)
    return acts


def test_spaces_and_reset():
    envs = SplendaxVectorEnv(num_envs=N)
    assert envs.single_action_space.n == 45
    assert envs.single_observation_space.shape == (297,)
    assert envs.action_space.shape == (N,)
    assert envs.observation_space.shape == (N, 297)

    obs, infos = envs.reset(seed=0)
    assert obs.shape == (N, 297) and obs.dtype == np.int32
    assert infos["action_mask"].shape == (N, 45)
    assert infos["action_mask"].dtype == np.int8
    assert infos["action_mask"].any(axis=1).all()
    assert infos["_action_mask"].all()
    assert (infos["to_play"] == 0).all()
    # Fresh games: move_count 0, turn 1.
    assert (obs[:, OFF_MOVES] == 0).all()
    assert (obs[:, OFF_TURN] == 1).all()
    # Different lanes get different deals.
    assert not (obs[0] == obs[1]).all()


def test_step_requires_reset():
    envs = SplendaxVectorEnv(num_envs=2)
    with pytest.raises(RuntimeError):
        envs.step(np.zeros(2, dtype=np.int32))


def test_out_of_range_action_raises():
    envs = SplendaxVectorEnv(num_envs=2)
    envs.reset(seed=0)
    with pytest.raises(ValueError):
        envs.step(np.array([45, 0]))
    with pytest.raises(ValueError):
        envs.step(np.array([0, -1]))


def test_observations_stay_in_declared_space():
    envs = SplendaxVectorEnv(num_envs=4)
    obs, infos = envs.reset(seed=5)
    rng = np.random.RandomState(2)
    for _ in range(150):
        assert envs.observation_space.contains(obs)
        acts = sample_legal(rng, infos["action_mask"])
        obs, _, _, _, infos = envs.step(acts)


def test_next_step_autoreset_rollout():
    envs = SplendaxVectorEnv(num_envs=N, autoreset_mode=AutoresetMode.NEXT_STEP)
    obs, infos = envs.reset(seed=1)
    rng = np.random.RandomState(0)
    mask = infos["action_mask"]
    pending = np.zeros(N, dtype=bool)
    episodes = 0
    for _ in range(300):
        acts = sample_legal(rng, mask)
        obs, reward, term, trunc, infos = envs.step(acts)
        assert not trunc.any()
        # We always play legal actions, so non-pending lanes never flag illegal.
        if "illegal_action" in infos:
            assert not infos["illegal_action"][~pending].any()
        # Lanes that terminated last step were reset this step: fresh obs,
        # zero reward, not terminal (gymnasium NEXT_STEP convention).
        if pending.any():
            assert (reward[pending] == 0).all()
            assert not term[pending].any()
            assert (obs[pending, OFF_MOVES] == 0).all()
        # Terminated lanes expose zero masks and their final rewards.
        if term.any():
            episodes += int(term.sum())
            assert not infos["action_mask"][term].any()
            fr = infos["final_rewards"][term]
            assert np.isin(fr, [-1.0, -0.1, 0.0, 1.0]).all()
            # Win/loss rewards sum to 0 per game; draws to 0 or -0.2.
            assert np.isin(fr.sum(axis=1), [0.0, -0.2]).all()
        pending = term.copy()
        mask = infos["action_mask"]
    assert episodes > 0, "random play should finish games within 300 plies"


def test_same_step_autoreset_final_obs():
    envs = SplendaxVectorEnv(num_envs=N, autoreset_mode=AutoresetMode.SAME_STEP)
    obs, infos = envs.reset(seed=2)
    rng = np.random.RandomState(1)
    saw_terminal = False
    for _ in range(300):
        acts = sample_legal(rng, infos["action_mask"])
        obs, reward, term, trunc, infos = envs.step(acts)
        if term.any():
            saw_terminal = True
            # The returned obs rows are already reset; terminal obs ride in
            # infos["final_obs"] (SyncVectorEnv SAME_STEP convention).
            assert (obs[term, OFF_MOVES] == 0).all()
            assert infos["_final_obs"][term].all()
            for i in np.nonzero(term)[0]:
                fo = infos["final_obs"][i]
                assert fo is not None and fo.shape == (297,)
                assert fo[OFF_MOVES] > 0 or fo[OFF_ROUND_OVER] == 1
            # Reset lanes are immediately playable.
            assert infos["action_mask"][term].any(axis=1).all()
        # A live lane with a zero mask is a stalemate: the NEXT step call on
        # it must declare a draw (reference splendor_env.py:56-61).
        stalemated = ~term & ~infos["action_mask"].any(axis=1)
        if stalemated.any():
            obs, reward, term2, _, infos2 = envs.step(
                sample_legal(rng, infos["action_mask"])
            )
            assert term2[stalemated].all()
            assert infos2["draw"][stalemated].all()
            assert (reward[stalemated] == 0).all()
            infos = infos2
    assert saw_terminal


def test_determinism_same_seed():
    a = SplendaxVectorEnv(num_envs=4)
    b = SplendaxVectorEnv(num_envs=4)
    obs_a, inf_a = a.reset(seed=7)
    obs_b, inf_b = b.reset(seed=7)
    assert (obs_a == obs_b).all()
    rng = np.random.RandomState(3)
    for _ in range(40):
        acts = sample_legal(rng, inf_a["action_mask"])
        obs_a, r_a, t_a, _, inf_a = a.step(acts)
        obs_b, r_b, t_b, _, inf_b = b.step(acts)
        assert (obs_a == obs_b).all()
        assert (r_a == r_b).all() and (t_a == t_b).all()
        assert (inf_a["action_mask"] == inf_b["action_mask"]).all()


def test_per_env_seed_list():
    envs = SplendaxVectorEnv(num_envs=3)
    obs1, _ = envs.reset(seed=[5, 5, 9])
    # Same per-env seed => same deal; different => different.
    assert (obs1[0] == obs1[1]).all()
    assert not (obs1[0] == obs1[2]).all()
    with pytest.raises(ValueError):
        envs.reset(seed=[1, 2])


def test_illegal_action_penalty_vectorized():
    envs = SplendaxVectorEnv(num_envs=2)
    obs, infos = envs.reset(seed=11)
    # Pick an illegal action for lane 0, a legal one for lane 1.
    illegal0 = int(np.flatnonzero(infos["action_mask"][0] == 0)[0])
    legal1 = int(np.flatnonzero(infos["action_mask"][1])[0])
    obs2, reward, term, _, infos2 = envs.step(np.array([illegal0, legal1]))
    assert reward[0] == pytest.approx(-0.01)
    assert infos2["illegal_action"][0] and not infos2["_illegal_action"][1]
    # Illegal action is a no-op: same position, same mover.
    assert (obs2[0] == obs[0]).all()
    assert obs2[1, OFF_MOVES] == 1


def test_sync_vector_env_composition_still_works():
    """MIGRATION.md's claim: the reference's own vectorization idiom —
    gym.vector.SyncVectorEnv over our SplendorEnv — keeps working."""
    import gymnasium as gym

    from splendax.env.gym_compat import SplendorEnv

    envs = gym.vector.SyncVectorEnv(
        [lambda: SplendorEnv(rng_mode="fast", backend="jax") for _ in range(3)]
    )
    obs, infos = envs.reset(seed=11)
    assert obs.shape == (3, 297)
    assert infos["action_mask"].shape == (3, 45)
    rng = np.random.RandomState(0)
    for _ in range(20):
        acts = sample_legal(rng, infos["action_mask"])
        obs, r, term, trunc, infos = envs.step(acts)
        assert obs.shape == (3, 297)
    envs.close()


def test_native_backend_bit_identical_to_syncvectorenv():
    """SplendaxVectorEnv(backend="native") must reproduce the reference's
    own vectorization idiom — gym.vector.SyncVectorEnv over native-shim
    SplendorEnvs — bit-for-bit: same seeding (lane i <- seed + i), same
    engine streams, same NEXT_STEP autoreset reseeding, same rewards and
    info flags.  Runs long enough for several games to terminate."""
    import gymnasium as gym
    import pytest

    from splendax import native
    from splendax.env.gym_compat import SplendorEnv
    from splendax.env.vector import SplendaxVectorEnv

    if not native.is_available():
        pytest.skip("native toolchain unavailable")

    N, SEED, STEPS = 4, 123, 400
    ref = gym.vector.SyncVectorEnv(
        [lambda: SplendorEnv(rng_mode="parity", backend="native")
         for _ in range(N)]
    )
    ours = SplendaxVectorEnv(N, backend="native")

    obs_r, inf_r = ref.reset(seed=SEED)
    obs_o, inf_o = ours.reset(seed=SEED)
    np.testing.assert_array_equal(obs_o, obs_r)
    np.testing.assert_array_equal(inf_o["action_mask"], inf_r["action_mask"])

    rng = np.random.RandomState(5)
    n_term = 0
    for t in range(STEPS):
        acts = sample_legal(rng, inf_r["action_mask"])
        obs_r, r_r, term_r, trunc_r, inf_r = ref.step(acts)
        obs_o, r_o, term_o, trunc_o, inf_o = ours.step(acts)
        np.testing.assert_array_equal(obs_o, obs_r, err_msg=f"t={t}")
        np.testing.assert_array_equal(term_o, term_r, err_msg=f"t={t}")
        np.testing.assert_allclose(r_o, r_r, err_msg=f"t={t}")
        np.testing.assert_array_equal(
            inf_o["action_mask"], inf_r["action_mask"], err_msg=f"t={t}"
        )
        n_term += int(term_o.sum())
    assert n_term >= 4, "rollout too short to exercise autoreset"
    ref.close()


def test_native_backend_same_step_final_obs():
    """SAME_STEP mode on the native backend: terminal obs ride in
    infos['final_obs']; carried lanes are fresh games."""
    import pytest
    from gymnasium.vector import AutoresetMode

    from splendax import native
    from splendax.env.vector import SplendaxVectorEnv

    if not native.is_available():
        pytest.skip("native toolchain unavailable")

    envs = SplendaxVectorEnv(4, backend="native",
                             autoreset_mode=AutoresetMode.SAME_STEP)
    obs, infos = envs.reset(seed=3)
    rng = np.random.RandomState(1)
    OFF_MOVES = 295
    saw_final = False
    for _ in range(400):
        acts = sample_legal(rng, infos["action_mask"])
        obs, r, term, trunc, infos = envs.step(acts)
        if term.any():
            saw_final = True
            for i in np.nonzero(term)[0]:
                assert infos["final_obs"][i] is not None
                assert obs[i, OFF_MOVES] == 0  # carried lane is a fresh game
                assert infos["final_obs"][i][OFF_MOVES] > 0
    assert saw_final


def test_native_unseeded_rereset_continues_streams():
    """reset() with no seed must continue the per-lane PCG64 streams (as a
    gymnasium sub-env's np_random persists across unseeded resets), staying
    bit-identical to the SyncVectorEnv composition."""
    import gymnasium as gym
    import pytest

    from splendax import native
    from splendax.env.gym_compat import SplendorEnv
    from splendax.env.vector import SplendaxVectorEnv

    if not native.is_available():
        pytest.skip("native toolchain unavailable")

    N = 3
    ref = gym.vector.SyncVectorEnv(
        [lambda: SplendorEnv(rng_mode="parity", backend="native")
         for _ in range(N)]
    )
    ours = SplendaxVectorEnv(N, backend="native")
    ref.reset(seed=9)
    ours.reset(seed=9)
    obs_r, _ = ref.reset()   # unseeded: np_random streams continue
    obs_o, _ = ours.reset()
    np.testing.assert_array_equal(obs_o, obs_r)
    ref.close()


def test_unsupported_autoreset_mode_rejected():
    from gymnasium.vector import AutoresetMode

    from splendax.env.vector import SplendaxVectorEnv

    with np.testing.assert_raises(ValueError):
        SplendaxVectorEnv(2, autoreset_mode=AutoresetMode.DISABLED)
