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
def test_env_lockstep_parity_with_illegal_injection():
    """The gym adapter stepped side-by-side against the actual reference
    `SplendorEnv` (same gym seeds + actions): obs, reward, terminated and the
    FULL info dict must match every ply.  5% of plies deliberately play a
    masked-off action, exercising the -0.01 illegal branch
    (splendor_env.py:64-66) on both envs."""
    sys.path.insert(0, REFERENCE_PATH)
    from splendax.utils.parity import play_env_parity_game

    rng = np.random.RandomState(11)
    for seed in (3, 77):
        plies = play_env_parity_game(seed, rng, illegal_prob=0.05)
        assert plies > 10


def _no_buy_picker(rng, mask):
    """Prefer takes, then reserves — never buy, so prestige stays 0 and the
    game runs into the 100-round turn limit."""
    legal = np.flatnonzero(mask)
    takes = legal[legal < 15]
    reserves = legal[(legal >= 27) & (legal < 42)]
    for group in (takes, reserves, legal):
        if group.size:
            return int(rng.choice(group))
    return 0


@requires_reference
def test_env_lockstep_parity_turn_limit_draw():
    """A never-buying policy drives BOTH envs to the 100-round turn limit
    (reference rules.py:274-279): parity must hold through the whole game
    including the terminal -0.1 draw reward, `turn_limit` info key, and
    final_rewards of -0.1 for both players (splendor_env.py:71-80)."""
    sys.path.insert(0, REFERENCE_PATH)
    from splendor_gym.envs.splendor_env import SplendorEnv as RefEnv

    from splendax.utils.parity import play_env_parity_game

    rng = np.random.RandomState(5)
    # Run the reference alone first to confirm the scenario really ends by
    # turn limit (guards the test against silently testing a normal game).
    ref = RefEnv()
    obs, info = ref.reset(seed=9)
    for _ in range(450):
        a = _no_buy_picker(rng, np.asarray(info["action_mask"]))
        obs, r, term, trunc, info = ref.step(a)
        if term:
            break
    assert term and info.get("turn_limit"), "scenario must hit the turn limit"
    assert r == pytest.approx(-0.1)
    assert info["final_rewards"] == {0: -0.1, 1: -0.1}

    rng = np.random.RandomState(5)  # same stream -> same actions in lockstep
    plies = play_env_parity_game(9, rng, action_picker=_no_buy_picker)
    assert plies >= 190  # ~100 full rounds (the limit trips at turn_count>100)


@requires_reference
@pytest.mark.parametrize("tokens10", [True, False])
def test_env_lockstep_parity_stalemate_draw(tokens10):
    """Zero-legal-mask stalemate, cross-checked env-vs-env: identical state
    surgery on both (empty bank, 3 reserved, cleared board — the reference's
    own fixture pattern, tests/test_draw_rule.py) must yield a zero mask and
    the same draw step: reward 0, terminated, info exactly
    {action_mask: zeros, to_play: 0, draw: True} with NO final_rewards
    (splendor_env.py:56-61), and step-after-terminal raising on both."""
    sys.path.insert(0, REFERENCE_PATH)
    import jax.numpy as jnp
    from splendor_gym.engine import legal_moves as ref_legal_moves
    from splendor_gym.envs.splendor_env import SplendorEnv as RefEnv

    import splendax as sx
    from splendax.env.gym_compat import SplendorEnv as SxEnv
    from splendax.utils.parity import assert_step_equal

    seed = 123
    ref = RefEnv()
    ref.reset(seed=seed)
    mine = SxEnv(backend="jax")
    mine.reset(seed=seed)

    # Identical surgery.  tokens10=True mirrors the reference fixture's
    # 10-white hand (cap reached); it stalls only if none of the 3 reserved
    # cards is white-only-cost — verified via the ref mask below.  False uses
    # an empty hand, which stalls unconditionally.
    tok = [10, 0, 0, 0, 0, 0] if tokens10 else [0] * 6
    ref.state.bank[:] = [0] * 6
    p = ref.state.players[ref.state.to_play]
    p.tokens[:] = tok
    p.reserved = ref.state.decks[1][:3]
    p.revealed_reserved = [True] * 3
    for t in (1, 2, 3):
        ref.state.board[t] = [None, None, None, None]

    st = mine.state
    reserved = st.deck_perm[0, :3]
    mine.state = st.replace(
        bank=jnp.zeros(6, jnp.int32),
        tokens=st.tokens.at[int(st.to_play)].set(jnp.asarray(tok, jnp.int32)),
        reserved_ids=st.reserved_ids.at[int(st.to_play)].set(reserved),
        reserved_revealed=st.reserved_revealed.at[int(st.to_play)].set(1),
        reserved_count=st.reserved_count.at[int(st.to_play)].set(3),
        board=jnp.full((3, 4), -1, jnp.int32),
    )

    ref_mask = np.array(ref_legal_moves(ref.state), dtype=np.int8)
    my_mask = np.asarray(sx.legal_mask(mine.state), dtype=np.int8)
    np.testing.assert_array_equal(ref_mask, my_mask)
    if tokens10 and ref_mask.any():
        pytest.skip("reserved cards affordable with 10 white — not a stalemate")
    assert not ref_mask.any()

    assert_step_equal(ref.step(0), mine.step(0), "stalemate draw step")
    with pytest.raises(RuntimeError):
        ref.step(0)
    with pytest.raises(RuntimeError):
        mine.step(0)


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
