"""Cross-framework PPO update-math parity.

Loads the REFERENCE's own torch `ActorCritic` + `masked_categorical`
(`/root/reference/ppo_splendor.py:27-59`) and its exact minibatch loss
formulas (`:336-351`), runs them against `splendax.train.ppo.ppo_loss` on
identical parameters and an identical synthetic batch, and asserts the loss,
every component (pg/value/entropy/approx-KL), and ALL parameter gradients
agree to f32 tolerance.  This pins the trainer's clip/vclip/entropy-quirk/KL
semantics to the reference at the numerical level, not just structurally.
"""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_PATH, requires_reference

torch = pytest.importorskip("torch")

N, OBS, ACT = 256, 297, 45


def _make_batch(rng):
    obs = rng.randint(0, 51, size=(N, OBS)).astype(np.float32)
    mask = (rng.rand(N, ACT) < 0.4).astype(np.int8)
    mask[0] = 0  # one no-legal row exercises the unmasked-passthrough branch
    mask[1:, 0] |= ~mask[1:].any(axis=1)  # every other row has >=1 legal
    action = np.zeros(N, np.int64)
    for i in range(N):
        legal = np.flatnonzero(mask[i])
        action[i] = rng.choice(legal) if len(legal) else rng.randint(ACT)
    logp_old = rng.uniform(-4.0, -0.5, N).astype(np.float32)
    value_old = rng.randn(N).astype(np.float32)
    adv = rng.randn(N).astype(np.float32)
    ret = rng.randn(N).astype(np.float32)
    return obs, mask, action, logp_old, value_old, adv, ret


def _torch_loss_and_grads(agent, masked_categorical, batch, cfg, ent_coef):
    obs, mask, action, logp_old, value_old, adv, ret = batch
    t = lambda x, dt=torch.float32: torch.tensor(x, dtype=dt)
    # ppo_splendor.py:336-351, verbatim semantics (incl. the entropy-sign
    # quirk: loss += ent_coef * (-entropy_loss) with entropy_loss=-entropy).
    _, new_logprob, entropy, new_value = agent.get_action_and_value(
        t(obs), t(mask), t(action, torch.int64)
    )
    ratio = (new_logprob - t(logp_old)).exp()
    mb_adv = t(adv)
    clip_adv = torch.clamp(ratio, 1 - cfg.clip_coef, 1 + cfg.clip_coef) * mb_adv
    policy_loss = -torch.min(ratio * mb_adv, clip_adv).mean()
    v_pred = new_value.squeeze(-1)
    v_pred_clipped = t(value_old) + torch.clamp(
        v_pred - t(value_old), -cfg.vclip, cfg.vclip
    )
    v_loss_unclipped = (v_pred - t(ret)).pow(2)
    v_loss_clipped = (v_pred_clipped - t(ret)).pow(2)
    value_loss = 0.5 * torch.max(v_loss_unclipped, v_loss_clipped).mean()
    entropy_loss = -entropy.mean()
    loss = policy_loss + cfg.vf_coef * value_loss + ent_coef * (-entropy_loss)
    agent.zero_grad()
    loss.backward()
    approx_kl = (t(logp_old) - new_logprob).mean()
    scalars = dict(
        loss=float(loss.detach()),
        pg_loss=float(policy_loss),
        v_loss=float(value_loss),
        entropy=float(entropy.mean()),
        approx_kl=float(approx_kl),
    )
    grads = {k: p.grad.detach().numpy().copy() for k, p in agent.named_parameters()}
    return scalars, grads


@requires_reference
def test_ppo_loss_matches_reference_torch():
    sys.path.insert(0, REFERENCE_PATH)
    try:
        from ppo_splendor import ActorCritic, masked_categorical
    finally:
        sys.path.remove(REFERENCE_PATH)

    import jax
    import jax.numpy as jnp

    from splendax.models.actor_critic import from_torch_state_dict
    from splendax.train.config import PPOConfig
    from splendax.train.ppo import ppo_loss

    torch.manual_seed(0)
    agent = ActorCritic(OBS, ACT)
    params = from_torch_state_dict(agent.state_dict())

    rng = np.random.RandomState(7)
    batch = _make_batch(rng)
    cfg = PPOConfig(reference_entropy_quirk=True)
    ent_coef = 0.03

    ref, ref_grads = _torch_loss_and_grads(
        agent, masked_categorical, batch, cfg, ent_coef
    )

    obs, mask, action, logp_old, value_old, adv, ret = batch

    def loss_fn(p):
        return ppo_loss(
            cfg, ent_coef, p,
            jnp.asarray(obs), jnp.asarray(mask, bool), jnp.asarray(action, jnp.int32),
            jnp.asarray(logp_old), jnp.asarray(value_old), jnp.asarray(adv),
            jnp.asarray(ret),
        )

    (loss, (pg, vl, ent, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params
    )
    ours = dict(
        loss=float(loss), pg_loss=float(pg), v_loss=float(vl),
        entropy=float(ent), approx_kl=float(kl),
    )
    # Tolerances: both sides are f32 and the torch/XLA-CPU GEMMs reassociate
    # differently depending on thread-pool state (observed as a rare
    # order-dependent flake at abs=2e-5/1e-6 in full-suite runs) — any
    # semantic mismatch (wrong clip/sign/quirk) is O(1), orders above these.
    for k, v in ref.items():
        assert ours[k] == pytest.approx(v, rel=5e-4, abs=1e-4), (k, ours[k], v)

    # Every parameter gradient, torch layout [out,in] vs ours [in,out].
    for net in ("actor", "critic"):
        for i in range(3):
            gw = np.asarray(grads[net][i]["w"]).T
            gb = np.asarray(grads[net][i]["b"])
            rw = ref_grads[f"{net}.{i*2}.weight"]
            rb = ref_grads[f"{net}.{i*2}.bias"]
            np.testing.assert_allclose(gw, rw, rtol=5e-3, atol=2e-5,
                                       err_msg=f"{net}[{i}].w")
            np.testing.assert_allclose(gb, rb, rtol=5e-3, atol=2e-5,
                                       err_msg=f"{net}[{i}].b")


@requires_reference
def test_ppo_loss_standard_entropy_sign_differs():
    """Without the quirk flag the entropy term flips sign (standard PPO)."""
    import jax.numpy as jnp

    from splendax.models.actor_critic import init_params
    from splendax.train.config import PPOConfig
    from splendax.train.ppo import ppo_loss
    import jax

    params = init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    obs, mask, action, logp_old, value_old, adv, ret = _make_batch(rng)
    args = (
        jnp.asarray(obs), jnp.asarray(mask, bool), jnp.asarray(action, jnp.int32),
        jnp.asarray(logp_old), jnp.asarray(value_old), jnp.asarray(adv),
        jnp.asarray(ret),
    )
    ent_coef = 0.03
    lq, (pq, vq, eq, _) = ppo_loss(
        PPOConfig(reference_entropy_quirk=True), ent_coef, params, *args
    )
    ls, (ps, vs, es, _) = ppo_loss(PPOConfig(), ent_coef, params, *args)
    assert float(eq) == float(es) and float(pq) == float(ps)
    assert float(lq) - float(ls) == pytest.approx(2 * ent_coef * float(eq), rel=1e-4)
