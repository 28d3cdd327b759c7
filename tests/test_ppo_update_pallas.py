"""Fused PPO-update kernel (ops/ppo_update_pallas.py): gradient parity vs
jax.value_and_grad of the XLA loss (learn/ppo.py::_make_cont_loss), in
interpret mode on CPU at f32.  The kernel hand-derives the backward pass of
the full clipped-surrogate + value + entropy + pre-tanh-reg loss, so any
slip in the math shows up here as a gradient mismatch."""
import numpy as np

import jax
import jax.numpy as jnp


def _setup(O, A, hidden, M, seed=0):
    from gym_supplychain_tpu.models.policy import (MLPConfig,
                                                   actor_critic_forward,
                                                   init_actor_critic,
                                                   tanh_gaussian_logp)

    key = jax.random.PRNGKey(seed)
    kp, ko, ke, ka, kr = jax.random.split(key, 5)
    params = init_actor_critic(kp, MLPConfig(O, A, tuple(hidden)),
                               jnp.float32)
    obs = jax.random.uniform(ko, (O, M), jnp.float32, -1.0, 1.0)
    # realistic pre-tanh actions + consistent old_logp from a NEARBY
    # parameter vector so the ratio clip has both live branches
    mu, log_std, _ = actor_critic_forward(params, obs)
    pre = mu + jnp.exp(log_std) * jax.random.normal(ke, mu.shape)
    old_logp = tanh_gaussian_logp(pre, mu, log_std) \
        + 0.1 * jax.random.normal(ka, (M,))
    adv = jax.random.normal(kr, (M,))
    adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    ret = jax.random.normal(jax.random.fold_in(kr, 1), (M,))
    return params, obs, pre, old_logp, adv, ret


def _xla_ref(cfg, params, data):
    from gym_supplychain_tpu.learn.ppo import _make_cont_loss
    loss = _make_cont_loss(cfg)

    def scalar_loss(p):
        l, _aux = loss(p, *data)
        return l

    return jax.value_and_grad(scalar_loss)(params)


def test_fused_update_grads_match_autodiff():
    from gym_supplychain_tpu.learn.ppo import PPOConfig
    from gym_supplychain_tpu.ops.ppo_update_pallas import (
        make_ppo_update_grads)

    O, A, hidden, M = 9, 5, (16, 16), 128
    cfg = PPOConfig(hidden=hidden, clip=0.2, vf_coef=0.5, ent_coef=1e-3,
                    pre_tanh_reg=1e-3)
    params, *data = _setup(O, A, hidden, M)
    ref_loss, ref_grads = _xla_ref(cfg, params, tuple(data))

    gf = make_ppo_update_grads(O, A, hidden, M, clip=cfg.clip,
                               vf_coef=cfg.vf_coef, ent_coef=cfg.ent_coef,
                               pre_tanh_reg=cfg.pre_tanh_reg, tile=32,
                               interpret=True)
    loss, grads = jax.jit(gf)(params, *data)
    assert abs(float(loss) - float(ref_loss)) <= 1e-5 * max(
        1.0, abs(float(ref_loss))), (float(loss), float(ref_loss))
    flat_r = jax.tree.leaves(ref_grads)
    flat_k = jax.tree.leaves(grads)
    assert len(flat_r) == len(flat_k)
    for r, k in zip(flat_r, flat_k):
        r, k = np.asarray(r, np.float64), np.asarray(k, np.float64)
        assert r.shape == k.shape
        np.testing.assert_allclose(k, r, rtol=2e-5,
                                   atol=2e-6 * max(1.0, np.abs(r).max()))


def test_fused_update_grads_single_hidden_layer():
    from gym_supplychain_tpu.learn.ppo import PPOConfig
    from gym_supplychain_tpu.ops.ppo_update_pallas import (
        make_ppo_update_grads)

    O, A, hidden, M = 6, 3, (8,), 64
    cfg = PPOConfig(hidden=hidden)
    params, *data = _setup(O, A, hidden, M, seed=3)
    ref_loss, ref_grads = _xla_ref(cfg, params, tuple(data))
    gf = make_ppo_update_grads(O, A, hidden, M, tile=64, interpret=True)
    loss, grads = jax.jit(gf)(params, *data)
    assert abs(float(loss) - float(ref_loss)) <= 1e-5 * max(
        1.0, abs(float(ref_loss)))
    for r, k in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(k), np.asarray(r), rtol=2e-5,
                                   atol=2e-6)


def test_fused_update_inside_ppo_trainer():
    """PPOConfig(fused_update=True): make_ppo's train_step runs the kernel
    (interpret mode) and moves params in the same direction as the
    autodiff trainer from an identical rollout."""
    from gym_supplychain_tpu import compile_chain
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_ppo
    from .utils import simple_chain

    cc = compile_chain(
        simple_chain(initial_stock=10, stock_capacity=100,
                     supply_capacity=50, processing_capacity=100,
                     ship_capacity=100),
        demand_range=(0, 5), processing_ratio=2, total_time_steps=8)
    B = 16
    kw = dict(rollout_steps=8, epochs=2, hidden=(16, 16))
    init_ref, step_ref = make_ppo(cc, B, PPOConfig(**kw))
    _, step_fused = make_ppo(cc, B, PPOConfig(
        **kw, fused_update=True, fused_update_interpret=True))
    s0 = init_ref(jax.random.PRNGKey(0))
    s_ref, m_ref = jax.jit(step_ref)(s0)
    s_fus, m_fus = jax.jit(step_fused)(s0)
    assert abs(float(m_fus["loss"]) - float(m_ref["loss"])) <= 1e-4 * max(
        1.0, abs(float(m_ref["loss"])))

    def delta(s1):
        return np.concatenate([
            (np.asarray(a, np.float64) - np.asarray(b, np.float64)).ravel()
            for a, b in zip(jax.tree.leaves(s1.params),
                            jax.tree.leaves(s0.params))])

    dr, df = delta(s_ref), delta(s_fus)
    cos = float(dr @ df / (np.linalg.norm(dr) * np.linalg.norm(df) + 1e-30))
    assert cos > 0.9999, cos
