"""Fused-collection PPO (learn/ppo.py::make_ppo_fused, VERDICT r2 item 1).

The fused learner collects whole episodes through the trajectory-emitting
Pallas kernel and runs the same GAE + clipped-PPO epochs as make_ppo.
Interpret mode on CPU with the table-driven 'policy_eps' collection path
(the in-kernel PRNG 'policy' path needs the hardware PRNG; its TPU parity
and timing live in benchmarks/pallas_parity.py).  Rollout-body parity vs
the scan engine is pinned separately in tests/test_pallas_collect.py.
"""
import jax
import jax.numpy as jnp
import numpy as np


def _make(env_id, T, B, hidden, episodes=1, **make_kw):
    import gym_supplychain_tpu as sct
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_ppo_fused

    cc = sct.make(env_id, total_time_steps=T, **make_kw).cc
    cfg = PPOConfig(hidden=hidden, epochs=2, lr=1e-3)
    return make_ppo_fused(cc, B, cfg, episodes=episodes, noise="table",
                          interpret=True)


def test_fused_train_step_runs_and_updates():
    init_fn, train_step = _make("supplychain-linear-v0", 8, 4, (16, 16))
    state = init_fn(jax.random.PRNGKey(0))
    step = jax.jit(train_step)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    losses = []
    for _ in range(3):
        state, metrics = step(state)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(metrics["mean_reward"]))
    p1 = state.params
    # the optimizer actually moved the params
    moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1)))
    assert moved
    # distinct iterations saw distinct trajectories (keys advanced)
    assert len({round(x, 10) for x in losses}) > 1


def test_fused_train_step_stochastic_multi_episode():
    """ntom (stochastic lead-times) with 2 back-to-back episodes per
    iteration: exercises the tiled per-episode tables + the done mask at
    both episode boundaries."""
    init_fn, train_step = _make("supplychain-ntom-v0", 6, 4, (8,),
                                episodes=2)
    state = init_fn(jax.random.PRNGKey(1))
    state, metrics = jax.jit(train_step)(state)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["mean_value"]))


def test_fused_train_step_sharded_matches_unsharded():
    """make_ppo_fused(mesh=...) runs one collect-kernel instance per 'data'
    shard via shard_map; with table noise the per-lane inputs are drawn
    globally, so the sharded train step must reproduce the unsharded one
    (same seed) to reduction-order tolerance (VERDICT r3 item 1)."""
    import gym_supplychain_tpu as sct
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_ppo_fused
    from gym_supplychain_tpu.parallel.mesh import make_mesh

    cc = sct.make("supplychain-ntom-v0", total_time_steps=6).cc
    assert cc.stochastic_leadtimes
    cfg = PPOConfig(hidden=(16, 16), epochs=2)
    B = 32
    mesh = make_mesh(data=4, model=2)
    init_u, step_u = make_ppo_fused(cc, B, cfg, noise="table",
                                    interpret=True)
    init_s, step_s = make_ppo_fused(cc, B, cfg, noise="table",
                                    interpret=True, mesh=mesh)
    m_u = jax.jit(step_u)(init_u(jax.random.PRNGKey(3)))[1]
    st_s, m_s = jax.jit(step_s)(init_s(jax.random.PRNGKey(3)))
    lu, ls = float(m_u["loss"]), float(m_s["loss"])
    assert abs(ls - lu) <= 1e-5 * max(1.0, abs(lu)), (ls, lu)
    assert abs(float(m_s["mean_reward"]) - float(m_u["mean_reward"])) \
        <= 1e-4 * max(1.0, abs(float(m_u["mean_reward"])))
    # state round-trips through a second sharded step
    _, m2 = jax.jit(step_s)(st_s)
    assert np.isfinite(float(m2["loss"]))


def test_fused_update_sharded_matches_unsharded():
    """fused_update under a mesh: the gradient kernel runs per 'data' shard
    with pmean'd grads — the sharded train step must reproduce the
    unsharded fused_update step (table noise, same seed)."""
    import gym_supplychain_tpu as sct
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_ppo_fused
    from gym_supplychain_tpu.parallel.mesh import make_mesh

    cc = sct.make("supplychain-ntom-v0", total_time_steps=6).cc
    cfg = PPOConfig(hidden=(16, 16), epochs=2, fused_update=True,
                    fused_update_interpret=True)
    B = 32
    mesh = make_mesh(data=4, model=2)
    init_u, step_u = make_ppo_fused(cc, B, cfg, noise="table",
                                    interpret=True)
    init_s, step_s = make_ppo_fused(cc, B, cfg, noise="table",
                                    interpret=True, mesh=mesh)
    m_u = jax.jit(step_u)(init_u(jax.random.PRNGKey(5)))[1]
    st_s, m_s = jax.jit(step_s)(init_s(jax.random.PRNGKey(5)))
    lu, ls = float(m_u["loss"]), float(m_s["loss"])
    assert abs(ls - lu) <= 1e-4 * max(1.0, abs(lu)), (ls, lu)
    _, m2 = jax.jit(step_s)(st_s)
    assert np.isfinite(float(m2["loss"]))


def test_fused_sharded_prng_mode_runs():
    """prng-mode sharding folds the data-axis index into the kernel seed;
    on CPU the in-kernel PRNG path can't run, but trace-level validity of
    the shard_map plumbing is still checkable via eval_shape."""
    import gym_supplychain_tpu as sct
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_ppo_fused
    from gym_supplychain_tpu.parallel.mesh import make_mesh

    cc = sct.make("supplychain-linear-v0", total_time_steps=4).cc
    mesh = make_mesh(data=8, model=1)
    init_fn, step_fn = make_ppo_fused(cc, 64, PPOConfig(hidden=(8,)),
                                      noise="prng", mesh=mesh)
    state = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    out = jax.eval_shape(step_fn, state)
    assert out[1]["loss"].shape == ()


def test_fused_rejects_indivisible_batch():
    import gym_supplychain_tpu as sct
    from gym_supplychain_tpu.learn.ppo import make_ppo_fused
    from gym_supplychain_tpu.parallel.mesh import make_mesh

    cc = sct.make("supplychain-linear-v0", total_time_steps=4).cc
    mesh = make_mesh(data=8, model=1)
    try:
        make_ppo_fused(cc, 12, mesh=mesh)
    except ValueError:
        return
    raise AssertionError("expected ValueError for indivisible batch")


def test_fused_rejects_bad_noise():
    import gym_supplychain_tpu as sct
    from gym_supplychain_tpu.learn.ppo import make_ppo_fused

    cc = sct.make("supplychain-linear-v0", total_time_steps=4).cc
    try:
        make_ppo_fused(cc, 4, noise="nope")
    except ValueError:
        return
    raise AssertionError("expected ValueError for bad noise mode")
