"""Vectorized env, PPO learner, and multi-device mesh tests (all new
capability vs the reference; SURVEY.md §2 bottom rows)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_supplychain_tpu import compile_chain
from gym_supplychain_tpu.envs.vector import VecSupplyChainEnv, make_vec_env
from .utils import simple_chain


def _cc(T=6, stochastic=False):
    return compile_chain(
        simple_chain(initial_stock=10, stock_capacity=100, supply_capacity=50,
                     processing_capacity=100, ship_capacity=100),
        demand_range=(0, 5), processing_ratio=2, total_time_steps=T,
        stochastic_leadtimes=stochastic, avg_leadtime=2,
        max_leadtime=4 if stochastic else 2)


def test_vec_host_mode_matches_single_env():
    """Batch lane b of host-mode vec env == episode b of the single-env
    stream, under identical action sequences."""
    from gym_supplychain_tpu import SupplyChainEnv
    T, B = 6, 3
    env = SupplyChainEnv(simple_chain(initial_stock=10, stock_capacity=100,
                                      supply_capacity=50, processing_capacity=100,
                                      ship_capacity=100),
                         demand_range=(0, 5), processing_ratio=2,
                         total_time_steps=T)
    env.seed(42)
    actions = 2 * np.linspace(0, 1, T * env.cc.A).reshape(T, env.cc.A) - 1
    single_rewards = np.zeros((B, T))
    for ep in range(B):
        env.reset()
        for t in range(T):
            _, r, _, _ = env.step(actions[t])
            single_rewards[ep, t] = r

    vec = VecSupplyChainEnv(cc=_cc(T), batch_size=B, rng_mode="host", seed=42,
                            dtype=jnp.float64)
    vec.reset()
    vec_rewards = np.zeros((B, T))
    for t in range(T):
        a = jnp.asarray(np.repeat(actions[t][:, None], B, axis=1))
        out = vec.step(a)
        vec_rewards[:, t] = np.asarray(out.reward)
    assert np.allclose(single_rewards, vec_rewards)


def test_vec_autoreset():
    """Device-mode env auto-resets at T: clock wraps, obs stays in range, new
    episode tables differ."""
    T, B = 4, 8
    vec = VecSupplyChainEnv(cc=_cc(T, stochastic=True), batch_size=B)
    vec.reset()
    d0 = np.asarray(vec.state.env.demands)
    rng = np.random.RandomState(0)
    for t in range(2 * T):
        a = jnp.asarray(2 * rng.rand(vec.cc.A, B) - 1, jnp.float32)
        out = vec.step(a)
        assert np.isfinite(np.asarray(out.reward)).all()
        obs = np.asarray(out.obs)
        assert (obs >= -1 - 1e-6).all() and (obs <= 1 + 1e-6).all()
    # steps T and 2T both hit done -> auto-reset; after 2T steps t is 0 again
    assert int(vec.state.env.t) == 0
    d1 = np.asarray(vec.state.env.demands)
    assert not np.array_equal(d0, d1)  # fresh episode tables after auto-reset


def test_vec_scan_rollout_deterministic():
    cc = _cc(5)
    init_fn, step_fn, obs_fn = make_vec_env(cc, 16)

    def total(key):
        st = init_fn(key)

        def body(st, k):
            a = jax.random.uniform(k, (cc.A, 16), minval=-1.0, maxval=1.0)
            st, out = step_fn(st, a)
            return st, out.reward

        _, rews = jax.lax.scan(body, st, jax.random.split(key, 10))
        return rews.sum()

    f = jax.jit(total)
    r1 = float(f(jax.random.PRNGKey(7)))
    r2 = float(f(jax.random.PRNGKey(7)))
    assert r1 == r2
    assert r1 != float(f(jax.random.PRNGKey(8)))


def test_ppo_train_step_learns_shapes():
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_ppo
    cc = _cc(8, stochastic=True)
    cfg = PPOConfig(rollout_steps=4, epochs=2, hidden=(32, 32))
    init_fn, train_step = make_ppo(cc, 16, cfg)
    state = init_fn(jax.random.PRNGKey(0))
    step = jax.jit(train_step)
    p0 = jax.tree.map(np.asarray, state.params)
    for _ in range(3):
        state, metrics = step(state)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["mean_reward"]))
    changed = jax.tree.map(lambda a, b: not np.allclose(a, np.asarray(b)),
                           p0, state.params)
    assert any(jax.tree.leaves(changed))


def test_ppo_improves_bf16_learner():
    """VERDICT r3 item 3: the bf16 learner trunk (update phase only) must
    produce (nearly) the same update direction as the f32 full-batch update
    from an identical rollout, and minibatched epochs must run and move
    params.  The rollout forward is untouched by learner_dtype, so the same
    seed gives bit-identical trajectories to both learners."""
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_ppo

    cc = _cc(8, stochastic=True)
    B = 32
    kw = dict(rollout_steps=8, epochs=2, hidden=(32, 32))
    init32, step32 = make_ppo(cc, B, PPOConfig(**kw))
    _, step16 = make_ppo(cc, B, PPOConfig(**kw, learner_dtype=jnp.bfloat16))
    s0 = init32(jax.random.PRNGKey(0))

    def delta(s1):
        return np.concatenate([
            (np.asarray(a, np.float64) - np.asarray(b, np.float64)).ravel()
            for a, b in zip(jax.tree.leaves(s1.params),
                            jax.tree.leaves(s0.params))])

    d32 = delta(jax.jit(step32)(s0)[0])
    d16 = delta(jax.jit(step16)(s0)[0])
    assert np.linalg.norm(d32) > 0 and np.linalg.norm(d16) > 0
    cos = float(d32 @ d16 / (np.linalg.norm(d32) * np.linalg.norm(d16)))
    assert cos > 0.9, f"bf16 update diverges from f32: cosine {cos:.3f}"

    # minibatched epochs: 4 contiguous chunks per epoch, finite and moving
    _, stepmb = make_ppo(cc, B, PPOConfig(**kw, minibatches=4))
    smb, m = jax.jit(stepmb)(s0)
    assert np.isfinite(float(m["loss"]))
    assert np.linalg.norm(delta(smb)) > 0


def test_ppo_minibatch_one_matches_full_batch():
    """minibatches=1 must reproduce the full-batch trainer exactly (the
    dynamic-slice chunking and hoisted flatten are pure refactors)."""
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_ppo

    cc = _cc(6)
    init_fn, step1 = make_ppo(cc, 16, PPOConfig(rollout_steps=4, epochs=2,
                                                hidden=(16,), minibatches=1))
    s0 = init_fn(jax.random.PRNGKey(2))
    s1, m1 = jax.jit(step1)(s0)
    s2, m2 = jax.jit(step1)(s1)
    assert np.isfinite(float(m2["loss"]))
    # two distinct iterations saw distinct data
    assert float(m1["loss"]) != float(m2["loss"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.isfinite(np.asarray(out[2])).all()   # rewards


def test_sharded_matches_single_device():
    """Same rollout, sharded over the 8-device mesh vs single device ->
    identical total reward (determinism across shardings)."""
    from gym_supplychain_tpu.parallel.mesh import make_mesh, shard_vec_state
    cc = _cc(5, stochastic=True)
    B = 16
    init_fn, step_fn, obs_fn = make_vec_env(cc, B)

    def total(st, key):
        def body(st, k):
            a = jax.random.uniform(k, (cc.A, B), minval=-1.0, maxval=1.0)
            st, out = step_fn(st, a)
            return st, out.reward

        _, rews = jax.lax.scan(body, st, jax.random.split(key, 10))
        return rews.sum()

    key = jax.random.PRNGKey(3)
    st = init_fn(key)
    r_single = float(jax.jit(total)(st, key))
    mesh = make_mesh(data=8, model=1)
    st_sharded = shard_vec_state(mesh, init_fn(key))
    r_sharded = float(jax.jit(total)(st_sharded, key))
    assert np.allclose(r_single, r_sharded)


def test_beergame_ppo_learns():
    """Learning canary: categorical PPO on the beer game must improve the
    mean per-step reward substantially over random ordering (the
    MultiDiscrete head of SURVEY.md §7.5)."""
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_beergame_ppo

    init_fn, train_step = make_beergame_ppo(
        128, PPOConfig(rollout_steps=36, hidden=(64,), lr=5e-3, epochs=4,
                       ent_coef=5e-3))
    state = init_fn(jax.random.PRNGKey(0))
    step = jax.jit(train_step)
    early, late = [], []
    for it in range(50):
        state, m = step(state)
        (early if it < 10 else late).append(float(m["mean_reward"]))
    assert np.mean(late[-10:]) > np.mean(early) + 60.0, (
        f"no learning: early={np.mean(early):.1f} late={np.mean(late[-10:]):.1f}")


def test_supplychain_ppo_beats_base_stock():
    """Learning-quality bar for the supply-chain family (round-1 VERDICT
    item 4, un-gated): PPO trained 220 iterations on sc-2perstage-v0 (T=60)
    must beat the TUNED base-stock heuristic's episodic return by >= 5%
    under greedy evaluation.  The heuristic observes the true device state
    (stock + pipeline) — a stronger oracle than the policy's observation —
    and its multiplier z=2.0 is the grid optimum for this config
    (learn/compare_baseline.py sweeps the grid; docs/TRAINING.md records
    the full comparison)."""
    import gym_supplychain_tpu as sct
    from gym_supplychain_tpu.learn.evaluate import make_evaluator
    from gym_supplychain_tpu.learn.heuristics import (
        default_base_stock_targets, evaluate_state_policy)
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_ppo

    cc = sct.make("sc-2perstage-v0", total_time_steps=60).cc
    heur = evaluate_state_policy(
        cc, 256, default_base_stock_targets(cc, 2.0), jax.random.PRNGKey(0))

    init_fn, train_step = make_ppo(
        cc, 256, PPOConfig(rollout_steps=32, hidden=(64, 64), lr=3e-3,
                           epochs=4))
    state = init_fn(jax.random.PRNGKey(0))
    step = jax.jit(train_step)
    for _ in range(220):
        state, m = step(state)
    evaluate = jax.jit(make_evaluator(cc, 256), static_argnames="episodes")
    trained = float(evaluate(state.params, jax.random.PRNGKey(1), 1)
                    ["mean_return"])
    assert trained > heur + 0.05 * abs(heur), (
        f"trained {trained:.0f} does not beat base-stock {heur:.0f} by 5%")


def test_ntom_ppo_matches_tuned_base_stock():
    """CI-sized north-star assertion (VERDICT r2 item 5): on
    supplychain-ntom-v0 — the benchmark headline env — PPO must beat the
    grid-TUNED base-stock heuristic under greedy evaluation at T=60.

    The margin bar is small by design: this preset's derived cost structure
    (unmet_demand_cost = 2*product_cost while the chain's end-to-end cost
    of serving one unit is ~2*product_cost, envs/presets.py
    SupplyChainNtoMEnv) makes near-idle policies near-optimal, so the
    tuned heuristic already sits close to the optimum; PPO consistently
    edges it by ~0.2-0.3% (full-horizon T=360 comparison, 4096 envs,
    interior-bracketed z grid:
    benchmarks/results/compare_baseline_ntom.json, docs/TRAINING.md)."""
    import gym_supplychain_tpu as sct
    from gym_supplychain_tpu.learn.evaluate import make_evaluator
    from gym_supplychain_tpu.learn.heuristics import best_base_stock
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_ppo

    cc = sct.make("supplychain-ntom-v0", total_time_steps=60).cc
    _z, heur, _scores = best_base_stock(
        cc, 128, jax.random.PRNGKey(0),
        zs=[0.01, 0.03, 0.05, 0.08, 0.1, 0.15], episodes=2)

    init_fn, train_step = make_ppo(
        cc, 256, PPOConfig(rollout_steps=32, hidden=(64, 64), lr=3e-4,
                           epochs=4))
    state = init_fn(jax.random.PRNGKey(0))
    step = jax.jit(train_step)
    for _ in range(500):
        state, m = step(state)
    evaluate = jax.jit(make_evaluator(cc, 256), static_argnames="episodes")
    trained = float(evaluate(state.params, jax.random.PRNGKey(1), 1)
                    ["mean_return"])
    assert trained > heur + 0.002 * abs(heur), (
        f"trained {trained:.0f} does not beat tuned base-stock {heur:.0f}")


def test_seasonal_ppo_beats_base_stock():
    """Learning where learning must matter (VERDICT r3 item 4): on the
    seasonal 2perstage preset (4-peak sinusoidal demand, reference
    supplychain_2perstage_env.py:67-97) a TIME-BLIND base-stock target
    cannot track the 4x demand swing, so the margin bar is wide — ≥8%
    over the grid-tuned heuristic (measured +18.5%/+32.7% at 700/1000
    iterations; the full-horizon T=360 committed run beats it by 12.6%,
    benchmarks/results/compare_baseline_seasonal.json)."""
    import gym_supplychain_tpu as sct
    from gym_supplychain_tpu.learn.evaluate import make_evaluator
    from gym_supplychain_tpu.learn.heuristics import best_base_stock
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_ppo

    cc = sct.make("sc-2perstage-seasonal-v0", total_time_steps=60).cc
    _z, heur, scores = best_base_stock(
        cc, 128, jax.random.PRNGKey(0), zs=[1.0, 1.5, 2.0, 2.5, 3.0],
        episodes=2)
    # the grid optimum must be interior (bracketed on both sides)
    zs = sorted(scores)
    assert _z not in (zs[0], zs[-1]), scores

    init_fn, train_step = make_ppo(
        cc, 256, PPOConfig(rollout_steps=32, hidden=(64, 64), lr=3e-3,
                           epochs=4))
    state = init_fn(jax.random.PRNGKey(0))
    step = jax.jit(train_step)
    for _ in range(800):
        state, m = step(state)
    evaluate = jax.jit(make_evaluator(cc, 256), static_argnames="episodes")
    trained = float(evaluate(state.params, jax.random.PRNGKey(1), 1)
                    ["mean_return"])
    assert trained > heur + 0.08 * abs(heur), (
        f"trained {trained:.0f} does not beat seasonal base-stock "
        f"{heur:.0f} by 8%")


def test_beergame_ppo_beats_order_up_to():
    """Learning-vs-baseline bar for the beer game family (VERDICT r4
    missing-3): on the stochastic v2 variant (demand (0,12), delays (0,4) —
    reference beergame2_env.py:41-58, where demand/delay uncertainty gives
    a policy something a static target cannot track) PPO trained 1500
    iterations must beat the grid-TUNED order-up-to heuristic — which
    observes the true oracle state incl. in-transit pipeline — by >= 2%
    under greedy evaluation.  The full committed comparison (2000 iters,
    margin ~17% at 1500 in the probe runs) lives in
    benchmarks/results/compare_baseline_beergame.json / docs/TRAINING.md."""
    from gym_supplychain_tpu.learn.evaluate import make_beergame_evaluator
    from gym_supplychain_tpu.learn.heuristics import best_beergame_base_stock
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_beergame_ppo

    kw = dict(levels=4, weeks=35, max_order=16, customer_demand=(0, 12),
              shipment_delays=(0, 4), v2=True, max_stock=100,
              exceeded_capacity_penalty=100)
    B = 256
    best_s, (heur, _), scores = best_beergame_base_stock(
        B, jax.random.PRNGKey(0), targets=list(range(12, 41, 4)),
        episodes=8, **kw)
    # the grid optimum must be interior (bracketed on both sides)
    ss = sorted(scores)
    assert best_s not in (ss[0], ss[-1]), scores

    init_fn, train_step = make_beergame_ppo(
        B, PPOConfig(rollout_steps=35, hidden=(64, 64), lr=1e-3, epochs=4,
                     ent_coef=5e-3, rollout_unroll=1),
        max_order=16, customer_demand=(0, 12), shipment_delays=(0, 4),
        v2=True, max_stock=100, exceeded_capacity_penalty=100, weeks=35)
    state = init_fn(jax.random.PRNGKey(0))
    step = jax.jit(train_step)
    for _ in range(1500):
        state, _ = step(state)
    evaluate = jax.jit(make_beergame_evaluator(B, **kw),
                       static_argnames="episodes")
    trained = float(evaluate(state.params, jax.random.PRNGKey(1), 8)
                    ["mean_return"])
    assert trained > heur + 0.02 * abs(heur), (
        f"trained {trained:.0f} does not beat tuned order-up-to "
        f"{heur:.0f} by 2%")


def test_base_stock_heuristic_sanity():
    """The scripted baseline itself must be sane: distinct-retailer
    reachability (parallel paths must not multiply), and a clearly better
    return than the random policy on sc-2perstage-v0."""
    import gym_supplychain_tpu as sct
    from gym_supplychain_tpu.learn.heuristics import (
        _reachable_retailers, default_base_stock_targets,
        evaluate_state_policy)

    cc = sct.make("sc-2perstage-v0", total_time_steps=60).cc
    # 2 suppliers -> 2 factories -> 2 wholesalers -> 2 retailers, full
    # bipartite: every non-retailer reaches exactly the 2 retailers
    assert list(_reachable_retailers(cc)) == [2, 2, 2, 2, 2, 2, 1, 1]

    B, key = 128, jax.random.PRNGKey(3)
    heur = evaluate_state_policy(cc, B, default_base_stock_targets(cc, 2.0),
                                 key)

    init_fn, step_fn, _ = make_vec_env(cc, B)

    def random_return(key):
        st = init_fn(key)

        def body(st, k):
            a = jax.random.uniform(k, (cc.A, B), minval=-1.0, maxval=1.0)
            st, out = step_fn(st, a)
            return st, out.reward

        _, r = jax.lax.scan(body, st, jax.random.split(key, cc.T))
        return r.sum(0).mean()

    rand = float(jax.jit(random_return)(key))
    assert heur > rand * 0.8, (heur, rand)   # rewards negative: heur better


def test_vec_host_autoreset_continues_stream():
    """At the lockstep episode boundary, host-mode lanes must play the NEXT
    B episodes of the continuing MT19937 stream (SURVEY.md §2.1-9), not
    device-drawn tables."""
    from gym_supplychain_tpu import SupplyChainEnv
    T, B, EPS = 4, 2, 2
    env = SupplyChainEnv(simple_chain(initial_stock=10, stock_capacity=100,
                                      supply_capacity=50, processing_capacity=100,
                                      ship_capacity=100),
                         demand_range=(0, 5), processing_ratio=2,
                         total_time_steps=T)
    env.seed(7)
    actions = 2 * np.linspace(0, 1, T * env.cc.A).reshape(T, env.cc.A) - 1
    single = np.zeros((EPS * B, T))
    for ep in range(EPS * B):
        env.reset()
        for t in range(T):
            _, r, _, _ = env.step(actions[t])
            single[ep, t] = r

    vec = VecSupplyChainEnv(cc=_cc(T), batch_size=B, rng_mode="host", seed=7,
                            dtype=jnp.float64)
    vec.reset()
    got = np.zeros((EPS, B, T))
    for block in range(EPS):
        for t in range(T):
            a = jnp.asarray(np.repeat(actions[t][:, None], B, axis=1))
            out = vec.step(a)     # auto-resets at t == T-1 with host tables
            got[block, :, t] = np.asarray(out.reward)
    assert np.allclose(got.reshape(EPS * B, T), single)


def test_vec_device_reset_advances_stream():
    """Consecutive reset() calls in device mode must play fresh episodes."""
    vec = VecSupplyChainEnv(cc=_cc(6), batch_size=4, rng_mode="device", seed=0)
    vec.reset()
    d1 = np.asarray(vec.state.env.demands)
    vec.reset()
    d2 = np.asarray(vec.state.env.demands)
    assert not np.array_equal(d1, d2)


def test_beergame_train_state_shardings():
    """train_state_shardings must handle the beer game trainer, whose env
    state is a bare BeerGameState (no VecState wrapper)."""
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_beergame_ppo
    from gym_supplychain_tpu.parallel.mesh import (make_mesh,
                                                   train_state_shardings)
    mesh = make_mesh(data=8)
    cfg = PPOConfig(rollout_steps=2, epochs=1, hidden=(16, 16))
    init_fn, train_step = make_beergame_ppo(16, cfg, weeks=8)
    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(init_fn, key)
    sh = train_state_shardings(mesh, shapes)
    state = jax.jit(init_fn, out_shardings=sh)(key)
    state, metrics = jax.jit(train_step)(state)
    jax.block_until_ready(metrics)
    assert np.isfinite(float(metrics["loss"]))
