"""Compiled-TPU Pallas parity + timing artifact (round-1 VERDICT item 5).

Runs the whole-episode Pallas kernels (ops/supplychain_pallas.py,
ops/beergame_pallas.py) COMPILED on the current device, asserts their parity
against the lax.scan step engine on identical on-device inputs, and times
both with the honest post-fetch slope protocol (see bench.py docstring):
per-episode time = slope of wall time over increasing episodes-per-dispatch
counts (spread wide enough to clear the ~1 ms fetch noise).

Invoked by ``GST_PALLAS=1 python bench.py`` (results land in the bench JSON)
or standalone: ``python benchmarks/pallas_parity.py``.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

def _timed_fetch(fn, seed):
    t0 = time.perf_counter()
    float(fn(seed))
    return time.perf_counter() - t0


def _per_episode_ms(make_run, repeats, ep_counts):
    """Marginal per-episode wall time (ms) via the episode-count slope.

    ``ep_counts`` must spread the dispatch enough that the slope clears the
    ~1 ms run-to-run noise of the tunneled fetch (a 0.05 ms episode needs
    ~100 episodes of spread)."""
    med = {}
    for eps in ep_counts:
        run = make_run(eps)
        _timed_fetch(run, 0)                                 # compile + warm
        med[eps] = float(np.median([_timed_fetch(run, r + 1)
                                    for r in range(repeats)]))
    e1, e3 = ep_counts[0], ep_counts[-1]
    return (med[e3] - med[e1]) / (e3 - e1) * 1e3


def _bench_supplychain(name, B, repeats):
    import jax
    import jax.numpy as jnp

    import gym_supplychain_tpu as sct
    from gym_supplychain_tpu.core.step import make_supplychain_kernels
    from gym_supplychain_tpu.ops.supplychain_pallas import (
        make_supplychain_episode_pallas)
    from gym_supplychain_tpu.rng.device import (device_demand_tables,
                                                device_leadtime_tables)

    T = 360
    cc = sct.make(name, total_time_steps=T).cc
    _, run_actions = make_supplychain_episode_pallas(cc, T, B)
    reset_fn, step_fn, _ = make_supplychain_kernels(cc)

    def _episode_inputs(key):
        """Per-episode tables + action table, generated ON DEVICE (multi-MB
        jit arguments are re-shipped per call under the tunneled runtime)."""
        kd, kl, ka = jax.random.split(key, 3)
        demands = device_demand_tables(kd, cc, B)
        leadtimes = (device_leadtime_tables(kl, cc, B)
                     if cc.stochastic_leadtimes else None)
        actions = jax.random.uniform(ka, (T, cc.A, B), jnp.float32, -1.0, 1.0)
        return demands, leadtimes, actions

    def _pallas_ep(demands, leadtimes, actions):
        if cc.stochastic_leadtimes:
            return run_actions(demands, leadtimes, actions)
        return run_actions(demands, actions)

    def _scan_ep(demands, leadtimes, actions):
        st = reset_fn(demands, leadtimes, B)

        def body(st, a):
            st, out = step_fn(st, a)
            return st, out.reward

        _, rews = jax.lax.scan(body, st, actions)
        return rews

    def make_run(engine, eps):
        ep = _pallas_ep if engine == "pallas" else _scan_ep

        def fn(seed):
            def body(acc, k):
                return acc + ep(*_episode_inputs(k)).sum(), None

            ks = jax.random.split(jax.random.PRNGKey(seed), eps)
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), ks)
            return acc

        return jax.jit(fn)

    @jax.jit
    def parity(seed):
        demands, leadtimes, actions = _episode_inputs(
            jax.random.PRNGKey(seed))
        pal = _pallas_ep(demands, leadtimes, actions)
        ref = _scan_ep(demands, leadtimes, actions)
        return (jnp.abs(pal - ref).max(), jnp.abs(ref).max())

    pal_ms = _per_episode_ms(lambda e: make_run("pallas", e), repeats,
                             ep_counts=(2, 8, 32))
    scan_ms = _per_episode_ms(lambda e: make_run("scan", e), repeats,
                              ep_counts=(2, 8, 32))
    # value fetch last (first fetch in a process degrades later dispatches)
    err, scale = (float(x) for x in jax.device_get(parity(0)))
    rel = err / scale if scale else 0.0
    return {
        "pallas_episode_ms": round(pal_ms, 4),
        "scan_episode_ms": round(scan_ms, 4),
        "pallas_steps_per_s": round(T * B / (pal_ms * 1e-3), 1),
        "max_rel_err_vs_scan": float(f"{rel:.2e}"),
        "parity_ok": bool(rel < 1e-5),
    }


def _bench_beergame(B, repeats):
    import jax
    import jax.numpy as jnp

    from gym_supplychain_tpu.core.beergame import make_beergame_kernels
    from gym_supplychain_tpu.ops.beergame_pallas import beergame_episode_pallas

    W, L = 35, 4
    demand = np.array([4] * 4 + [8] * (W - 4), np.int32)
    delays = np.full(W + 1, 2, np.int32)
    reset_fn, step_fn, _ = make_beergame_kernels(L, W, 2, itype=jnp.int32)

    def _actions(key):
        return jax.random.randint(key, (W, L, B), 0, 16, jnp.int32)

    def _pallas_ep(acts):
        dem2 = jnp.broadcast_to(jnp.asarray(demand)[:, None], (W, B))
        inv0 = jnp.full((L, B), 12, jnp.int32)
        return beergame_episode_pallas(dem2, acts, inv0)

    def _scan_ep(acts):
        st = reset_fn(demand, delays, [12] * L, 4, 4, B)

        def body(st, a):
            st, (_, r, _) = step_fn(st, a)
            return st, r

        _, rews = jax.lax.scan(body, st, acts)
        return rews

    def make_run(engine, eps):
        ep = _pallas_ep if engine == "pallas" else _scan_ep

        def fn(seed):
            def body(acc, k):
                return acc + ep(_actions(k)).sum().astype(jnp.float32), None

            ks = jax.random.split(jax.random.PRNGKey(seed), eps)
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), ks)
            return acc

        return jax.jit(fn)

    @jax.jit
    def parity(seed):
        acts = _actions(jax.random.PRNGKey(seed))
        return jnp.array_equal(_pallas_ep(acts), _scan_ep(acts))

    pal_ms = _per_episode_ms(lambda e: make_run("pallas", e), repeats,
                             ep_counts=(8, 64, 256))
    scan_ms = _per_episode_ms(lambda e: make_run("scan", e), repeats,
                              ep_counts=(8, 64, 256))
    equal = bool(jax.device_get(parity(0)))
    return {
        "pallas_episode_ms": round(pal_ms, 4),
        "scan_episode_ms": round(scan_ms, 4),
        "pallas_steps_per_s": round(W * B / (pal_ms * 1e-3), 1),
        "bit_equal_vs_scan": equal,
        "parity_ok": equal,
    }


def _bench_policy_rollout(name, B, repeats, hidden=(128, 128)):
    """Fused policy-in-the-loop kernel (obs -> MLP actor on MXU -> tanh(mu)
    -> env step, whole episode in one pallas_call) vs the scan-engine greedy
    evaluator with the same HIGHEST-precision matmuls."""
    import jax
    import jax.numpy as jnp

    import gym_supplychain_tpu as sct
    from gym_supplychain_tpu.core.step import make_supplychain_kernels
    from gym_supplychain_tpu.models.policy import (MLPConfig,
                                                   init_actor_critic)
    from gym_supplychain_tpu.ops.supplychain_pallas import (
        make_supplychain_policy_rollout_pallas)
    from gym_supplychain_tpu.rng.device import (device_demand_tables,
                                                device_leadtime_tables)

    T = 360
    cc = sct.make(name, total_time_steps=T).cc
    params = init_actor_critic(jax.random.PRNGKey(1),
                               MLPConfig(cc.obs_dim, cc.A, hidden))
    params["mu"]["w"] = params["mu"]["w"] * 100     # non-degenerate actions
    run_policy = make_supplychain_policy_rollout_pallas(cc, T, B,
                                                        hidden=hidden)
    reset_fn, step_fn, obs_fn = make_supplychain_kernels(cc)

    def forward_mu(obs):
        x = obs
        for layer in params["actor"]:
            x = jnp.tanh(jnp.einsum("on,nb->ob", layer["w"], x,
                                    precision=jax.lax.Precision.HIGHEST)
                         + layer["b"])
        return (jnp.einsum("on,nb->ob", params["mu"]["w"], x,
                           precision=jax.lax.Precision.HIGHEST)
                + params["mu"]["b"])

    def _inputs(key):
        kd, kl = jax.random.split(key)
        demands = device_demand_tables(kd, cc, B)
        lt = (device_leadtime_tables(kl, cc, B)
              if cc.stochastic_leadtimes else None)
        return demands, lt

    def _pallas_ep(demands, lt):
        if cc.stochastic_leadtimes:
            return run_policy(demands, lt, params)
        return run_policy(demands, params)

    def _scan_ep(demands, lt):
        st = reset_fn(demands, lt, B)

        def body(carry, _):
            st, obs = carry
            st, out = step_fn(st, jnp.tanh(forward_mu(obs)))
            return (st, out.obs), out.reward

        (_, _), rews = jax.lax.scan(body, (st, obs_fn(st)), None, length=T)
        return rews

    def make_run(engine, eps):
        ep = _pallas_ep if engine == "pallas" else _scan_ep

        def fn(seed):
            def body(acc, k):
                return acc + ep(*_inputs(k)).sum(), None

            ks = jax.random.split(jax.random.PRNGKey(seed), eps)
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), ks)
            return acc

        return jax.jit(fn)

    @jax.jit
    def parity(seed):
        demands, lt = _inputs(jax.random.PRNGKey(seed))
        pal = _pallas_ep(demands, lt)
        ref = _scan_ep(demands, lt)
        return (jnp.abs(pal - ref).max(), jnp.abs(ref).max())

    pal_ms = _per_episode_ms(lambda e: make_run("pallas", e), repeats,
                             ep_counts=(2, 8, 32))
    scan_ms = _per_episode_ms(lambda e: make_run("scan", e), repeats,
                              ep_counts=(2, 8, 32))
    err, scale = (float(x) for x in jax.device_get(parity(0)))
    rel = err / scale if scale else 0.0
    return {
        "hidden": list(hidden),
        "pallas_episode_ms": round(pal_ms, 4),
        "scan_episode_ms": round(scan_ms, 4),
        "pallas_steps_per_s": round(T * B / (pal_ms * 1e-3), 1),
        "max_rel_err_vs_scan": float(f"{rel:.2e}"),
        "parity_ok": bool(rel < 1e-5),
    }


def _bench_collect(name, B, repeats, hidden=(128, 128)):
    """Trajectory-emitting fused collect kernel (VERDICT r2 item 1).

    Compiled parity: the table-driven 'actions' mode must reproduce the scan
    engine's per-step (obs, reward) trajectory on-device (interpret-mode
    parity incl. the 'policy_eps' PPO tuple lives in
    tests/test_pallas_collect.py; here the TPU-compiled kernel is checked).
    Timing: the PRNG modes under the honest slope protocol — per-episode ms
    = slope of wall time over episodes-per-dispatch, every step's obs (and
    in policy mode act/logp/value) written to HBM, in-kernel auto-reset at
    episode boundaries.  'random' is the headline collection workload;
    'policy' is the PPO collection workload (sampled tanh-Gaussian MLP)."""
    import jax
    import jax.numpy as jnp

    import gym_supplychain_tpu as sct
    from gym_supplychain_tpu.core.step import make_supplychain_kernels
    from gym_supplychain_tpu.models.policy import (MLPConfig,
                                                   init_actor_critic)
    from gym_supplychain_tpu.ops.supplychain_pallas import (
        make_supplychain_collect_pallas)

    T = 360
    cc = sct.make(name, total_time_steps=T).cc

    # ---- compiled parity: 'actions' mode vs the scan engine --------------
    Bp = 256
    run_par = make_supplychain_collect_pallas(cc, T, Bp, mode="actions")
    reset_fn, step_fn, obs_fn = make_supplychain_kernels(cc)

    @jax.jit
    def parity(seed):
        kd, kl, ka = jax.random.split(jax.random.PRNGKey(seed), 3)
        demands = jax.random.randint(
            kd, (T + 1, cc.R, cc.P, Bp), 0, 25).astype(jnp.float32)
        lt = (jax.random.randint(kl, (T, cc.K, Bp), 1, cc.Lmax + 1,
                                 jnp.int32)
              if cc.stochastic_leadtimes else None)
        actions = jax.random.uniform(ka, (T, cc.A, Bp), jnp.float32,
                                     -1.0, 1.0)
        pal_obs, pal_rew = (run_par(demands, lt, actions)
                            if cc.stochastic_leadtimes
                            else run_par(demands, actions))
        st = reset_fn(demands, lt, Bp)

        def body(carry, a):
            st, obs = carry
            st, out = step_fn(st, a)
            return (st, out.obs), (obs, out.reward)

        (_, _), (ref_obs, ref_rew) = jax.lax.scan(
            body, (st, obs_fn(st)), actions)
        obs_err = jnp.abs(pal_obs - ref_obs).max()
        rew_err = jnp.abs(pal_rew - ref_rew).max()
        return obs_err, rew_err, jnp.abs(ref_rew).max()

    # ---- timing: PRNG modes, slope over episodes-per-dispatch ------------
    def make_run(mode, eps):
        kw = {"hidden": hidden} if mode == "policy" else {}
        run = make_supplychain_collect_pallas(cc, T, B, mode=mode,
                                              episodes=eps, **kw)
        if mode == "policy":
            params = init_actor_critic(jax.random.PRNGKey(1),
                                       MLPConfig(cc.obs_dim, cc.A, hidden))

            @jax.jit
            def fn(seed):
                outs = run(params, seed)
                return sum(o.sum() for o in outs)
        else:
            @jax.jit
            def fn(seed):
                obs, rew = run(seed)
                return obs.sum() + rew.sum()
        return fn

    out = {}
    for mode in ("random", "policy"):
        ms = _per_episode_ms(lambda e, m=mode: make_run(m, e), repeats,
                             ep_counts=(1, 4, 16))
        out[mode] = {
            "per_episode_ms": round(ms, 4),
            "per_step_us": round(ms / T * 1e3, 4),
            "steps_per_s": round(T * B / (ms * 1e-3), 1),
        }
    out["policy"]["hidden"] = list(hidden)
    obs_err, rew_err, scale = (float(x) for x in jax.device_get(parity(0)))
    rel = rew_err / scale if scale else 0.0
    out["parity"] = {
        "mode": "actions",
        "max_abs_obs_err_vs_scan": float(f"{obs_err:.2e}"),
        "max_rel_reward_err_vs_scan": float(f"{rel:.2e}"),
        "parity_ok": bool(obs_err < 1e-5 and rel < 1e-5),
    }
    return out


def run_pallas_bench(B, repeats=5):
    import jax
    out = {"platform": jax.devices()[0].platform, "B": B,
           "protocol": "per-episode ms = slope over episodes-per-dispatch, "
                       f"median of {repeats} post-fetch timings"}
    out["beergame-v0"] = _bench_beergame(B, repeats)
    out["supplychain-linear-v0"] = _bench_supplychain(
        "supplychain-linear-v0", B, repeats)
    out["supplychain-ntom-v0"] = _bench_supplychain(
        "supplychain-ntom-v0", B, repeats)
    out["policy-rollout supplychain-linear-v0"] = _bench_policy_rollout(
        "supplychain-linear-v0", B, repeats)
    out["collect supplychain-linear-v0"] = _bench_collect(
        "supplychain-linear-v0", B, repeats)
    out["collect supplychain-ntom-v0"] = _bench_collect(
        "supplychain-ntom-v0", B, repeats)
    return out


if __name__ == "__main__":
    B = int(os.environ.get("GST_BENCH_ENVS", "4096"))
    print(json.dumps(run_pallas_bench(B), indent=1))
