"""Benchmark: env-steps/s/chip for the batched TPU engine (BASELINE.json).

Runs 4096-env rollouts of the beergame + supplychain configs under one jitted
``lax.scan`` each (random policy, on-device PRNG, auto-reset) and prints ONE
JSON line.  ``vs_baseline`` is the geometric-mean speedup over the reference
NumPy envs' measured single-process throughput (benchmarks/ref_baseline.py;
the reference has no batching and publishes no numbers, BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def bench_supplychain(cc, B, steps, repeats=7, episodes=16):
    """Continuous rollout: ``episodes`` back-to-back auto-reset episodes per
    jitted call, amortizing the fixed per-dispatch latency exactly as a real
    training loop does (PPO collects many steps per dispatch)."""
    import jax
    import jax.numpy as jnp
    from gym_supplychain_tpu.envs.vector import make_vec_env

    init_fn, step_fn, obs_fn = make_vec_env(cc, B)
    steps = steps * episodes

    def rollout(key):
        st = init_fn(key)

        def body(carry, k):
            st = carry
            a = jax.random.uniform(k, (cc.A, B), minval=-1.0, maxval=1.0)
            st, out = step_fn(st, a)
            # consume the observation so XLA cannot dead-code the obs path
            # (a real rollout feeds obs to a policy every step)
            return st, out.reward.sum() + out.obs.sum()

        ks = jax.random.split(key, steps)
        st, rews = jax.lax.scan(body, st, ks)
        return rews.sum()

    run = jax.jit(rollout)
    run(jax.random.PRNGKey(0)).block_until_ready()          # compile + warm
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(r + 1)).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return B * steps / best


def bench_beergame(B, weeks=35, repeats=7, episodes=160):
    """Continuous rollout with auto-reset: ``episodes`` back-to-back
    35-week episodes per jitted call (episodes are short, so the fixed
    dispatch latency would otherwise dominate entirely)."""
    import jax
    import jax.numpy as jnp
    from gym_supplychain_tpu.core.beergame import make_beergame_kernels

    L = 4
    reset_fn, step_fn, obs_fn = make_beergame_kernels(
        L, weeks, 2, itype=jnp.int32)
    demand = np.array([4] * 4 + [8] * (weeks - 4), np.int32)
    delays = np.full(weeks + 1, 2, np.int32)
    steps = weeks * episodes

    def rollout(key):
        st = reset_fn(demand, delays, [12] * L, 4, 4, B)

        def body(carry, k):
            st = carry
            a = jax.random.randint(k, (L, B), 0, 16)
            st, (obs, reward, done) = step_fn(st, a)
            st = jax.lax.cond(
                done, lambda _: reset_fn(demand, delays, [12] * L, 4, 4, B),
                lambda _: st, None)
            return st, reward.sum() + obs.sum()

        ks = jax.random.split(key, steps)
        st, rews = jax.lax.scan(body, st, ks)
        return rews.sum()

    run = jax.jit(rollout)
    run(jax.random.PRNGKey(0)).block_until_ready()
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(r + 1)).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return B * steps / best


def main():
    B = int(os.environ.get("GST_BENCH_ENVS", "4096"))
    import jax
    from gym_supplychain_tpu.envs.presets import (SupplyChainLinearEnv,
                                                  SupplyChainNtoMEnv)
    from benchmarks.ref_baseline import get_baseline

    platform = jax.devices()[0].platform
    results = {}
    linear_cc = SupplyChainLinearEnv(total_time_steps=360).cc
    results["supplychain-linear-v0"] = bench_supplychain(linear_cc, B, 360)
    ntom_cc = SupplyChainNtoMEnv(total_time_steps=360).cc
    results["supplychain-ntom-v0"] = bench_supplychain(ntom_cc, B, 360)
    results["beergame-v0"] = bench_beergame(B)

    baseline = get_baseline()
    speedups = [results[k] / baseline[k] for k in results if k in baseline
                and baseline[k] > 0]
    vs = float(np.exp(np.mean(np.log(speedups)))) if speedups else 0.0
    value = float(np.exp(np.mean(np.log([results[k] for k in results]))))

    print(json.dumps({
        "metric": f"env-steps/s/chip ({B} parallel envs, geomean of "
                  "beergame-v0 + supplychain-linear-v0 + supplychain-ntom-v0)",
        "value": round(value, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(vs, 2),
        "details": {"platform": platform,
                    "per_config_steps_per_s": {k: round(v, 1) for k, v in results.items()},
                    "reference_single_env_steps_per_s": baseline},
    }))


if __name__ == "__main__":
    main()
