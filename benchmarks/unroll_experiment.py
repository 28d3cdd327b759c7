"""Experiment: does `lax.scan(unroll=k)` cut the per-step slope at B=4096?

At 4096 envs the step kernel's arrays are small (e.g. stock [8,1,4096] f32 =
128 KiB), so the scan body is op-count/overhead bound, not HBM bound.
Unrolling the scan body lets XLA fuse across consecutive env steps and
amortize loop bookkeeping.  This is a legitimate rollout-side knob (PPO
collection can unroll its trajectory scan identically).

Run:  python benchmarks/unroll_experiment.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from bench import _measure_slope


def make_supplychain_run(cc, B, unroll):
    from gym_supplychain_tpu.envs.vector import make_vec_env
    init_fn, step_fn, obs_fn = make_vec_env(cc, B)

    def make_run(steps):
        def rollout(seed):
            key = jax.random.key(seed, impl="rbg")
            st = init_fn(key)

            def body(st, k):
                a = jax.random.uniform(k, (cc.A, B), minval=-1.0, maxval=1.0)
                st, out = step_fn(st, a)
                return st, out.reward.sum() + out.obs.sum()

            ks = jax.random.split(key, steps)
            st, rews = jax.lax.scan(body, st, ks, unroll=unroll)
            return rews.sum()

        return jax.jit(rollout)

    return make_run


def make_beergame_run(B, unroll, weeks=35):
    import jax.numpy as jnp
    from gym_supplychain_tpu.core.beergame import make_beergame_kernels
    L = 4
    reset_fn, step_fn, obs_fn = make_beergame_kernels(L, weeks, 2,
                                                      itype=jnp.int32)
    demand = np.array([4] * 4 + [8] * (weeks - 4), np.int32)
    delays = np.full(weeks + 1, 2, np.int32)

    def make_run(steps):
        def rollout(seed):
            key = jax.random.key(seed, impl="rbg")
            st = reset_fn(demand, delays, [12] * L, 4, 4, B)

            def body(st, k):
                a = jax.random.randint(k, (L, B), 0, 16)
                st, (obs, reward, done) = step_fn(st, a)
                st = jax.lax.cond(
                    done, lambda _: reset_fn(demand, delays, [12] * L, 4, 4, B),
                    lambda _: st, None)
                return st, reward.sum() + obs.sum()

            ks = jax.random.split(key, steps)
            st, rews = jax.lax.scan(body, st, ks, unroll=unroll)
            return rews.sum()

        return jax.jit(rollout)

    return make_run


def main():
    """Usage: python benchmarks/unroll_experiment.py <config> <unroll> [...]

    One (config, unroll) measurement per pair of argv entries, so runs stay
    short under the slow tunneled compiles.  Configs: linear | ntom | beergame.
    """
    B = 4096
    from gym_supplychain_tpu.envs.presets import (SupplyChainLinearEnv,
                                                  SupplyChainNtoMEnv)
    usage = ("usage: unroll_experiment.py [<config> <unroll>]...  "
             "config in {linear, ntom, beergame}")
    if len(sys.argv[1:]) % 2 != 0:
        raise SystemExit(usage + f" (got odd argument count: {sys.argv[1:]})")
    pairs = list(zip(sys.argv[1::2], [int(x) for x in sys.argv[2::2]])) or [
        ("linear", 1), ("linear", 4)]
    for name, _ in pairs:
        if name not in ("linear", "ntom", "beergame"):
            raise SystemExit(usage + f" (unknown config {name!r})")
    out = {}
    for name, unroll in pairs:
        if name == "linear":
            mr = make_supplychain_run(
                SupplyChainLinearEnv(total_time_steps=360).cc, B, unroll)
            base = 4 * 360
        elif name == "ntom":
            mr = make_supplychain_run(
                SupplyChainNtoMEnv(total_time_steps=360).cc, B, unroll)
            base = 4 * 360
        else:
            mr = make_beergame_run(B, unroll)
            base = 40 * 35
        r = _measure_slope(mr, base)
        out[f"{name} unroll={unroll}"] = {
            "per_step_us": r["per_step_us"],
            "linearity": r["linearity_check"],
        }
        print(name, "unroll", unroll, "->", r["per_step_us"], "us/step",
              "lin", r["linearity_check"], flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
