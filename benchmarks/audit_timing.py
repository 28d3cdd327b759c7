"""Timing audit for the single-chip benchmark (round-2 VERDICT item 1).

Measures wall time of the exact bench.py rollout at several scan lengths and
dispatch counts to establish:
  (a) linearity: doubling the scan length should ~double wall time;
  (b) per-step device time, free of dispatch-latency artifacts;
  (c) median/std spread vs the old best-of-N ``min`` protocol.

Prints one JSON object per config with the raw table.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time_fn(run, key_base, repeats):
    # fetch the scalar result: under the tunneled 'axon' PJRT runtime
    # block_until_ready returns before the device finishes (wall time stays
    # ~0.07 ms whether the scan runs 1,440 or 11,520 steps — measured), so
    # only a value fetch gives a real synchronization point
    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        float(run(key_base + r))
        times.append(time.perf_counter() - t0)
    return times


def audit_supplychain(cc, B, steps_per_episode, episode_counts, repeats=11):
    import jax
    from gym_supplychain_tpu.envs.vector import make_vec_env

    init_fn, step_fn, obs_fn = make_vec_env(cc, B)

    rows = []
    for episodes in episode_counts:
        steps = steps_per_episode * episodes

        def rollout(seed):
            key = jax.random.PRNGKey(seed)
            st = init_fn(key)

            def body(carry, k):
                st = carry
                a = jax.random.uniform(k, (cc.A, B), minval=-1.0, maxval=1.0)
                st, out = step_fn(st, a)
                return st, out.reward.sum() + out.obs.sum()

            ks = jax.random.split(key, steps)
            st, rews = jax.lax.scan(body, st, ks)
            return rews.sum()

        run = jax.jit(rollout)
        float(run(0))  # compile + warm + first (slow) fetch
        times = _time_fn(run, 100 * episodes, repeats)
        rows.append({
            "scan_steps": steps,
            "median_ms": round(float(np.median(times)) * 1e3, 4),
            "min_ms": round(float(np.min(times)) * 1e3, 4),
            "max_ms": round(float(np.max(times)) * 1e3, 4),
            "std_ms": round(float(np.std(times)) * 1e3, 4),
            "per_step_us_median": round(
                float(np.median(times)) / steps * 1e6, 5),
            "steps_per_s_median": round(B * steps / float(np.median(times)), 1),
        })
    return rows


def main():
    import jax
    from gym_supplychain_tpu.envs.presets import (SupplyChainLinearEnv,
                                                  SupplyChainNtoMEnv)

    B = int(os.environ.get("GST_BENCH_ENVS", "4096"))
    platform = jax.devices()[0].platform
    out = {"platform": platform, "B": B}

    linear_cc = SupplyChainLinearEnv(total_time_steps=360).cc
    out["supplychain-linear-v0"] = audit_supplychain(
        linear_cc, B, 360, [1, 2, 4, 8, 16, 32])
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
