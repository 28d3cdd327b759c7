"""Honest PPO training throughput on one chip (replaces the round-1 claim
of ~0.2 ms/iteration, which was async-dispatch mismeasurement: at 4096 envs
x 16 rollout steps x 2 epochs it implied above-f32-peak MLP FLOP/s).

Protocol: ``lax.scan`` over K train iterations inside one jitted dispatch,
post-fetch timing, per-iteration time = slope over K in (2, 4, 8).  Prints
one JSON object.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPEATS = 5


def main():
    import jax
    import jax.numpy as jnp

    import gym_supplychain_tpu as sct
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_ppo

    B = int(os.environ.get("GST_BENCH_ENVS", "4096"))
    cfg = PPOConfig(rollout_steps=16, epochs=2, hidden=(128, 128))
    cc = sct.make("supplychain-ntom-v0", total_time_steps=64).cc
    init_fn, train_step = make_ppo(cc, B, cfg)

    def make_run(iters):
        def fn(seed):
            state = init_fn(jax.random.PRNGKey(seed))

            def body(state, _):
                state, metrics = train_step(state)
                return state, metrics["loss"]

            state, losses = jax.lax.scan(body, state, None, length=iters)
            return losses.sum()

        return jax.jit(fn)

    def timed(fn, seed):
        t0 = time.perf_counter()
        float(fn(seed))
        return time.perf_counter() - t0

    med = {}
    for iters in (2, 4, 8):
        run = make_run(iters)
        timed(run, 0)
        med[iters] = float(np.median([timed(run, r + 1)
                                      for r in range(REPEATS)]))
    per_iter_s = (med[8] - med[2]) / 6
    env_steps_per_iter = B * cfg.rollout_steps
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "config": "supplychain-ntom-v0 PPO, 4096 envs, rollout 16, "
                  "2 epochs, (128,128) MLP",
        "median_ms": {str(k): round(v * 1e3, 2) for k, v in med.items()},
        "per_train_iter_ms": round(per_iter_s * 1e3, 3),
        "train_env_steps_per_s": round(env_steps_per_iter / per_iter_s, 1),
        "protocol": "post-fetch slope over 2/4/8 iters per dispatch, "
                    f"median of {REPEATS}",
    }))


if __name__ == "__main__":
    main()
