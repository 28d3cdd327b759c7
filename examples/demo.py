"""Quick tour of gym-supplychain-tpu (the reference's __main__ demos,
reimagined): single-env episode with render, a batched rollout, and a short
PPO training burst.

Run:  python examples/demo.py  [--batch 1024]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import gym_supplychain_tpu as sct

    print("=== registered env ids ===")
    print(", ".join(sct.registry()))

    print("\n=== single env (reference-parity API) ===")
    env = sct.make("supplychain-ntom-v0", total_time_steps=5)
    env.seed(0)
    env.reset()
    done = False
    while not done:
        _, reward, done, _ = env.step(env.action_space.sample())
    env.render()

    print("\n=== batched rollout ===")
    from gym_supplychain_tpu.envs.vector import VecSupplyChainEnv
    vec = VecSupplyChainEnv(cc=env.cc, batch_size=args.batch)
    vec.reset()
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    steps = 64
    for _ in range(steps):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (env.cc.A, args.batch), minval=-1., maxval=1.)
        out = vec.step(a)
    jax.block_until_ready(out.reward)
    dt = time.perf_counter() - t0
    print(f"{args.batch} envs x {steps} steps in {dt:.3f}s "
          f"= {args.batch * steps / dt:,.0f} env-steps/s (eager-loop, "
          f"see bench.py for the fused-scan number)")

    print("\n=== PPO training burst ===")
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_ppo
    init_fn, train_step = make_ppo(env.cc, args.batch,
                                   PPOConfig(rollout_steps=8, hidden=(64, 64)))
    state = init_fn(jax.random.PRNGKey(0))
    step = jax.jit(train_step)
    for it in range(10):
        state, metrics = step(state)
    print("after 10 train steps: loss=%.4f mean_reward=%.1f" %
          (float(metrics["loss"]), float(metrics["mean_reward"])))


if __name__ == "__main__":
    main()
