"""Worker process for tests/test_multihost.py: joins a 2-process
jax.distributed CPU cluster (4 virtual devices per process = 8 global), runs
the sharded PPO train step over the GLOBAL mesh, and prints its loss.

This is the real multi-host code path (SURVEY.md §7 M5): every process
executes the same SPMD program; env shards live process-local on the mesh
'data' axis and gradient psums cross process boundaries via the collective
backend — exactly how a TPU pod run is driven, with Gloo/CPU standing in for
ICI.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    rank = int(sys.argv[1])
    port = sys.argv[2]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=rank)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    import gym_supplychain_tpu as sct
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_ppo
    from gym_supplychain_tpu.parallel.mesh import (make_mesh,
                                                   train_state_shardings)

    assert jax.device_count() == 8 and jax.local_device_count() == 4

    cc = sct.make("supplychain-ntom-v0", total_time_steps=8).cc
    B = 16
    init_fn, train_step = make_ppo(cc, B, PPOConfig(rollout_steps=4,
                                                    hidden=(16,)))
    mesh = make_mesh(data=8, model=1)
    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    out_shardings = train_state_shardings(mesh, shapes)
    repl = NamedSharding(mesh, P())

    state = jax.jit(init_fn, out_shardings=out_shardings)(
        jax.random.PRNGKey(0))
    step = jax.jit(train_step,
                   in_shardings=(out_shardings,),
                   out_shardings=(out_shardings,
                                  {"loss": repl, "mean_reward": repl,
                                   "mean_value": repl}))
    for _ in range(3):
        state, metrics = step(state)
    loss = float(metrics["loss"])
    reward = float(metrics["mean_reward"])
    assert np.isfinite(loss) and np.isfinite(reward)
    print(f"RANK{rank} loss={loss!r} mean_reward={reward!r}", flush=True)


if __name__ == "__main__":
    main()
