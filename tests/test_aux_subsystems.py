"""Auxiliary subsystems (SURVEY.md §5 — all absent upstream, new here):
checkpoint/resume round-trip, the training CLI end-to-end, and profiling
utilities."""
import os

import jax
import jax.numpy as jnp
import numpy as np


def test_checkpoint_roundtrip_exact(tmp_path):
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_ppo
    from gym_supplychain_tpu.utils.checkpoint import (restore_checkpoint,
                                                      save_checkpoint)
    import gym_supplychain_tpu as sct

    cc = sct.make("supplychain-linear-v0", total_time_steps=8).cc
    init_fn, train_step = make_ppo(cc, 16, PPOConfig(rollout_steps=4,
                                                     hidden=(16,)))
    state = init_fn(jax.random.PRNGKey(0))
    state, _ = jax.jit(train_step)(state)

    path = save_checkpoint(str(tmp_path / "ckpt"), state, step=1)
    restored = restore_checkpoint(path, like=state)
    # passing the checkpoint DIRECTORY resolves the latest step_N
    from_dir = restore_checkpoint(str(tmp_path / "ckpt"), like=state)
    for a, b in zip(jax.tree.leaves(from_dir), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # exact resume: every leaf bitwise equal, and training continues
    # identically from the restored state
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s1, m1 = jax.jit(train_step)(state)
    s2, m2 = jax.jit(train_step)(restored)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=0)


def test_train_cli_smoke(tmp_path, capsys):
    from gym_supplychain_tpu.learn.train import main
    ckdir = str(tmp_path / "run")
    main(["--env", "supplychain-linear-v0", "--envs", "8", "--iters", "3",
          "--rollout-steps", "4", "--hidden", "16", "--horizon", "8",
          "--log-every", "2", "--checkpoint-dir", ckdir])
    out = capsys.readouterr().out
    assert "checkpoint:" in out
    assert any(os.scandir(ckdir))


def test_throughput_and_log_metrics(capsys):
    from gym_supplychain_tpu.utils.profiling import Throughput, log_metrics
    meter = Throughput(batch_size=4)
    sps = meter.update(10)
    assert sps >= 0
    log_metrics(5, {"loss": jnp.float32(1.5), "r": 2.0})
    out = capsys.readouterr().out
    assert '"step": 5' in out and '"loss": 1.5' in out


def test_generate_demand_public_api():
    """The reference exposes ``generate_demand`` as a public function
    (demands_generator.py:3-31); ours is re-exported at the package root and
    bit-matches the reference streams (see test_rng_streams for the full
    matrix)."""
    from gym_supplychain_tpu import generate_demand
    rs = np.random.RandomState(0)
    d = generate_demand(rs, (11, 2, 1), 10, 0, 10)   # reference flat kwargs
    rs2 = np.random.RandomState(0)
    np.testing.assert_array_equal(d, rs2.randint(0, 11, size=(11, 2, 1)))
    # seasonal path with the reference's keyword surface
    rs3 = np.random.RandomState(1)
    s = generate_demand(rs3, (11, 2), 10, 0, 400, std=5, sen_peaks=4,
                        minavg=150, maxavg=250)
    assert s.shape == (11, 2) and (s >= 0).all() and (s <= 400).all()


def test_train_checkpoint_evaluate_roundtrip(tmp_path, capsys):
    """Full lifecycle: train -> checkpoint -> restore -> greedy evaluation
    (the serving path)."""
    from gym_supplychain_tpu.learn.evaluate import main as eval_main
    from gym_supplychain_tpu.learn.train import main as train_main

    ckdir = str(tmp_path / "run")
    train_main(["--env", "supplychain-linear-v0", "--envs", "8", "--iters",
                "2", "--rollout-steps", "4", "--hidden", "16", "--horizon",
                "8", "--checkpoint-dir", ckdir])
    ck = [os.path.join(ckdir, f) for f in os.listdir(ckdir)][0]
    eval_main(["--restore", ck, "--env", "supplychain-linear-v0", "--envs",
               "8", "--episodes", "2", "--horizon", "8"])
    out = capsys.readouterr().out
    assert "mean_return" in out
