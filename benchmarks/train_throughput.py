"""Honest PPO training throughput on one chip, with a phase breakdown
(VERDICT r2 item 2; replaces the round-1 ~0.2 ms/iteration async-dispatch
mismeasurement).

Protocol: ``lax.scan`` over K iterations inside one jitted dispatch,
post-fetch timing, per-iteration time = bench.py's pilot-scaled
least-squares slope over four iteration counts (>= 100 ms of marginal
device work per slope interval, minima of repeated runs).  The
phase bodies reuse ``train_step``'s own closures (train_step.rollout/.gae),
so the breakdown measures the deployed code:

* ``rollout``      — vectorized env + policy sampling only
* ``rollout+gae``  — plus advantage estimation
* ``full``         — plus the ``epochs`` clipped-PPO updates
* ``update`` (derived) = full - rollout+gae

A second section measures :func:`make_ppo_fused` — collection through the
trajectory-emitting Pallas kernel (whole episodes, in-kernel PRNG +
auto-reset) feeding the same GAE/update — on the same chain.  Prints one
JSON object.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench

def _slope_per_iter(make_run):
    """Seconds per iteration via bench.py's r5 pilot-scaled protocol: a
    pilot pass sizes the iteration sweep so every slope interval carries
    >= 100 ms of marginal device work, then the least-squares slope is
    fitted on per-length minima.  The old fixed (2,4,8)-iteration sweep
    carried ~5-15 ms of marginal work against +-1-2 ms of per-dispatch
    noise and swung +-30% between runs of the same binary."""
    r = bench._measure_slope(make_run, 2)
    med = {int(k): v * 1e-3 for k, v in r["min_ms"].items()}
    return r["per_step_us"] * 1e-6, med


def main():
    import jax

    import gym_supplychain_tpu as sct
    from gym_supplychain_tpu.learn.ppo import (PPOConfig, make_ppo,
                                               make_ppo_fused)

    B = int(os.environ.get("GST_BENCH_ENVS", "4096"))
    # T=60 aligns the fused collection with the kernel's pipeline ring
    # (RING=5 on ntom): T % RING == 0 enables the RING-unrolled collect
    # grid with static VMEM ring addresses.  The r4 harness used T=64,
    # which silently fell back to the one-step-per-iteration grid and
    # nearly doubled the fused collection cost (16.1 vs ~9 us/step).
    T = 60
    cfg = PPOConfig(rollout_steps=16, epochs=2, hidden=(128, 128))
    cc = sct.make("supplychain-ntom-v0", total_time_steps=T).cc
    init_fn, train_step = make_ppo(cc, B, cfg)

    def scan_phase(body):
        def make_run(iters):
            def fn(seed):
                state = init_fn(jax.random.PRNGKey(seed))

                def wrap(state, _):
                    return body(state)

                state, outs = jax.lax.scan(wrap, state, None, length=iters)
                return outs.sum()

            return jax.jit(fn)
        return make_run

    def rollout_body(state):
        key, kr = jax.random.split(state.key)
        env_state, traj, last_value = train_step.rollout(
            state.params, state.env, kr)
        return (state._replace(env=env_state, key=key),
                traj.reward.sum() + traj.obs.sum() + last_value.sum())

    def gae_body(state):
        key, kr = jax.random.split(state.key)
        env_state, traj, last_value = train_step.rollout(
            state.params, state.env, kr)
        adv, ret = train_step.gae(traj, last_value)
        return (state._replace(env=env_state, key=key),
                adv.sum() + ret.sum())

    def full_body(state):
        state, metrics = train_step(state)
        return state, metrics["loss"]

    phases = {}
    for name, body in (("rollout", rollout_body), ("rollout+gae", gae_body),
                       ("full", full_body)):
        per_iter_s, med = _slope_per_iter(scan_phase(body))
        phases[name] = {"per_iter_ms": round(per_iter_s * 1e3, 3),
                        "median_ms": {str(k): round(v * 1e3, 2)
                                      for k, v in med.items()}}
    phases["update (derived)"] = {"per_iter_ms": round(
        phases["full"]["per_iter_ms"]
        - phases["rollout+gae"]["per_iter_ms"], 3)}
    phases["gae (derived)"] = {"per_iter_ms": round(
        phases["rollout+gae"]["per_iter_ms"]
        - phases["rollout"]["per_iter_ms"], 3)}
    scan_steps = B * cfg.rollout_steps
    scan_ms = phases["full"]["per_iter_ms"]
    scan_sps = scan_steps / (scan_ms * 1e-3)

    # ---- bf16 learner trunk on the scan path (VERDICT r3 item 3: the
    # update phase has no env-parity obligation; quality covered by
    # tests/test_vector_learn.py::test_ppo_improves_bf16_learner) ---------
    import jax.numpy as jnp
    cfg16 = cfg._replace(learner_dtype=jnp.bfloat16)
    init16, step16 = make_ppo(cc, B, cfg16)

    def full16_run(iters):
        def fn(seed):
            state = init16(jax.random.PRNGKey(seed))

            def body(state, _):
                state, metrics = step16(state)
                return state, metrics["loss"]

            state, losses = jax.lax.scan(body, state, None, length=iters)
            return losses.sum()

        return jax.jit(fn)

    scan16_s, scan16_med = _slope_per_iter(full16_run)
    scan16_sps = scan_steps / scan16_s

    # ---- fused Pallas collection path (whole T-step episodes) -----------
    def fused_result(fcfg):
        f_init, f_step = make_ppo_fused(cc, B, fcfg, episodes=1,
                                        noise="prng")

        def make_fused_run(iters):
            def fn(seed):
                state = f_init(jax.random.PRNGKey(seed))

                def body(state, _):
                    state, metrics = f_step(state)
                    return state, metrics["loss"]

                state, losses = jax.lax.scan(body, state, None,
                                             length=iters)
                return losses.sum()

            return jax.jit(fn)

        fused_s, fused_med = _slope_per_iter(make_fused_run)
        fused_steps = B * T
        return {
            "env_steps_per_iter": fused_steps,
            "per_train_iter_ms": round(fused_s * 1e3, 3),
            "median_ms": {str(k): round(v * 1e3, 2)
                          for k, v in fused_med.items()},
            "train_env_steps_per_s": round(fused_steps / fused_s, 1),
        }

    fused32 = fused_result(cfg)
    fused16 = fused_result(cfg16)
    # ---- fused UPDATE kernel (ops/ppo_update_pallas.py): forward + loss
    # + backward in one Pallas pass, activations in VMEM tiles ------------
    cfg_fu = cfg16._replace(fused_update=True)
    fused_fu = fused_result(cfg_fu)

    def scan_fu_result():
        init_fu, step_fu = make_ppo(cc, B, cfg_fu)

        def make_run(iters):
            def fn(seed):
                state = init_fu(jax.random.PRNGKey(seed))

                def body(state, _):
                    state, metrics = step_fu(state)
                    return state, metrics["loss"]

                state, losses = jax.lax.scan(body, state, None,
                                             length=iters)
                return losses.sum()

            return jax.jit(fn)

        s, med = _slope_per_iter(make_run)
        return {
            "env_steps_per_iter": scan_steps,
            "per_train_iter_ms": round(s * 1e3, 3),
            "median_ms": {str(k): round(v * 1e3, 2)
                          for k, v in med.items()},
            "train_env_steps_per_s": round(scan_steps / s, 1),
        }

    scan_fu = scan_fu_result()
    fused_sps = fused_fu["train_env_steps_per_s"]
    best = max(scan_sps, scan16_sps, fused32["train_env_steps_per_s"],
               fused16["train_env_steps_per_s"], fused_sps,
               scan_fu["train_env_steps_per_s"])

    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "config": f"supplychain-ntom-v0 PPO, {B} envs, T={T}, "
                  f"rollout {cfg.rollout_steps} (unroll "
                  f"{cfg.rollout_unroll}), {cfg.epochs} epochs, "
                  "(128,128) MLP",
        "protocol": "bench.py pilot-scaled post-fetch slope (>=100 ms "
                    "marginal work per interval, min-of-repeats LS fit)",
        "scan_path": {
            "phases": phases,
            "env_steps_per_iter": scan_steps,
            "per_train_iter_ms": scan_ms,
            "train_env_steps_per_s": round(scan_sps, 1),
        },
        "scan_path_bf16_learner": {
            "note": "learner_dtype=bf16 trunk in the update only; rollout "
                    "forward unchanged",
            "env_steps_per_iter": scan_steps,
            "per_train_iter_ms": round(scan16_s * 1e3, 3),
            "median_ms": {str(k): round(v * 1e3, 2)
                          for k, v in scan16_med.items()},
            "train_env_steps_per_s": round(scan16_sps, 1),
        },
        "fused_path": {
            "collection": "Pallas collect kernel, whole 64-step episodes, "
                          "in-kernel PRNG, policy+value+logp on MXU",
            **fused32,
        },
        "fused_path_bf16_learner": fused16,
        "fused_path_fused_update": {
            "note": "fused collection + ops/ppo_update_pallas.py gradient "
                    "kernel (bf16 operands): forward+loss+backward in one "
                    "Pallas pass, activations never round-trip HBM",
            **fused_fu,
        },
        "scan_path_fused_update": scan_fu,
        "best_train_env_steps_per_s": round(best, 1),
        "fused_vs_scan_speedup": round(fused_sps / scan_sps, 2),
    }, indent=1))


if __name__ == "__main__":
    main()
