"""Batch-size scaling of BOTH engines (VERDICT r3 item 7).

Sweeps the env batch over 1k-64k for the scan engine and the fused collect
kernels (linear / ntom / beergame), with the bench.py slope protocol.  The
fused kernels' episodes-per-call shrink with B so the HBM trajectory
buffers stay bounded; a config that fails to compile (e.g. VMEM ceiling)
is recorded with its error rather than dropped, so the table shows where
each kernel tops out and why.

Run on the TPU: `JAX_PLATFORMS='' python benchmarks/batch_scaling.py`
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

BATCHES = tuple(int(x) for x in os.environ.get(
    "GST_BATCHES", "1024,4096,16384,65536").split(","))


def _sc_fused(cc, B, T=360):
    from gym_supplychain_tpu.ops.supplychain_pallas import (
        auto_batch_tile, make_supplychain_collect_pallas)

    # keep one call's HBM trajectory buffers ~constant across B
    eps = max(1, 8 * 4096 // B)

    def make_call_runner(eps):
        run = make_supplychain_collect_pallas(cc, T, B, mode="random",
                                              episodes=eps,
                                              batch_tile=auto_batch_tile(B))

        def call(seed):
            obs, rew = run(seed)
            return obs.sum() + rew.sum()

        return call

    return bench._fused_result(make_call_runner, T, inner_eps=eps)


def _bg_fused(B, weeks=35):
    import jax.numpy as jnp
    from gym_supplychain_tpu.ops.beergame_pallas import (
        make_beergame_collect_pallas)
    from gym_supplychain_tpu.ops.supplychain_pallas import auto_batch_tile
    import numpy as np

    demand = np.array([4] * 4 + [8] * (weeks - 4), np.int32)
    eps = max(25, 400 * 4096 // B)

    def make_call_runner(eps):
        run = make_beergame_collect_pallas(weeks, 4, B, episodes=eps,
                                           mode="random",
                                           batch_tile=auto_batch_tile(B))

        def call(seed):
            obs, rew = run(demand, seed)
            return (obs.astype(jnp.float32).sum()
                    + rew.astype(jnp.float32).sum())

        return call

    return bench._fused_result(make_call_runner, weeks, inner_eps=eps)


def main():
    import jax
    from gym_supplychain_tpu.envs.presets import (SupplyChainLinearEnv,
                                                  SupplyChainNtoMEnv)

    assert jax.devices()[0].platform == "tpu", jax.devices()
    out = {"platform": "tpu", "batches": list(BATCHES),
           "protocol": "bench.py post-fetch slope; fused episodes-per-call "
                       "scaled down with B to bound trajectory HBM; fused "
                       "kernels lane-tiled at auto_batch_tile(B) (<=8192)"}
    linear_cc = SupplyChainLinearEnv(total_time_steps=360).cc
    ntom_cc = SupplyChainNtoMEnv(total_time_steps=360).cc

    cases = {
        "supplychain-linear-v0": {
            "scan": lambda B: bench.bench_supplychain(linear_cc, B),
            "fused": lambda B: _sc_fused(linear_cc, B),
        },
        "supplychain-ntom-v0": {
            "scan": lambda B: bench.bench_supplychain(ntom_cc, B),
            "fused": lambda B: _sc_fused(ntom_cc, B),
        },
        "beergame-v0": {
            "scan": lambda B: bench.bench_beergame(B),
            "fused": lambda B: _bg_fused(B),
        },
    }
    for name, engines in cases.items():
        out[name] = {}
        for eng, fn in engines.items():
            rows = {}
            for B in BATCHES:
                try:
                    r = fn(B)
                    rows[str(B)] = {
                        "per_step_us": r["per_step_us"],
                        "steps_per_s": round(B / (r["per_step_us"] * 1e-6), 1),
                        "linearity_check": r["linearity_check"],
                        "linearity_ok": r["linearity_ok"],
                    }
                except Exception as e:  # record the ceiling, don't drop it
                    rows[str(B)] = {"error": f"{type(e).__name__}: "
                                             f"{str(e)[:300]}"}
                print(f"# {name} {eng} B={B}: "
                      f"{rows[str(B)].get('per_step_us', 'FAIL')}",
                      file=sys.stderr, flush=True)
            out[name][eng] = rows
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
