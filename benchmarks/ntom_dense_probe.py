"""Probe: can the dense collect kernel beat the unrolled one on ntom?

The unrolled kernel spends 5.8 of its 8.1 µs/step on the topology itself
(benchmarks/ntom_fused_profile.py); the dense kernel batches the phases
over nodes/edges ([N,P,D,Bt] ops) and draws lead-times per use, so its
op count per step is far lower.  Times mode='random' at several lane
tiles.  Run: `JAX_PLATFORMS='' python benchmarks/ntom_dense_probe.py`
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    import jax
    from gym_supplychain_tpu.envs.presets import (SupplyChainLinearEnv,
                                                  SupplyChainNtoMEnv)
    from gym_supplychain_tpu.ops.supplychain_pallas_dense import (
        make_supplychain_dense_collect_pallas)

    B = int(os.environ.get("GST_BENCH_ENVS", "4096"))
    T = 360
    assert jax.devices()[0].platform == "tpu", jax.devices()
    out = {"platform": "tpu", "B": B, "T": T}
    cases = [("ntom", SupplyChainNtoMEnv(total_time_steps=T).cc, (512, 1024, 4096)),
             ("linear", SupplyChainLinearEnv(total_time_steps=T).cc, (1024,))]
    for name, cc, tiles in cases:
        for tile in tiles:
            def make_call_runner(eps, cc=cc, tile=tile):
                run = make_supplychain_dense_collect_pallas(
                    cc, T, B, mode="random", episodes=eps, lane_tile=tile)

                def call(seed):
                    obs, rew = run(seed)
                    return obs.sum() + rew.sum()

                return call

            r = bench._fused_result(make_call_runner, T, inner_eps=8)
            key = f"{name}-tile{tile}"
            out[key] = {"per_step_us": r["per_step_us"],
                        "linearity_check": r["linearity_check"],
                        "linearity_ok": r["linearity_ok"]}
            print(f"# {key}: {r['per_step_us']} us/step "
                  f"(lin {r['linearity_check']})", file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
