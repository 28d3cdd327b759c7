"""Profile the stochastic-lead-time cost inside the ntom fused collect
kernel (VERDICT r3 item 5: fused ntom 8.12 µs/step vs linear 1.69 on the
same node count — how much is the stochastic machinery vs the topology?).

Times mode='random' collection (the headline workload) for:
  * ntom, stochastic lead-times (the stock headline config)
  * ntom, stochastic_leadtimes=False (constant Lavg) — same 8-node
    full-bipartite topology, same costs, no lead-time draws / gathers /
    Lmax-masked pipeline scatter
  * linear (4-node chain) for scale

Run on the TPU: `JAX_PLATFORMS='' python benchmarks/ntom_fused_profile.py`
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def time_fused(cc, B, T, eps=8, ablate=frozenset()):
    from gym_supplychain_tpu.ops.supplychain_pallas import (
        make_supplychain_collect_pallas)

    def make_call_runner(eps):
        run = make_supplychain_collect_pallas(cc, T, B, mode="random",
                                              episodes=eps, ablate=ablate)

        def call(seed):
            obs, rew = run(seed)
            return obs.sum() + rew.sum()

        return call

    return bench._fused_result(make_call_runner, T, inner_eps=eps)


def main():
    import jax
    from gym_supplychain_tpu.envs.presets import (SupplyChainLinearEnv,
                                                  SupplyChainNtoMEnv)

    B = int(os.environ.get("GST_BENCH_ENVS", "4096"))
    T = 360
    assert jax.devices()[0].platform == "tpu", jax.devices()
    out = {"platform": "tpu", "B": B, "T": T}
    configs = {
        "ntom-stochastic": SupplyChainNtoMEnv(total_time_steps=T).cc,
        "ntom-constant-lt": SupplyChainNtoMEnv(
            total_time_steps=T, stochastic_leadtimes=False).cc,
        "linear": SupplyChainLinearEnv(total_time_steps=T).cc,
    }
    for name, cc in configs.items():
        r = time_fused(cc, B, T)
        out[name] = {"per_step_us": r["per_step_us"],
                     "linearity_check": r["linearity_check"],
                     "linearity_ok": r["linearity_ok"]}
        print(f"# {name}: {r['per_step_us']} us/step "
              f"(lin {r['linearity_check']})", file=sys.stderr, flush=True)

    # phase attribution on the headline config: re-time with each phase
    # replaced by a measurement stub (supplychain_pallas.py ``ablate``);
    # the delta vs the full kernel is that phase's marginal cost.  Stubs
    # change the dynamics (dropped deliveries shrink downstream work), so
    # deltas are indicative attribution, not an exact decomposition.
    base = out["ntom-stochastic"]["per_step_us"]
    cc = configs["ntom-stochastic"]
    abl = {}
    for flag in ("obs", "sortcut", "ship", "supply", "scatter", "prng"):
        r = time_fused(cc, B, T, ablate={flag})
        abl[flag] = {"per_step_us": r["per_step_us"],
                     "marginal_us": round(base - r["per_step_us"], 4),
                     "linearity_check": r["linearity_check"]}
        print(f"# ablate {flag}: {r['per_step_us']} us/step "
              f"(marginal {abl[flag]['marginal_us']})",
              file=sys.stderr, flush=True)
    out["ablation"] = abl
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
