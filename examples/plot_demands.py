"""Demand-process gallery (the reference's demands_generator __main__ demo,
demands_generator.py:91-120, reimagined): plots the uniform, normal and
seasonal demand processes from both the host parity generator (MT19937,
bit-exact with the reference) and the on-device jax.random fast path.

Run:  python examples/plot_demands.py [out.png]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(out="demands.png"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from gym_supplychain_tpu import DemandConfig, generate_demand

    horizon = 360
    rs = np.random.RandomState(0)
    configs = [
        ("uniform [0, 400]", DemandConfig(minv=0, maxv=400)),
        ("normal mid=200 std=50", DemandConfig(minv=0, maxv=400, std=50)),
        ("seasonal 4 peaks avg [150, 250]",
         DemandConfig(minv=0, maxv=400, std=20, sen_peaks=4,
                      minavg=150, maxavg=250)),
        ("seasonal 2 peaks uniform perturbation",
         DemandConfig(minv=0, maxv=400, std=15, sen_peaks=2, minavg=100,
                      maxavg=300, perturb_norm=False)),
    ]
    fig, axes = plt.subplots(2, 2, figsize=(11, 6), sharex=True)
    for ax, (title, cfg) in zip(axes.ravel(), configs):
        d = generate_demand(rs, (horizon + 1, 1), horizon, cfg)
        ax.plot(d[:, 0], lw=0.8)
        ax.set_title(title, fontsize=9)
    fig.suptitle("gym-supplychain-tpu demand processes (host parity RNG)")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
