"""Measured XLA-vs-Pallas tradeoff for the beer game episode kernel.

Runs the same precomputed-action episode workload through (a) the lax.scan
step kernel (core/beergame.py) and (b) the fused whole-episode Pallas kernel
(ops/beergame_pallas.py), checks bit-equality on device, and prints one JSON
line with both throughputs.  Run on the TPU (default env); see
docs/PERFORMANCE.md for recorded numbers.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(B=4096, W=35, L=4, repeats=30):
    import jax
    import jax.numpy as jnp

    from gym_supplychain_tpu.core.beergame import make_beergame_kernels
    from gym_supplychain_tpu.ops.beergame_pallas import beergame_episode_pallas

    rs = np.random.RandomState(0)
    demand = np.array([4] * 4 + [8] * (W - 4), np.int32)
    dem2 = np.broadcast_to(demand[:, None], (W, B)).copy()
    actions = rs.randint(0, 16, size=(W, L, B)).astype(np.int32)
    inv0 = np.full((L, B), 12, np.int32)

    reset_fn, step_fn, _ = make_beergame_kernels(L, W, 2, itype=jnp.int32)
    delays = np.full(W + 1, 2, np.int32)

    @jax.jit
    def scan_ep(actions):
        st = reset_fn(demand, delays, [12] * L, 4, 4, B)

        def body(st, a):
            st, (_, r, _) = step_fn(st, a)
            return st, r

        _, rws = jax.lax.scan(body, st, actions)
        return rws

    # The action table is embedded as a compile-time constant: under this
    # runtime every jitted-call array argument is re-shipped through the TPU
    # tunnel (~30 ms for the 2.3 MB table), which would swamp the sub-ms
    # kernels we are comparing.
    pallas_fn = jax.jit(
        lambda: beergame_episode_pallas(dem2, actions, inv0))
    scan_fn = jax.jit(lambda: scan_ep(actions))

    out_p = pallas_fn()
    out_s = scan_fn()
    jax.block_until_ready((out_p, out_s))
    equal = bool(jax.device_get(jnp.array_equal(out_p, out_s)))

    def best(fn):
        b = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn().block_until_ready()
            b = min(b, time.perf_counter() - t0)
        return b

    tp = best(pallas_fn)
    ts = best(scan_fn)
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "bit_equal": equal,
        "pallas_ms": round(tp * 1e3, 4),
        "scan_ms": round(ts * 1e3, 4),
        "pallas_steps_per_s": round(W * B / tp, 1),
        "scan_steps_per_s": round(W * B / ts, 1),
    }))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
