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

    # Measurement hygiene for the tunneled-TPU runtime: inputs are generated
    # on device from a PRNG key (multi-MB jit arguments are re-shipped per
    # call, multi-MB embedded constants wedge the remote compile) and every
    # jitted function returns a SCALAR (large jit outputs are shipped
    # eagerly, ~30 ms for the [W, B] reward table).  The bit-equality check
    # therefore also runs on device.
    def _actions(key):
        return jax.random.randint(key, (W, L, B), 0, 16, jnp.int32)

    def _pallas(acts):
        dem_dev = jnp.broadcast_to(jnp.asarray(demand)[:, None], (W, B))
        inv_dev = jnp.full((L, B), 12, jnp.int32)
        return beergame_episode_pallas(dem_dev, acts, inv_dev)

    @jax.jit
    def check_fn(key):
        acts = _actions(key)
        return jnp.array_equal(_pallas(acts), scan_ep(acts))

    @jax.jit
    def pallas_fn(key):
        return _pallas(_actions(key)).sum()

    @jax.jit
    def scan_fn(key):
        return scan_ep(_actions(key)).sum()

    def best(fn):
        fn(jax.random.PRNGKey(99)).block_until_ready()   # warm
        b = float("inf")
        for r in range(repeats):
            k = jax.random.PRNGKey(r)
            t0 = time.perf_counter()
            fn(k).block_until_ready()
            b = min(b, time.perf_counter() - t0)
        return b

    tp = best(pallas_fn)
    ts = best(scan_fn)
    # value fetch LAST: under the tunneled runtime the first device->host
    # fetch in a process is slow and permanently degrades later dispatches,
    # so it must not precede the timing loops
    equal = bool(jax.device_get(check_fn(jax.random.PRNGKey(0))))
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
