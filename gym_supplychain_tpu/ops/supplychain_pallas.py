"""Pallas TPU kernel: whole-episode supply-chain rollout in one kernel.

Monte-Carlo episode sweeps (random-policy evaluation, the M4 workload) do
not need per-step observations on the host — the entire episode can run as
one Pallas program with every state buffer in VMEM: stock ``[N, P, B]``, the
in-transit pipeline as a ring ``[R, N, P, B]`` (slot = t % R, R = H + 1),
and the whole-episode demand table.  Actions are either drawn in-kernel from
the TPU PRNG (``seed`` mode — zero input bandwidth) or read from a
precomputed ``[T, A, B]`` table (parity testing against the scan engine).

Semantics mirror core/step.py phase-for-phase (reference
supplychain_env.py:208-396): arrivals -> stock-capacity penalty -> supply ->
sorted-cut ship with processing/ship clipping (including the reference's
bug-compatible shared ship-capacity bookkeeping, SURVEY.md §2.1-4) ->
retailer demand -> holding costs.  Per-step rewards ``[T, B]`` are the
output.

Stochastic lead-times take the per-episode table ``[T, K, B]`` as a kernel
input and reproduce the reference's action-dependent column consumption
(supplychain_env.py:252-254, :270, :344-348, :374-375; SURVEY.md §2.1-5):
each node's supply column index advances only for supplied amounts > 0, and
its transport columns start after the fired supplies, one per destination,
shared across products.  Column gathers are unrolled one-hot selects over
the K columns (K is a small static constant of the chain).

All node/product/destination loops are unrolled at trace time (they are
small static constants of the compiled chain); the sorted cut uses an
unrolled selection network over the ≤Dmax destination values, stable in
destination order exactly like the reference's tuple sort.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.compile import CompiledChain

__all__ = ["make_supplychain_episode_pallas",
           "make_supplychain_policy_rollout_pallas"]


def _uniform_pm1(shape):
    """Random floats in [-1, 1) from the on-chip PRNG (bitcast trick)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # uint32 mantissa -> [1, 2) float via exponent splice (logical shift on
    # uint32!), then affine to [-1, 1)
    fbits = pltpu.bitcast(
        jnp.bitwise_or(jnp.right_shift(bits, jnp.uint32(9)),
                       jnp.uint32(0x3F800000)), jnp.float32)
    return 2.0 * fbits - 3.0


def _make_episode_runners(cc: CompiledChain, T: int, B: int,
                          interpret: bool = False):
    """Build whole-episode rollout kernels for a compiled chain.

    Returns ``(run_seeded, run_actions, build_policy_runner)``.
    Constant lead-times:
    ``run_seeded(demands[T+1, R, P, B], seed)`` / ``run_actions(demands,
    actions[T, A, B])``.  Stochastic lead-times additionally take the
    per-episode table: ``run_seeded(demands, leadtimes[T, K, B], seed)`` /
    ``run_actions(demands, leadtimes, actions)``.  All return per-step
    rewards ``[T, B]`` float32.
    """
    N, P, Dmax, A, R, K = cc.N, cc.P, cc.Dmax, cc.A, cc.R, cc.K
    stochastic = bool(cc.stochastic_leadtimes)
    Lavg, Lmax = int(cc.Lavg), int(cc.Lmax)
    RING = int(cc.H) + 1
    f32 = jnp.float32
    i32 = jnp.int32

    is_retailer = np.asarray(cc.is_retailer)
    retailer_idx = [int(i) for i in np.asarray(cc.retailer_idx)]
    is_factory = np.asarray(cc.is_factory)
    has_supply = np.asarray(cc.has_supply)
    has_ship = np.asarray(cc.has_ship) & (~cc.is_retailer[:, None])
    supply_cap = np.asarray(cc.supply_cap, np.float32)
    supply_cost = np.asarray(cc.supply_cost, np.float32)
    stock_cap = np.asarray(cc.stock_cap, np.float32)
    stock_cost = np.asarray(cc.stock_cost, np.float32)
    proc_cap = np.asarray(cc.proc_cap, np.float32)
    proc_cost = np.asarray(cc.proc_cost, np.float32)
    proc_ratio = np.asarray(cc.proc_ratio, np.float32)
    ship_cap_edge = np.asarray(cc.ship_cap_edge, np.float32)
    ship_cost = np.asarray(cc.ship_cost, np.float32)
    edge_mask = np.asarray(cc.edge_mask)
    sup_act_idx = np.maximum(cc.sup_act_idx, 0)
    ship_act_idx = np.maximum(cc.ship_act_idx, 0)
    lt_base = np.asarray(cc.lt_base, np.int32)  # i32: TPU has no 64-bit ints
    init_stock = np.asarray(cc.initial_stock, np.float32)      # [N,P]
    init_pipe = np.asarray(cc.init_pipe, np.float32)           # [H,N,P]
    c_stock_pen = float(cc.c_stock_pen)
    c_proc_pen = float(cc.c_proc_pen)
    c_ship_pen = float(cc.c_ship_pen)
    c_unmet = float(cc.c_unmet)

    e_src, e_di = np.nonzero(edge_mask)
    e_dst = cc.edge_dst[e_src, e_di]
    edges = [(int(s), int(d), int(t)) for s, d, t in zip(e_src, e_di, e_dst)]
    dst_of = {(s, d): t2 for s, d, t2 in edges}

    # observation normalizers (mirrors core/step.py obs_fn)
    max_ship = np.asarray(cc.max_ship, np.float32)
    ms_safe = np.where(max_ship > 0, max_ship, 1.0)
    ms_ok = max_ship > 0
    dem_min = np.asarray(cc.dem_min, np.float32)
    dem_rangev = np.asarray(cc.dem_range, np.float32)

    def _kernel(*refs, mode: str, n_w: int = 0):
        """mode: 'seeded' (in-kernel PRNG actions), 'actions' (action table),
        'policy' (obs -> MLP actor -> tanh greedy action, all in-kernel)."""
        seeded = mode == "seeded"
        i = 0
        demand_ref = refs[i]; i += 1
        if stochastic:
            lt_ref = refs[i]; i += 1
        else:
            lt_ref = None
        if mode == "policy":
            w_refs = refs[i:i + n_w]; i += n_w
            act_ref = None
        else:
            act_ref = refs[i]; i += 1
        reward_ref, stock_ref, ring_ref = refs[i:i + 3]

        def _gather_lt(lt_row, idx):
            """One-hot gather: lt_row[K, B] int32, idx[B] int32 -> [B]."""
            idxc = jnp.clip(idx, 0, K - 1)
            out = jnp.zeros((B,), i32)
            for k in range(K):
                out = jnp.where(idxc == k, lt_row[k], out)
            return out

        # one grid step per episode step: the big [T, ...] tables stay in
        # HBM and pallas pipelines each step's block into VMEM, so VMEM use
        # is O(state), not O(T * B) (a whole-episode ntom table set is
        # ~100 MB at B=4096 — far past the scoped-VMEM limit)
        ti = pl.program_id(0)

        # --- episode init (reference reset, :630-682) on the first step ---
        @pl.when(ti == 0)
        def _init():
            for n in range(N):
                for p in range(P):
                    stock_ref[n, p] = jnp.full((B,), init_stock[n, p], f32)
            for r in range(RING):
                for n in range(N):
                    for p in range(P):
                        v = init_pipe[r - 1, n, p] \
                            if 1 <= r <= init_pipe.shape[0] else 0.0
                        # init_pipe[j] arrives at t=1+j -> ring slot 1+j
                        ring_ref[r, n, p] = jnp.full((B,), v, f32)

        if True:
            t = ti + 1
            slot = t % RING
            if seeded:
                # distinct per-step stream from (seed, step): the PRNG state
                # does not persist across grid steps
                pltpu.prng_seed(act_ref[0], ti)
                a = _uniform_pm1((A, B))
            elif mode == "policy":
                # --- fused policy-in-the-loop: build the observation from
                # the live VMEM state (mirrors core/step.py obs_fn: state at
                # scan-time ti, pipe[j] = ring[(t + j) % RING]) and run the
                # MLP actor on the MXU, greedy action = tanh(mu) ----------
                dem = demand_ref[0]                                # [R,P,B]
                rows = []
                for r in range(R):
                    for p in range(P):
                        rows.append((dem[r, p] - dem_min[p]) / dem_rangev[p])
                for n in range(N):
                    for p in range(P):
                        # direct division like the reference (:433);
                        # x / inf -> 0 for unbounded capacity
                        rows.append(stock_ref[n, p] / stock_cap[n, p])
                    for p in range(P):
                        for j in range(Lavg - 1):
                            pj = ring_ref[(t + j) % RING, n, p]
                            rows.append(pj / ms_safe[n, p]
                                        if ms_ok[n, p] else jnp.zeros((B,), f32))
                        tail = jnp.zeros((B,), f32)
                        for j in range(Lavg - 1, RING - 1):
                            tail = tail + ring_ref[(t + j) % RING, n, p]
                        rows.append(tail / (ms_safe[n, p] * (Lmax - (Lavg - 1)))
                                    if ms_ok[n, p] else jnp.zeros((B,), f32))
                remaining = (T - ti).astype(f32) / T
                rows.append(jnp.broadcast_to(remaining, (B,)))
                obs = jnp.clip(2.0 * jnp.stack(rows) - 1.0, -1.0, 1.0)

                x = obs
                for li in range(0, n_w - 2, 2):
                    x = jnp.tanh(
                        jax.lax.dot(w_refs[li][...], x,
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=f32)
                        + w_refs[li + 1][...])
                mu = (jax.lax.dot(w_refs[n_w - 2][...], x,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=f32)
                      + w_refs[n_w - 1][...])
                a = jnp.tanh(mu)
            else:
                a = act_ref[0]                                    # [A,B]
            a = (a + 1.0) * 0.5
            lt_row = lt_ref[0] if stochastic else None            # [K,B]

            reward = jnp.zeros((B,), f32)

            # phase 1+2: arrivals, stock-capacity penalty ------------------
            stocks = []
            for n in range(N):
                cols = []
                for p in range(P):
                    s = stock_ref[n, p] + ring_ref[slot, n, p]
                    if np.isfinite(stock_cap[n, p]):
                        excess = jnp.maximum(s - stock_cap[n, p], 0.0)
                        reward = reward - c_stock_pen * excess
                        s = jnp.minimum(s, stock_cap[n, p])
                    cols.append(s)
                stocks.append(cols)
            ring_ref[slot] = jnp.zeros((N, P, B), f32)

            # SHIP pipeline pushes accumulate as {(arrival_delay, n, p):
            # amount} in edge order and are written back with one ring add
            # per (delay, n, p) at the end of the step — supply pushes go to
            # the ring DIRECTLY first, mirroring the scan engine's separate
            # phase-3 and phase-4 adds (bit-exact parity requires the same
            # FP add association)
            upd = {}

            def push(L, n, p, amt):
                key = (L, n, p)
                upd[key] = upd.get(key, 0) + amt

            # phase 3: supply (:244-259).  Stochastic mode: per-node column
            # counter advances only for fired (amount > 0) supplies.
            nf_node = [None] * N         # per-node fired-supply count [B] i32
            for n in range(N):
                nf = jnp.zeros((B,), i32)
                for p in range(P):
                    if not has_supply[n, p]:
                        continue
                    amt = a[sup_act_idx[n, p]] * supply_cap[n, p]
                    reward = reward - amt * supply_cost[n, p]
                    fired = amt > 0
                    if stochastic:
                        lt = _gather_lt(lt_row, lt_base[n] + nf)
                        nf = nf + fired.astype(i32)
                        for L in range(1, Lmax + 1):
                            s = (t + L) % RING
                            ring_ref[s, n, p] = ring_ref[s, n, p] + jnp.where(
                                fired & (lt == L), amt, 0.0)
                    else:
                        s = (t + Lavg) % RING
                        ring_ref[s, n, p] = ring_ref[s, n, p] + jnp.where(
                            fired, amt, 0.0)
                nf_node[n] = nf

            # phase 4: ship (:262-375) ------------------------------------
            for n in range(N):
                if not has_ship[n].any():
                    continue
                if stochastic:
                    # transport columns follow the fired supplies, one per
                    # destination, shared across products (:270, :344-348);
                    # only real edges are ever consumed, skip masked slots
                    lt_d = [_gather_lt(lt_row,
                                       int(lt_base[n] + d) + nf_node[n])
                            if edge_mask[n, d] else None
                            for d in range(Dmax)]
                avail_proc = jnp.full((B,), proc_cap[n], f32)
                avail_ship = [jnp.full((B,), ship_cap_edge[n, d], f32)
                              for d in range(Dmax)]
                for p in range(P):
                    dvals = [jnp.where(edge_mask[n, d],
                                       a[ship_act_idx[n, p, d]], 0.0)
                             if has_ship[n, p] else jnp.zeros((B,), f32)
                             for d in range(Dmax)]
                    avail_mat = stocks[n][p]
                    # sorted-cut (SC_Action.apply SHIP, :58-96): sort values
                    # ascending, ties by destination index; destination d's
                    # cut is the gap to its sort predecessor.  pred_d =
                    # max{v_e : (v_e, e) <lex (v_d, d)} and rank_d = |{e :
                    # (v_e, e) <lex (v_d, d)}| by unrolled pairwise passes,
                    # then the reference's SEQUENTIAL cumulative clamp over
                    # sorted positions (:86-87) with one-hot selection —
                    # the identical FP ops in the identical order as
                    # core/step.py, so results are bit-exact vs the scan
                    # engine (the clamp binds only on float rounding, but a
                    # single-ULP `amounts` difference flips the branchy
                    # capacity bookkeeping downstream, so op order matters)
                    cuts = [None] * Dmax
                    ranks = [None] * Dmax
                    for d in range(Dmax):
                        pred = jnp.zeros((B,), f32)
                        rank = jnp.zeros((B,), i32)
                        for e in range(Dmax):
                            if e == d:
                                continue
                            before = (dvals[e] <= dvals[d]) if e < d else \
                                     (dvals[e] < dvals[d])
                            pred = jnp.where(before,
                                             jnp.maximum(pred, dvals[e]),
                                             pred)
                            rank = rank + before.astype(i32)
                        cuts[d] = (dvals[d] - pred) * avail_mat
                        ranks[d] = rank
                    availr = avail_mat
                    amounts = [jnp.zeros((B,), f32) for _ in range(Dmax)]
                    for k in range(Dmax):
                        cut_k = jnp.zeros((B,), f32)
                        for d in range(Dmax):
                            cut_k = cut_k + jnp.where(ranks[d] == k,
                                                      cuts[d], 0.0)
                        amt_k = jnp.minimum(cut_k, availr)
                        availr = availr - amt_k
                        for d in range(Dmax):
                            amounts[d] = amounts[d] + jnp.where(
                                ranks[d] == k, amt_k, 0.0)

                    # processing clip (factories, :298-310)
                    if is_factory[n]:
                        clipped = []
                        for d in range(Dmax):
                            ai = amounts[d]
                            gate = ai > 0
                            over = gate & (ai > avail_proc)
                            reward = reward - c_proc_pen * jnp.where(
                                over, ai - avail_proc, 0.0)
                            ai2 = jnp.where(over, avail_proc, ai)
                            avail_proc = avail_proc - jnp.where(gate, ai2, 0.0)
                            clipped.append(ai2)
                        to_ship = [c / proc_ratio[n, p] for c in clipped]
                        amounts = clipped
                    else:
                        to_ship = amounts

                    # ship clip, bug-compatible bookkeeping (:312-328)
                    leaving = jnp.zeros((B,), f32)
                    for d in range(Dmax):
                        if not edge_mask[n, d]:
                            continue
                        a2 = to_ship[d]
                        gate2 = (a2 > 0) & (a2 > avail_ship[d])
                        reward = reward - c_ship_pen * jnp.where(
                            gate2, a2 - avail_ship[d], 0.0)
                        a2c = jnp.where(gate2, avail_ship[d], a2)
                        raw = jnp.where(
                            gate2,
                            a2c * (proc_ratio[n, p] if is_factory[n] else 1.0),
                            amounts[d])
                        avail_ship[d] = avail_ship[d] - jnp.where(gate2, raw,
                                                                  0.0)
                        leaving = leaving + raw
                        reward = reward - a2c * ship_cost[n, p, d]
                        dst = dst_of[(n, d)]
                        # deliver into the destination pipeline (push only
                        # if > 0, :343-348)
                        if stochastic:
                            for L in range(1, Lmax + 1):
                                push(L, dst, p,
                                     jnp.where((a2c > 0) & (lt_d[d] == L),
                                               a2c, 0.0))
                        else:
                            # a2c can be negative once the bug-compatible
                            # bookkeeping drives avail_ship below zero
                            push(Lavg, dst, p, jnp.where(a2c > 0, a2c, 0.0))
                    stocks[n][p] = avail_mat - leaving
                    if is_factory[n]:
                        reward = reward - leaving * proc_cost[n, p]

            # phase 5: retailer demand (:378-387) -------------------------
            dem_row = demand_ref[0]                               # [R,P,B]
            for ri, n in enumerate(retailer_idx):
                for p in range(P):
                    d = dem_row[ri, p]
                    ful = jnp.minimum(stocks[n][p], d)
                    stocks[n][p] = stocks[n][p] - ful
                    reward = reward - c_unmet * (d - ful)

            # phase 6: holding costs (:389-394) + state writeback ---------
            for n in range(N):
                for p in range(P):
                    reward = reward - stocks[n][p] * stock_cost[n, p]
                    stock_ref[n, p] = stocks[n][p]
            # scatter pipeline pushes; arrival at t+L -> ring slot (t+L)%RING
            for (L, n, p), amt in upd.items():
                s = (t + L) % RING
                ring_ref[s, n, p] = ring_ref[s, n, p] + amt

            reward_ref[0, 0] = reward

    def _build(mode, n_w=0):
        kernel = functools.partial(_kernel, mode=mode, n_w=n_w)
        # grid over episode steps; per-step rows of the HBM-resident tables
        # are pipelined into VMEM as (1, ...) blocks
        in_specs = [pl.BlockSpec((1, R, P, B), lambda t: (t, 0, 0, 0))]
        if stochastic:
            in_specs.append(pl.BlockSpec((1, K, B), lambda t: (t, 0, 0)))
        if mode == "seeded":
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        elif mode == "actions":
            in_specs.append(pl.BlockSpec((1, A, B), lambda t: (t, 0, 0)))
        else:   # policy: weights/biases are small, VMEM-resident full blocks
            in_specs.extend(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in range(n_w))
        # rewards carry a singleton middle axis (squeezed by the wrappers):
        # TPU lowering requires a block's last two dims to divide (8, 128)
        # or equal the array's, and a (1, B) block over [T, B] does neither
        call = pl.pallas_call(
            kernel,
            grid=(T,),
            out_shape=jax.ShapeDtypeStruct((T, 1, B), f32),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, B), lambda t: (t, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((N, P, B), f32),          # stock
                pltpu.VMEM((RING, N, P, B), f32),    # pipeline ring
            ],
            interpret=interpret,
        )
        return lambda *args: call(*args).squeeze(1)

    def build_policy_runner(hidden):
        """Fused greedy-policy rollout: obs -> MLP actor -> tanh(mu) -> env
        step, the whole episode in one kernel.  Takes the init_actor_critic
        params dict; only the actor trunk + mu head enter the kernel."""
        n_w = 2 * len(hidden) + 2
        policy_call = _build("policy", n_w=n_w)

        def _flat(params):
            flat = []
            for layer in params["actor"]:
                flat += [jnp.asarray(layer["w"], f32),
                         jnp.asarray(layer["b"], f32)]
            flat += [jnp.asarray(params["mu"]["w"], f32),
                     jnp.asarray(params["mu"]["b"], f32)]
            assert len(flat) == n_w, (len(flat), n_w)
            return flat

        if stochastic:
            def run_policy(demands, leadtimes, params):
                """demands[T+1,R,P,B], leadtimes[T,K,B], params -> [T,B]."""
                return policy_call(jnp.asarray(demands, f32),
                                   jnp.asarray(leadtimes, i32),
                                   *_flat(params))
        else:
            def run_policy(demands, params):
                """demands[T+1,R,P,B], params -> rewards [T,B]."""
                return policy_call(jnp.asarray(demands, f32), *_flat(params))
        return jax.jit(run_policy)

    seeded_call = _build("seeded")
    actions_call = _build("actions")

    if stochastic:
        @jax.jit
        def run_seeded(demands, leadtimes, seed):
            """demands[T+1,R,P,B], leadtimes[T,K,B] i32, seed -> [T,B]."""
            return seeded_call(jnp.asarray(demands, f32),
                               jnp.asarray(leadtimes, i32),
                               jnp.asarray(seed, i32).reshape(1))

        @jax.jit
        def run_actions(demands, leadtimes, actions):
            """demands[T+1,R,P,B], leadtimes[T,K,B], actions[T,A,B]."""
            return actions_call(jnp.asarray(demands, f32),
                                jnp.asarray(leadtimes, i32),
                                jnp.asarray(actions, f32))
    else:
        @jax.jit
        def run_seeded(demands, seed):
            """demands[T+1, R, P, B] f32, seed scalar int32 -> rewards[T, B]."""
            return seeded_call(jnp.asarray(demands, f32),
                               jnp.asarray(seed, i32).reshape(1))

        @jax.jit
        def run_actions(demands, actions):
            """demands[T+1, R, P, B], actions[T, A, B] in [-1,1] -> [T, B]."""
            return actions_call(jnp.asarray(demands, f32),
                                jnp.asarray(actions, f32))

    return run_seeded, run_actions, build_policy_runner


def make_supplychain_episode_pallas(cc: CompiledChain, T: int, B: int,
                                    interpret: bool = False):
    """Whole-episode rollout kernels; see ``_make_episode_runners``.

    Returns ``(run_seeded, run_actions)`` (docstring above)."""
    run_seeded, run_actions, _ = _make_episode_runners(cc, T, B, interpret)
    return run_seeded, run_actions


def make_supplychain_policy_rollout_pallas(cc: CompiledChain, T: int, B: int,
                                           hidden=(128, 128),
                                           interpret: bool = False):
    """Fused greedy policy-in-the-loop rollout (one kernel per episode).

    Each grid step builds the observation from the live VMEM state, runs
    the MLP actor trunk + mu head on the MXU (f32, Precision.HIGHEST),
    takes the greedy action tanh(mu), and advances the environment — the
    exact workload of ``learn/evaluate.py`` with zero per-step HBM round
    trips for state or activations.  Takes ``init_actor_critic`` params.

    Returns ``run_policy(demands, [leadtimes,] params) -> rewards [T, B]``.
    """
    _, _, build = _make_episode_runners(cc, T, B, interpret)
    return build(tuple(hidden))
