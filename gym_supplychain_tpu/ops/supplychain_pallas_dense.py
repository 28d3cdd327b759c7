"""Dense Pallas collect kernel: whole-episode rollouts for LARGE topologies.

The per-node kernels in :mod:`supplychain_pallas` unroll every node /
product / destination pair into separate [B]-wide vector ops — ideal for the
small preset chains, but the trace explodes combinatorially on the 26-40
node NPerStage topologies (N*P*Dmax^2 unrolled ops put Mosaic compile past
10 minutes).  This module implements the SAME whole-episode trajectory
collection with a *dense* body: the env phases mirror core/step.py's padded
array kernel op-for-op on ``[N, P, D, Bt]``-shaped VMEM values, so the
traced body stays a few hundred ops regardless of topology size, while all
intermediates live in VMEM (the XLA scan path materializes each masked pass
of the sorted cut to HBM — measured 752 us/step on the [5,4,7,10]x4 chain
at B=4096, VERDICT r2 item 7).

Layout: the batch is tiled over lanes — grid ``(B // Bt, S)`` with the
episode-step dimension innermost, state scratch ``stock [N, P, Bt]`` /
``ring [RING, N, P, Bt]`` re-initialised at every episode boundary
(in-kernel auto-reset), and each step's trajectory row (obs, reward)
written to HBM output blocks.  Per-node parameter tables enter the kernel
as small VMEM inputs (Pallas kernels cannot capture array constants).

The ship phase runs per *degree group* (contiguous runs of nodes with equal
out-degree, which all preset topologies have): the sorted cut is quadratic
in the destination count, so tight ``[n_g, P, D, Bt]`` arrays do
``sum(n_g * D^2)`` work instead of ``N * Dmax^2`` (976 vs 2600 on the
[5,4,7,10] chain).  Dropping a node's zero-valued padding slots is exact:
they sort first with zero cuts and zero amounts, leaving the clamp's FP
trajectory over real slots unchanged (same argument as core/step.py).

Modes
-----
* ``'random'`` — the headline collection workload: per-step iid action
  components, demand rows and lead-times from the on-chip PRNG (direct iid
  draws; the reference consumes a distinct lead-time column per use within
  a step, so per-use draws are distribution-identical), obs + reward
  emitted every step, auto-reset.
* ``'actions'`` — parity mode: standard scan-engine tables go through a
  host-side pre-gather (the action-indexed selects of core/step.py,
  vectorized over steps) and the kernel replays them — used by
  tests/test_pallas_dense.py to pin the kernel against the scan engine.

Reference: behavior matches gym_supplychain/envs/supplychain_env.py:208-396
via core/step.py (see its docstrings for the reference line map).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.compile import CompiledChain
from ..rng.device import poisson_clip_thresholds
from .supplychain_pallas import _demand_from_u, _uniform_01

__all__ = ["make_supplychain_dense_collect_pallas", "dense_groups"]


def dense_groups(cc: CompiledChain):
    """Contiguous runs of equal out-degree with dense-prefix edge slots.

    Returns ``[(n0, n1, D), ...]`` covering every shipping node, or ``None``
    if the topology's edge slots are not dense prefixes (callers then fall
    back to one Dmax-padded masked group)."""
    em = np.asarray(cc.edge_mask)
    deg = em.sum(1)
    ok = all(em[n, :deg[n]].all() and not em[n, deg[n]:].any()
             for n in range(cc.N))
    if not ok:
        return None
    groups = []
    n = 0
    while n < cc.N:
        if deg[n] == 0:
            n += 1
            continue
        m = n
        while m < cc.N and deg[m] == deg[n]:
            m += 1
        groups.append((n, m, int(deg[n])))
        n = m
    return groups


def _make_dense(cc: CompiledChain, T: int, B: int, lane_tile: int,
                interpret: bool):
    N, P, Dmax, A, R, K = cc.N, cc.P, cc.Dmax, cc.A, cc.R, cc.K
    stochastic = bool(cc.stochastic_leadtimes)
    Lavg, Lmax = int(cc.Lavg), int(cc.Lmax)
    RING = int(cc.H) + 1
    O = int(cc.obs_dim)
    f32, i32 = jnp.float32, jnp.int32
    Bt = min(int(lane_tile), B)
    if B % Bt:
        raise ValueError(f"B={B} not divisible by lane_tile={Bt}")
    nB = B // Bt

    is_factory = np.asarray(cc.is_factory)
    has_supply = np.asarray(cc.has_supply)
    has_ship = np.asarray(cc.has_ship) & (~cc.is_retailer[:, None])
    supply_cap = np.asarray(cc.supply_cap, np.float32)
    stock_cap = np.asarray(cc.stock_cap, np.float32)
    edge_mask = np.asarray(cc.edge_mask)
    edge_dst = np.asarray(cc.edge_dst)
    init_pipe = np.asarray(cc.init_pipe, np.float32)
    max_ship = np.asarray(cc.max_ship, np.float32)
    ret_idx = np.asarray(cc.retailer_idx)
    # presets put retailers in one contiguous final run
    ret_contig = bool(np.all(np.diff(ret_idx) == 1)) if R > 1 else True
    r0 = int(ret_idx[0])

    groups = dense_groups(cc)
    if groups is None:       # padded fallback: one masked Dmax-wide group
        groups = [(0, N, Dmax)]
        masked_pad = True
    else:
        masked_pad = False
    any_finite_cap = bool(np.isfinite(stock_cap).any())

    lt_cdf = poisson_clip_thresholds(Lavg - 1, Lmax) if stochastic else None
    any_normal = any(
        (cfg.std is not None) if cfg.sen_peaks is None else cfg.perturb_norm
        for cfg in cc.demand)

    # Per-node tables as kernel inputs (bool masks as 0/1 f32 planes); the
    # kernel reads them into a dict by name.
    ring0 = np.zeros((RING, N, P), np.float32)
    ring0[1:1 + init_pipe.shape[0]] = init_pipe[:RING - 1]
    _01 = lambda m: np.asarray(m, np.float32)
    CONSTS = {
        "supply_cap": supply_cap,
        "supply_cost": _01(cc.supply_cost),
        "stock_cap": stock_cap,
        "stock_cost": _01(cc.stock_cost),
        "stock_cap_fin": _01(np.isfinite(stock_cap)),
        "proc_cost": _01(cc.proc_cost),
        "proc_ratio": _01(cc.proc_ratio),
        "proc_cap2": _01(cc.proc_cap)[:, None],
        "is_factory2": _01(is_factory)[:, None],
        "has_supply": _01(has_supply),
        "ship_mask": _01(has_ship[:, :, None] & edge_mask[:, None, :]),
        "edge_mask": _01(edge_mask),
        "ship_cap_edge": _01(cc.ship_cap_edge),
        "ship_cost": _01(cc.ship_cost),
        "init_stock": _01(cc.initial_stock),
        "ring0": ring0,
        "ms_safe": np.where(max_ship > 0, max_ship, 1.0).astype(np.float32),
        "ms_ok": _01(max_ship > 0),
        "dem_min": _01(cc.dem_min)[None, :],
        "dem_range": _01(cc.dem_range)[None, :],
    }
    CNAMES = sorted(CONSTS)

    # ------------------------------------------------------------------
    # dense env phases (op-for-op mirror of core/step.py step_fn)
    # ------------------------------------------------------------------
    def _sorted_cut(v, s_g, D):
        """v [n,P,D,Bt] in [0,1] (zeros at padded slots), s_g [n,P,Bt]
        stock -> amounts [n,P,D,Bt] (core/step.py _sorted_cut,
        VMEM-resident; the scan engine's at-capacity action-dtype branch
        collapses at f32: both paths multiply the same two f32 values)."""
        w = jnp.full(v.shape, -jnp.inf, f32)
        rank = jnp.zeros(v.shape, i32)
        didx = jax.lax.broadcasted_iota(i32, (1, 1, D, 1), 2)
        for j in range(D):
            vj = v[:, :, j:j + 1, :]
            before = (vj < v) | ((vj == v) & (didx > j))
            w = jnp.maximum(w, jnp.where(before, vj, -jnp.inf))
            rank = rank + before
        w = jnp.where(rank == 0, 0.0, w)
        cut = (v - w) * s_g[:, :, None, :]
        availr = s_g
        amounts = jnp.zeros(cut.shape, f32)
        for k in range(D):
            sel = rank == k
            cut_k = jnp.where(sel, cut, 0.0).sum(axis=2)
            amt_k = jnp.minimum(cut_k, availr)
            availr = availr - amt_k
            amounts = amounts + jnp.where(sel, amt_k[:, :, None, :], 0.0)
        return amounts

    def _phases(C, stock_ref, ring_ref, a_sup, a_shp, lt_sup, lt_shp,
                dem_row, t):
        """One env step on dense VMEM values.  ``a_sup [N,P,Bt]`` /
        ``a_shp [N,P,Dmax,Bt]`` already in [0,1] and masked;
        ``lt_sup [N,P,Bt]`` / ``lt_shp [N,Dmax,Bt]`` i32 (stochastic only);
        ``dem_row [R,P,Bt]``; ``t = te + 1`` traced.  Mutates the state
        refs, returns reward [Bt]."""
        slot = t % RING
        reward = jnp.zeros((Bt,), f32)

        # phase 1+2: arrivals + stock-capacity penalty
        stock = stock_ref[...] + ring_ref[slot]
        ring_ref[slot] = jnp.zeros((N, P, Bt), f32)
        if any_finite_cap:
            excess = jnp.maximum(stock - C["stock_cap"][:, :, None], 0.0)
            excess = jnp.where(C["stock_cap_fin"][:, :, None] > 0, excess,
                               0.0)
            reward = reward - cc.c_stock_pen * excess.sum(axis=(0, 1))
            stock = jnp.minimum(stock, C["stock_cap"][:, :, None])

        # phase 3: supply
        sup_amt = a_sup * C["supply_cap"][:, :, None]
        fired = (C["has_supply"][:, :, None] > 0) & (sup_amt > 0)
        reward = reward - (sup_amt
                           * C["supply_cost"][:, :, None]).sum(axis=(0, 1))
        amt_f = jnp.where(fired, sup_amt, 0.0)
        if stochastic:
            for L in range(1, Lmax + 1):
                s = (t + L) % RING
                ring_ref[s] = ring_ref[s] + jnp.where(lt_sup == L, amt_f,
                                                      0.0)
        else:
            s = (t + Lavg) % RING
            ring_ref[s] = ring_ref[s] + amt_f

        # phase 4: ship, per degree group
        upd = {}                      # (L, dst) -> [P, Bt] delivery sums

        def push(L, dst, amt):
            key = (L, dst)
            upd[key] = upd.get(key, 0) + amt

        seg_new = {}
        for n0, n1, D in groups:
            nG = n1 - n0
            v = a_shp[n0:n1, :, :D]
            s_g = stock[n0:n1]
            amounts_all = _sorted_cut(v, s_g, D)
            if masked_pad:
                amounts_all = jnp.where(
                    C["edge_mask"][n0:n1][:, None, :, None] > 0,
                    amounts_all, 0.0)
            isf = C["is_factory2"][n0:n1] > 0              # [nG,1]
            ratio_g = C["proc_ratio"][n0:n1]               # [nG,P]
            avail_proc = jnp.broadcast_to(C["proc_cap2"][n0:n1], (nG, Bt))
            avail_ship = jnp.broadcast_to(
                jnp.expand_dims(C["ship_cap_edge"][n0:n1, :D], -1), (nG, D, Bt))
            lt_e = lt_shp[n0:n1, :D] if stochastic else None   # [nG,D,Bt]
            new_cols = []
            a2c_cols = []
            for p in range(P):
                avail_mat = s_g[:, p]
                amounts = amounts_all[:, p]                    # [nG,D,Bt]
                exc_proc = jnp.zeros((nG, Bt), f32)
                if bool(is_factory[n0:n1].any()):
                    clipped = []
                    for i in range(D):
                        ai = amounts[:, i]
                        gate = isf & (ai > 0)
                        over = gate & (ai > avail_proc)
                        exc_proc = exc_proc + jnp.where(
                            over, ai - avail_proc, 0.0)
                        ai2 = jnp.where(over, avail_proc, ai)
                        avail_proc = avail_proc - jnp.where(gate, ai2, 0.0)
                        clipped.append(ai2)
                    amounts = jnp.stack(clipped, axis=1)
                    to_ship = jnp.where(
                        isf[:, :, None],
                        amounts / ratio_g[:, p].reshape(nG, 1, 1), amounts)
                else:
                    to_ship = amounts
                a2 = to_ship
                gate2 = (a2 > 0) & (a2 > avail_ship)
                exc_ship = jnp.where(gate2, a2 - avail_ship, 0.0)
                a2c = jnp.where(gate2, avail_ship, a2)
                raw = jnp.where(
                    gate2,
                    jnp.where(isf[:, :, None],
                              a2c * ratio_g[:, p].reshape(nG, 1, 1), a2c),
                    amounts)
                avail_ship = avail_ship - jnp.where(gate2, raw, 0.0)
                leaving = raw.sum(axis=1)                      # [nG,Bt]
                new_cols.append(avail_mat - leaving)
                a2c_cols.append(a2c)
                reward = reward - (
                    jnp.where(isf, leaving * jnp.expand_dims(
                        C["proc_cost"][n0:n1, p], -1), 0.0).sum(0)
                    + cc.c_proc_pen * exc_proc.sum(0)
                    + cc.c_ship_pen * exc_ship.sum(axis=(0, 1))
                    + (a2c * jnp.expand_dims(C["ship_cost"][n0:n1, p, :D], -1)
                       ).sum(axis=(0, 1)))
            seg_new[n0] = jnp.stack(new_cols, axis=1)          # [nG,P,Bt]
            a2c_all = jnp.stack(a2c_cols, axis=1)              # [nG,P,D,Bt]
            # deliveries: per-edge pushes in edge order
            for ni in range(nG):
                for d in range(D):
                    if masked_pad and not edge_mask[n0 + ni, d]:
                        continue
                    ec = a2c_all[ni, :, d]                     # [P,Bt]
                    dst = int(edge_dst[n0 + ni, d])
                    if stochastic:
                        lt_nd = lt_e[ni, d]                    # [Bt]
                        for L in range(1, Lmax + 1):
                            push(L, dst, jnp.where(
                                (ec > 0) & (lt_nd == L)[None], ec, 0.0))
                    else:
                        push(Lavg, dst, jnp.where(ec > 0, ec, 0.0))

        # reassemble stock (groups + untouched gaps, node order)
        parts, n = [], 0
        for n0, n1, _D in groups:
            if n < n0:
                parts.append(stock[n:n0])
            parts.append(seg_new[n0])
            n = n1
        if n < N:
            parts.append(stock[n:])
        stock = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

        # scatter pipeline pushes: one ring add per (L, dst)
        by_L = {}
        for (L, dst), amt in upd.items():
            by_L.setdefault(L, {})[dst] = amt
        for L, dsts in sorted(by_L.items()):
            add = jnp.stack([dsts.get(dst, jnp.zeros((P, Bt), f32))
                             for dst in range(N)])
            s = (t + L) % RING
            ring_ref[s] = ring_ref[s] + add

        # phase 5: retailer demand
        if ret_contig:
            r_stock = stock[r0:r0 + R]
            ful = jnp.minimum(r_stock, dem_row)
            rparts = ([stock[:r0]] if r0 > 0 else []) + [r_stock - ful] + \
                ([stock[r0 + R:]] if r0 + R < N else [])
            stock = (jnp.concatenate(rparts, axis=0) if len(rparts) > 1
                     else rparts[0])
        else:
            rows = [stock[int(i)] for i in ret_idx]
            ful = jnp.minimum(jnp.stack(rows), dem_row)
            ri = {int(v): j for j, v in enumerate(ret_idx)}
            stock = jnp.stack([stock[nn] - ful[ri[nn]] if nn in ri
                               else stock[nn] for nn in range(N)])
        reward = reward - cc.c_unmet * (dem_row - ful).sum(axis=(0, 1))

        # phase 6: holding costs + writeback
        reward = reward - (stock * C["stock_cost"][:, :, None]).sum(
            axis=(0, 1))
        stock_ref[...] = stock
        return reward

    def _episode_init(C, stock_ref, ring_ref):
        stock_ref[...] = jnp.broadcast_to(C["init_stock"][:, :, None],
                                          (N, P, Bt))
        ring_ref[...] = jnp.broadcast_to(C["ring0"][..., None],
                                         (RING, N, P, Bt))

    def _obs(C, stock_ref, ring_ref, dem_row, t, te):
        """Observation [O, Bt] (mirrors core/step.py obs_fn)."""
        dem_obs = ((dem_row - C["dem_min"].reshape(1, P, 1))
                   / C["dem_range"].reshape(1, P, 1)).reshape(R * P, Bt)
        stock = stock_ref[...]
        stock_obs = stock / C["stock_cap"][:, :, None]
        ms_ok = C["ms_ok"][:, :, None] > 0
        ms_safe = C["ms_safe"][:, :, None]
        buckets = []
        for j in range(Lavg - 1):
            pj = ring_ref[(t + j) % RING]
            buckets.append(jnp.where(ms_ok, pj / ms_safe, 0.0))
        tail = jnp.zeros((N, P, Bt), f32)
        for j in range(Lavg - 1, RING - 1):
            tail = tail + ring_ref[(t + j) % RING]
        buckets.append(jnp.where(
            ms_ok, tail / (ms_safe * (Lmax - (Lavg - 1))), 0.0))
        transit = jnp.stack(buckets, axis=2)                 # [N,P,Lavg,Bt]
        node_obs = jnp.concatenate(
            [stock_obs, transit.reshape(N, P * Lavg, Bt)],
            axis=1).reshape(N * P * (1 + Lavg), Bt)
        remaining = jnp.broadcast_to((T - te).astype(f32) / T, (1, Bt))
        obs = jnp.concatenate([dem_obs, node_obs, remaining], axis=0)
        return jnp.clip(2.0 * obs - 1.0, -1.0, 1.0)

    # ------------------------------------------------------------------
    # in-kernel PRNG draws ('random' mode)
    # ------------------------------------------------------------------
    def _lt_from_u(u):
        lt = jnp.ones(u.shape, i32)
        for j in range(lt_cdf.shape[0]):
            lt = lt + (u >= float(lt_cdf[j])).astype(i32)
        return lt

    def _draw_random(C, te):
        a_sup = jnp.where(C["has_supply"][:, :, None] > 0,
                          _uniform_01((N, P, Bt)), 0.0)
        a_shp = jnp.where(C["ship_mask"][..., None] > 0,
                          _uniform_01((N, P, Dmax, Bt)), 0.0)
        lt_sup = lt_shp = None
        if stochastic:
            # the reference consumes a distinct iid column per use within a
            # step, so direct per-use draws are distribution-identical
            lt_sup = _lt_from_u(_uniform_01((N, P, Bt)))
            lt_shp = _lt_from_u(_uniform_01((N, Dmax, Bt)))
        u = _uniform_01((R, P, Bt))
        u2 = _uniform_01((R, P, Bt)) if any_normal else None
        cols = []
        for p in range(P):
            cfg = cc.demand[p if cc.demand_by_product else 0]
            cols.append(_demand_from_u(
                u[:, p], None if u2 is None else u2[:, p], cfg, te, T))
        dem_row = jnp.stack(cols, axis=1)                    # [R,P,Bt]
        return a_sup, a_shp, lt_sup, lt_shp, dem_row

    # ------------------------------------------------------------------
    # kernel + pallas_call builders
    # ------------------------------------------------------------------
    def _kernel(*refs, mode: str):
        i = 0
        if mode == "random":
            seed_ref = refs[i]; i += 1
        else:
            dem_ref = refs[i]; sup_ref = refs[i + 1]; shp_ref = refs[i + 2]
            i += 3
            if stochastic:
                ltsup_ref = refs[i]; ltshp_ref = refs[i + 1]; i += 2
        C = {name: refs[i + j][...] for j, name in enumerate(CNAMES)}
        i += len(CNAMES)
        obs_ref, reward_ref, stock_ref, ring_ref = refs[i:i + 4]

        bi = pl.program_id(0)
        si = pl.program_id(1)
        te = si % T
        t = te + 1

        @pl.when(te == 0)
        def _init():
            _episode_init(C, stock_ref, ring_ref)

        if mode == "random":
            # one combined per-(tile, step) stream id (the hardware seed
            # primitive takes at most 2 values)
            pltpu.prng_seed(seed_ref[0], bi * (1 << 20) + si)
            a_sup, a_shp, lt_sup, lt_shp, dem_row = _draw_random(C, te)
        else:
            dem_row = dem_ref[0]
            a_sup = sup_ref[0]
            a_shp = shp_ref[0]
            lt_sup = ltsup_ref[0] if stochastic else None
            lt_shp = ltshp_ref[0] if stochastic else None

        obs_ref[0] = _obs(C, stock_ref, ring_ref, dem_row, t, te)
        reward_ref[0, 0] = _phases(C, stock_ref, ring_ref, a_sup, a_shp,
                                   lt_sup, lt_shp, dem_row, t)

    def _build(mode, episodes):
        S = episodes * T
        kernel = functools.partial(_kernel, mode=mode)
        if mode == "random":
            in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        else:
            in_specs = [
                pl.BlockSpec((1, R, P, Bt), lambda b, s: (s, 0, 0, b)),
                pl.BlockSpec((1, N, P, Bt), lambda b, s: (s, 0, 0, b)),
                pl.BlockSpec((1, N, P, Dmax, Bt),
                             lambda b, s: (s, 0, 0, 0, b)),
            ]
            if stochastic:
                in_specs += [
                    pl.BlockSpec((1, N, P, Bt), lambda b, s: (s, 0, 0, b)),
                    pl.BlockSpec((1, N, Dmax, Bt),
                                 lambda b, s: (s, 0, 0, b)),
                ]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)
                     for _ in CNAMES]
        params = (None if interpret else
                  pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024))
        return pl.pallas_call(
            kernel,
            grid=(nB, S),
            out_shape=[jax.ShapeDtypeStruct((S, O, B), f32),
                       jax.ShapeDtypeStruct((S, 1, B), f32)],
            in_specs=in_specs,
            out_specs=[pl.BlockSpec((1, O, Bt), lambda b, s: (s, 0, b)),
                       pl.BlockSpec((1, 1, Bt), lambda b, s: (s, 0, b))],
            scratch_shapes=[
                pltpu.VMEM((N, P, Bt), f32),
                pltpu.VMEM((RING, N, P, Bt), f32),
            ],
            compiler_params=params,
            interpret=interpret,
        )

    def _pregather(actions, leadtimes):
        """Scan-engine tables -> the kernel's pre-gathered action/lead-time
        tables (the action-indexed selects of core/step.py, vectorized over
        the S step rows).  Runs in XLA outside the kernel."""
        a = (jnp.asarray(actions, f32) + 1.0) * 0.5          # [S,A,B]
        sup_act_idx = np.maximum(cc.sup_act_idx, 0)
        ship_act_idx = np.maximum(cc.ship_act_idx, 0)
        a_sup = jnp.where(has_supply[None, :, :, None],
                          jnp.take(a, sup_act_idx, axis=1), 0.0)
        a_shp = jnp.where(
            (has_ship[:, :, None] & edge_mask[:, None, :])[None, ..., None],
            jnp.take(a, ship_act_idx, axis=1), 0.0)
        if not stochastic:
            return a_sup, a_shp, None, None
        lt = jnp.asarray(leadtimes, i32)                     # [S,K,B]
        Sn, Bn = lt.shape[0], lt.shape[-1]
        lt_base = np.asarray(cc.lt_base, np.int64)
        sup_amt = a_sup * supply_cap[None, :, :, None]
        fired = has_supply[None, :, :, None] & (sup_amt > 0)
        rank = jnp.cumsum(fired, axis=2) - fired.astype(i32)
        lt_sup = jnp.zeros(rank.shape, i32)
        for r in range(P):
            row = lt[:, np.clip(lt_base + r, 0, K - 1)]      # [S,N,B]
            lt_sup = jnp.where(rank == r, row[:, :, None], lt_sup)
        n_fired = fired.sum(axis=2).astype(i32)              # [S,N,B]
        lt_shp = jnp.zeros((Sn, N, Dmax, Bn), i32)
        di = np.arange(Dmax)
        for m in range(P + 1):
            idx = np.clip(lt_base[:, None] + m + di, 0, K - 1)
            lt_shp = jnp.where(n_fired[:, :, None] == m, lt[:, idx], lt_shp)
        return a_sup, a_shp, lt_sup, lt_shp

    def build(mode, episodes):
        call = _build(mode, episodes)
        cvals = [jnp.asarray(CONSTS[n]) for n in CNAMES]

        def _squeeze(outs):
            obs, rew = outs
            return obs, rew.squeeze(1)

        if mode == "random":
            @jax.jit
            def run(seed):
                return _squeeze(call(jnp.asarray(seed, i32).reshape(1),
                                     *cvals))
        elif stochastic:
            @jax.jit
            def run(demands, leadtimes, actions):
                a_sup, a_shp, lt_sup, lt_shp = _pregather(actions, leadtimes)
                return _squeeze(call(jnp.asarray(demands, f32), a_sup,
                                     a_shp, lt_sup, lt_shp, *cvals))
        else:
            @jax.jit
            def run(demands, actions):
                a_sup, a_shp, _, _ = _pregather(actions, None)
                return _squeeze(call(jnp.asarray(demands, f32), a_sup,
                                     a_shp, *cvals))
        return run

    return build


def make_supplychain_dense_collect_pallas(cc: CompiledChain, T: int, B: int,
                                          mode: str = "random",
                                          episodes: int = 1,
                                          lane_tile: int = 512,
                                          interpret: bool = False):
    """Dense trajectory-collection kernel for large topologies (module
    docstring above).

    * ``'random'``: ``run(seed) -> (obs [S,O,B], rewards [S,B])``
    * ``'actions'``: ``run(demands [S,R,P,B], [leadtimes [S,K,B],]
      actions [S,A,B]) -> (obs, rewards)`` — grid step t reads table row t
    where ``S = episodes * T``.
    """
    if mode not in ("random", "actions"):
        raise ValueError(f"unknown dense collect mode {mode!r}")
    if T != cc.T:
        # episodes are cc.T long by construction; a mismatched T skews the
        # remaining-time obs feature (normalized by the episode length)
        # while leaving rewards identical — exactly the silent parity trap
        # the r4 large-topology harness fell into
        raise ValueError(f"T={T} must equal the chain horizon cc.T={cc.T}")
    return _make_dense(cc, T, B, lane_tile, interpret)(mode, episodes)
