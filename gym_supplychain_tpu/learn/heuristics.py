"""Scripted base-stock baselines for the supply-chain family.

The reference ships no policies at all (it was consumed by external
stable-baselines loops, reference supplychain_env.py:794-795); a scripted
order-up-to ("base-stock") policy is the standard OR baseline for this class
of problem and is what the PPO learner has to beat to demonstrate learning
quality (round-1 VERDICT item 4).

The policy observes the true device state (stock + in-transit pipeline) —
a strictly STRONGER oracle than the learned policy's normalized observation
vector — and acts as follows, per node and product:

* supply nodes order up to a target inventory position:
  ``order = clip(target - (stock + in_transit), 0, supply_cap)``;
* every node with destinations ships each destination the amount that would
  restore the DESTINATION's inventory position to its target (factories
  ship raw material scaled by their processing ratio), scaled down
  proportionally when the requests exceed the node's stock.

Desired per-destination fractions are encoded into the env's sorted-cut
action convention (SURVEY.md §2.1-2) as cumulative sums over the destination
axis: sorted consecutive differences then reproduce exactly the requested
fractions, and the max value equals the total shipped fraction.

Targets default to ``z * mean_demand * reachable_retailers * (Lavg + 1)``
(times the processing ratio for factories, whose stock is raw material) —
the classic lead-time-demand rule with a single tunable multiplier ``z``;
``best_base_stock(...)`` grid-searches ``z``.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.compile import CompiledChain
from ..envs.vector import make_vec_env

__all__ = ["mean_demand", "default_base_stock_targets",
           "make_base_stock_policy", "evaluate_state_policy",
           "best_base_stock", "make_beergame_base_stock_policy",
           "beergame_base_stock_runner", "best_beergame_base_stock"]


def mean_demand(cc: CompiledChain) -> np.ndarray:
    """Expected per-retailer per-step demand [P] for each product's process
    (uniform midpoint / normal midpoint / seasonal average base)."""
    out = np.zeros(cc.P)
    for p in range(cc.P):
        cfg = cc.demand[p if cc.demand_by_product else 0]
        if cfg.sen_peaks is None:
            out[p] = (cfg.minv + cfg.maxv) / 2.0
        else:
            out[p] = (cfg.minavg + cfg.maxavg) / 2.0
    return out


def _reachable_retailers(cc: CompiledChain) -> np.ndarray:
    """Number of DISTINCT retailers reachable from each node [N] (how much
    demand a node's inventory ultimately serves).  Set-based: parallel paths
    in a full-bipartite chain must not multiply the count."""
    # reach[n] = bitmask over retailer set; iterate the DAG to a fixed point
    # (nodes_info insertion order is not guaranteed topological)
    ret_bit = {int(r): 1 << i for i, r in enumerate(np.asarray(cc.retailer_idx))}
    reach = np.array([ret_bit.get(n, 0) for n in range(cc.N)], object)
    for _ in range(cc.N):
        nxt = reach.copy()
        for n in range(cc.N):
            if cc.is_retailer[n]:
                continue
            mask = 0
            for d in range(cc.Dmax):
                if cc.edge_mask[n, d]:
                    mask |= reach[cc.edge_dst[n, d]]
            nxt[n] = mask
        if np.array_equal(nxt, reach):
            break
        reach = nxt
    return np.array([bin(m).count("1") for m in reach], np.int64)


def default_base_stock_targets(cc: CompiledChain, z: float = 1.0) -> np.ndarray:
    """Order-up-to targets [N, P]: z * lead-time demand served by the node."""
    md = mean_demand(cc)                                   # [P]
    reach = _reachable_retailers(cc).astype(np.float64)    # [N]
    targets = z * (cc.Lavg + 1) * reach[:, None] * md[None, :]
    # factory stock is raw material: serving one unit of product consumes
    # processing_ratio units of stock
    targets = np.where(cc.is_factory[:, None], targets * cc.proc_ratio, targets)
    # never target past the stock capacity (overflow is discarded AND
    # penalized at exceeded_stock_capacity_cost per unit)
    return np.minimum(targets, np.asarray(cc.stock_cap))


def make_base_stock_policy(cc: CompiledChain, targets,
                           dtype=jnp.float32) -> Callable:
    """Returns ``policy(env_state) -> action [A, B]`` in [-1, 1].

    ``targets [N, P]`` may be a NumPy constant or a traced array (the z
    grid search sweeps targets through ONE compiled rollout)."""
    supply_cap = np.asarray(cc.supply_cap)
    safe_sup = np.where(supply_cap > 0, supply_cap, 1.0)
    proc_ratio = np.asarray(cc.proc_ratio)
    sup_rows, sup_prods = np.nonzero(np.asarray(cc.has_supply))
    sup_idx = cc.sup_act_idx[sup_rows, sup_prods]
    has_ship = np.asarray(cc.has_ship) & (~cc.is_retailer[:, None])
    shp_n, shp_p, shp_d = np.nonzero(has_ship[:, :, None]
                                     & cc.edge_mask[:, None, :])
    shp_idx = cc.ship_act_idx[shp_n, shp_p, shp_d]

    def policy(env_state) -> jnp.ndarray:
        stock = env_state.stock                       # [N,P,B]
        B = stock.shape[-1]
        ip = stock + env_state.pipe.sum(axis=0)       # inventory position
        tgt = jnp.asarray(targets).astype(stock.dtype)[:, :, None]

        # --- supply: order up to target, as a fraction of supply capacity
        order = jnp.clip(tgt - ip, 0.0, supply_cap[:, :, None])
        v_sup = order / safe_sup[:, :, None]          # [N,P,B] in [0,1]

        # --- ship: requested replenishment of each destination, in THIS
        # node's stock units (factories: raw = product * ratio)
        deficit = jnp.maximum(tgt - ip, 0.0)          # [N,P,B]
        want = deficit[cc.edge_dst]                   # [N,Dmax,P,B]
        want = jnp.where(cc.edge_mask[:, :, None, None], want, 0.0)
        want = jnp.transpose(want, (0, 2, 1, 3))      # [N,P,Dmax,B]
        want = want * proc_ratio[:, :, None, None]    # raw units at factories
        total = want.sum(axis=2, keepdims=True)       # [N,P,1,B]
        avail = jnp.maximum(stock[:, :, None, :], 0.0)
        scale = jnp.where(total > avail, avail / jnp.where(total > 0, total, 1.0),
                          1.0)
        frac = jnp.where(avail > 0, want * scale / jnp.where(avail > 0, avail, 1.0),
                         0.0)                          # [N,P,Dmax,B]
        # encode fractions into the sorted-cut convention: cumulative sums
        # over destinations; consecutive sorted diffs == frac, max == total
        v_shp = jnp.clip(jnp.cumsum(frac, axis=2), 0.0, 1.0)

        a = jnp.zeros((cc.A, B), stock.dtype)
        # explicit casts: under x64 the NumPy float64 capacity constants
        # promote v_sup/v_shp to f64, and a f64->f32 scatter is a
        # FutureWarning today and an error on future JAX
        a = a.at[sup_idx].set(v_sup[sup_rows, sup_prods].astype(a.dtype))
        a = a.at[shp_idx].set(v_shp[shp_n, shp_p, shp_d].astype(a.dtype))
        return (2.0 * a - 1.0).astype(dtype)

    return policy


def _base_stock_runner(cc: CompiledChain, batch_size: int, episodes: int,
                       dtype):
    """One jitted ``run(targets, key) -> mean episodic return`` shared by
    every point of the z grid (targets are traced, so the rollout compiles
    once)."""
    B = batch_size
    env_init, env_step, env_obs = make_vec_env(cc, B, dtype)

    def run(targets, key):
        policy = make_base_stock_policy(cc, targets, dtype)

        def body(env_state, _):
            a = policy(env_state.env)
            env_state, out = env_step(env_state, a)
            return env_state, out.reward

        st = env_init(key)
        _, rewards = jax.lax.scan(body, st, None, length=cc.T * episodes)
        per_env = rewards.reshape(episodes, cc.T, B).sum(axis=1)
        return per_env.mean()

    return jax.jit(run)


def evaluate_state_policy(cc: CompiledChain, batch_size: int, targets,
                          key, episodes: int = 1, dtype=jnp.float32):
    """Mean per-env episodic return of the base-stock policy with the given
    targets, rolled out under one jitted ``lax.scan`` (same protocol as
    learn/evaluate.py uses for learned policies)."""
    run = _base_stock_runner(cc, batch_size, episodes, dtype)
    return float(run(jnp.asarray(np.asarray(targets, np.float64), dtype), key))


def best_base_stock(cc: CompiledChain, batch_size: int, key,
                    zs: Sequence[float] = (0.5, 1.0, 1.5, 2.0, 3.0),
                    episodes: int = 1, dtype=jnp.float32):
    """Grid-search the base-stock multiplier; returns (best_z, best_return,
    {z: return}).  One compile for the whole grid."""
    run = _base_stock_runner(cc, batch_size, episodes, dtype)
    scores = {}
    for z in zs:
        tgt = jnp.asarray(default_base_stock_targets(cc, z), dtype)
        scores[z] = float(run(tgt, key))
    best_z = max(scores, key=scores.get)
    return best_z, scores[best_z], scores


# ---------------------------------------------------------------------------
# Beer game order-up-to baseline (VERDICT r4 missing-3)
# ---------------------------------------------------------------------------

def make_beergame_base_stock_policy(levels: int, max_order: int,
                                    v2: bool = True):
    """Scripted order-up-to policy over the true ``BeerGameState`` — the
    classic beer-game baseline, observing a strictly stronger oracle than
    the learned policy's ``inventory - backlog`` observation.

    Per level, the inventory position counts everything the level owns or
    is owed: ``IP = inventory - backlog + in-transit shipments + the order
    slip still in the mail (orders_placed) + the upstream level's backlog
    owed to it`` (each level is its upstream's only customer; the factory's
    self-supply pipeline plays the upstream role,
    reference beergame_env.py:111-114).  The order is
    ``clip(target - IP, 0, max_order - 1)``; v0 (orders = incoming +
    action, beergame_env.py:121) subtracts the pass-through incoming
    (known from the oracle state) first, v2 orders verbatim
    (beergame2_env.py:168).

    Returns ``policy(state, targets) -> action [L, B]`` with ``targets``
    scalar or [L] (traced, so a target grid shares one compile).
    """
    L = levels

    def policy(state, targets):
        inv = state.inventory                          # [L, B] itype
        B = inv.shape[-1]
        in_transit = state.shipments.sum(axis=0)       # [L, B]
        owed = jnp.concatenate(
            [state.backlog[1:], jnp.zeros((1, B), inv.dtype)], axis=0)
        ip = (inv - state.backlog + in_transit + state.orders_placed + owed)
        tgt = jnp.broadcast_to(
            jnp.asarray(targets, inv.dtype).reshape(-1, 1), (L, B))
        want = tgt - ip
        if not v2:
            # v0 passes incoming through automatically; the next step's
            # incoming row is state-determined (demand table row
            # state.week, then the downstream orders_placed chain)
            demand_row = jax.lax.dynamic_index_in_dim(
                state.customer_demand, state.week, 0, keepdims=False)
            incoming = jnp.concatenate(
                [demand_row[None, :], state.orders_placed[:-1]], axis=0)
            want = want - incoming
        return jnp.clip(want, 0, max_order - 1).astype(inv.dtype)

    return policy


def beergame_base_stock_runner(batch_size: int, levels: int = 4,
                               weeks: int = 35, max_order: int = 16,
                               customer_demand=None, shipment_delays=2,
                               v2: bool = True, max_stock: int = 100,
                               exceeded_capacity_penalty: int = 100,
                               episodes: int = 4):
    """One jitted ``run(targets, key) -> (mean, std) episodic return`` of
    the order-up-to policy, with fresh stochastic demand/delay tables per
    episode (the reference v2 ranges, beergame2_env.py:41-58) — shared by
    every point of the target grid (targets are traced)."""
    from ..core.beergame import make_beergame_kernels
    from ..envs.vector import _is_range, make_beergame_table_draw

    B, L = batch_size, levels
    dem_range = customer_demand if _is_range(customer_demand) else None
    delay_range = shipment_delays if _is_range(shipment_delays) else None
    demand = delays = None
    if dem_range is None:
        demand = np.asarray(customer_demand if customer_demand is not None
                            else [4] * 4 + [8] * (weeks - 4), np.int32)
        weeks = len(demand)
    if delay_range is None:
        delays = np.full(weeks + 1, shipment_delays, np.int32)
        delays[0] = 2
        max_delay = int(delays.max())
    else:
        max_delay = max(2, int(delay_range[1]))
    draw = make_beergame_table_draw(weeks, dem_range, delay_range,
                                    demand, delays, jnp.int32)
    reset_k, step_k, _ = make_beergame_kernels(
        L, weeks, max_delay, v2=v2, max_stock=max_stock,
        exceeded_capacity_penalty=exceeded_capacity_penalty,
        itype=jnp.int32)
    policy = make_beergame_base_stock_policy(L, max_order, v2=v2)
    inv0 = np.full(L, 12, np.int32)

    def run(targets, key):
        def episode(acc, k):
            dem, dly = draw(k, B)
            st = reset_k(dem, dly, inv0, 4, 4, B)

            def body(st, _):
                st, (_, r, _) = step_k(st, policy(st, targets))
                return st, r

            _, rews = jax.lax.scan(body, st, None, length=weeks)
            return acc, rews.astype(jnp.float32).sum(axis=0)   # [B]

        _, per_env = jax.lax.scan(episode, 0.0,
                                  jax.random.split(key, episodes))
        return per_env.mean(), per_env.std()

    return jax.jit(run)


def best_beergame_base_stock(batch_size: int, key,
                             targets: Sequence[int] = tuple(range(4, 41, 2)),
                             **kwargs):
    """Grid-search the order-up-to target (one shared S for all levels;
    returns (best_S, (mean, std), {S: mean})).  One compile for the grid."""
    run = beergame_base_stock_runner(batch_size, **kwargs)
    scores = {}
    stds = {}
    for s in targets:
        m, sd = run(jnp.int32(s), key)
        scores[s] = float(m)
        stds[s] = float(sd)
    best_s = max(scores, key=scores.get)
    return best_s, (scores[best_s], stds[best_s]), scores
