"""On-device episode-table generation — fast mode.

Generates the same demand processes and Poisson lead-time tables as the host
parity generator (rng/host.py) but with ``jax.random`` Threefry streams, fully
on device and batched over envs.  Streams are NOT bit-compatible with the
reference's MT19937 (documented trade-off; parity mode exists for that).
Used by the vectorized env for cheap batched auto-resets inside jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.compile import CompiledChain, DemandConfig

__all__ = ["device_demand_tables", "device_leadtime_tables", "device_episode_tables"]


def _one_demand(key, cfg: DemandConfig, T: int, R: int, B: int, dtype):
    """Demand table [T+1, R, B] for one product config (mirrors
    demands_generator.py:33-89 semantics)."""
    shape = (T + 1, R, B)
    if cfg.sen_peaks is None and cfg.std is None:
        d = jax.random.randint(key, shape, cfg.minv, cfg.maxv + 1)
        return d.astype(dtype)
    if cfg.sen_peaks is None:
        d = jax.random.normal(key, shape) * cfg.std + (cfg.maxv + cfg.minv) / 2
        return jnp.rint(jnp.clip(d, cfg.minv, cfg.maxv)).astype(dtype)
    std = 0.0 if cfg.std is None else cfg.std
    if cfg.perturb_norm:
        perturb = jax.random.normal(key, shape) * std
    else:
        perturb = jax.random.randint(key, shape, int(-3 * std),
                                     int(3 * std) + 1).astype(jnp.float32)
    periods = jnp.arange(T + 1)[:, None, None]
    half = (cfg.maxavg - cfg.minavg) / 2
    base = cfg.minavg + half * (1 + jnp.sin(cfg.sen_peaks * 2 * jnp.pi
                                            * periods / T))
    return jnp.rint(jnp.clip(base + perturb, cfg.minv, cfg.maxv)).astype(dtype)


def device_demand_tables(key, cc: CompiledChain, B: int, dtype=jnp.float32):
    """Demands [T+1, R, P, B] on device."""
    if not cc.demand_by_product:
        keys = [key] * cc.P if cc.P == 1 else list(jax.random.split(key, cc.P))
    else:
        keys = list(jax.random.split(key, cc.P))
    cols = []
    for p in range(cc.P):
        cfg = cc.demand[p if cc.demand_by_product else 0]
        cols.append(_one_demand(keys[p], cfg, cc.T, cc.R, B, dtype))
    return jnp.stack(cols, axis=2)


def device_leadtime_tables(key, cc: CompiledChain, B: int):
    """Poisson lead-times [T, K, B] int32: clip(1 + poisson(avg-1), 1, max)
    (supplychain_env.py:664-672)."""
    lt = 1 + jax.random.poisson(key, cc.Lavg - 1, (cc.T, cc.K, B))
    return jnp.clip(lt, 1, cc.Lmax).astype(jnp.int32)


def device_episode_tables(key, cc: CompiledChain, B: int, dtype=jnp.float32):
    kd, kl = jax.random.split(key)
    demands = device_demand_tables(kd, cc, B, dtype)
    leadtimes = device_leadtime_tables(kl, cc, B) if cc.stochastic_leadtimes else None
    return demands, leadtimes
