"""Host-side (NumPy ``RandomState``) episode-table generation — parity mode.

The reference precomputes whole-episode demand and lead-time tables at every
``reset`` from a single MT19937 stream per env (reference
supplychain_env.py:564, :641-672; demands_generator.py:3-89).  MT19937
``randint``/``normal``/``poisson`` streams cannot be reproduced with on-device
Threefry, so parity mode generates the tables host-side with the exact same
draw order and uploads them; fast mode (rng/device.py) uses ``jax.random``
on-device streams instead (documented as not bit-compatible).

The demand processes themselves are vectorized NumPy (the reference's
sinusoidal path is a Python double loop, demands_generator.py:78-84, but the
perturbation draw happens first in one call, so the stream is unaffected).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..core.compile import CompiledChain, DemandConfig

__all__ = ["generate_demand", "HostEpisodeRNG"]


def uniform_data(rs: np.random.RandomState, shape, minv, maxv):
    """Uniform integer demand in [minv, maxv] (demands_generator.py:33-36)."""
    return rs.randint(low=minv, high=maxv + 1, size=shape)


def normal_data(rs: np.random.RandomState, shape, minv, maxv, std):
    """Normal demand around the range midpoint (demands_generator.py:38-49)."""
    data = rs.normal((maxv + minv) / 2, std, size=shape)
    np.clip(data, minv, maxv, out=data)
    return np.rint(data).astype(int)


def senoidal_data(rs: np.random.RandomState, horizon, shape, minv, maxv, std,
                  num_peaks, minavg, maxavg, perturb_norm):
    """Seasonal sinusoidal demand with perturbation (demands_generator.py:51-89).

    Stream parity: the perturbation is drawn in a single call of shape
    ``shape`` before any deterministic math, exactly as upstream.
    """
    half_curve = (maxavg - minavg) / 2
    sin_arg = num_peaks * 2 * np.pi / horizon
    if perturb_norm:
        perturb = rs.normal(0, std, size=shape)
    else:
        perturb = rs.randint(low=-3 * std, high=3 * std + 1, size=shape)
    periods = np.arange(shape[0])
    base = minavg + half_curve * (1 + np.sin(sin_arg * periods))
    base = base.reshape((shape[0],) + (1,) * (len(shape) - 1))
    data = np.clip(base + perturb, minv, maxv)
    return np.rint(data).astype(int)


def generate_demand(rs: np.random.RandomState, shape, horizon: int,
                    cfg: DemandConfig):
    """Dispatch mirroring ``generate_demand`` (demands_generator.py:3-31)."""
    if cfg.sen_peaks is None:
        if cfg.std is None:
            return uniform_data(rs, shape, cfg.minv, cfg.maxv)
        return normal_data(rs, shape, cfg.minv, cfg.maxv, cfg.std)
    std = 0 if cfg.std is None else cfg.std
    return senoidal_data(rs, horizon, shape, cfg.minv, cfg.maxv, std,
                         cfg.sen_peaks, cfg.minavg, cfg.maxavg, cfg.perturb_norm)


class HostEpisodeRNG:
    """One MT19937 stream per env; consecutive episodes continue the stream.

    Draw order per reset mirrors the reference exactly: demand table(s) first
    (one draw of shape (T+1, R, P), or P sequential draws of (T+1, R) in
    by-product mode, supplychain_env.py:641-661), then the Poisson lead-time
    table ``clip(1 + poisson(avg-1), 1, max)`` of shape (T, K) when lead-times
    are stochastic (:664-672).
    """

    def __init__(self, cc: CompiledChain, seed: Optional[int] = None):
        self.cc = cc
        self.seed(seed)

    def seed(self, seed: Optional[int] = None):
        self._rs = np.random.RandomState(seed)

    def episode_tables(self) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Returns (demands [T+1, R, P] int, leadtimes [T, K] int or None)."""
        cc = self.cc
        if not cc.demand_by_product:
            demands = generate_demand(
                self._rs, (cc.T + 1, cc.R, cc.P), cc.T, cc.demand[0])
        else:
            per_prod = [generate_demand(self._rs, (cc.T + 1, cc.R), cc.T,
                                        cc.demand[p]) for p in range(cc.P)]
            demands = np.stack(per_prod, axis=-1)
        leadtimes = None
        if cc.stochastic_leadtimes:
            leadtimes = 1 + self._rs.poisson(lam=cc.Lavg - 1, size=(cc.T, cc.K))
            leadtimes = np.clip(leadtimes, 1, cc.Lmax)
        return demands, leadtimes

    def batch_tables(self, B: int):
        """Stack B consecutive episodes' tables along a trailing batch axis.

        (Used for batched parity runs; each batch lane consumes the stream in
        sequence, i.e. lane b plays what episode b of a single reference env
        would see.)
        """
        ds, ls = [], []
        for _ in range(B):
            d, l = self.episode_tables()
            ds.append(d)
            ls.append(l)
        demands = np.stack(ds, axis=-1)
        leadtimes = np.stack(ls, axis=-1) if ls[0] is not None else None
        return demands, leadtimes
