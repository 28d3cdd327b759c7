"""Statistical pinning of the stateless fast-path RNG (rng/device.py:144-192).

The headline benchmark and the PPO trainer run on ``stateless_step_rows``:
inverse-CDF truncated-Poisson lead-times, ``floor(u*n)`` uniform ints, and
``ndtri`` normals.  These claim *distribution* parity with the host MT19937
generator (stream parity is parity mode's job) — here that claim is asserted
two ways:

1. **Deterministic grid checks**: feed each transform a dense uniform grid
   ``u_i = (i + 0.5)/n`` and compare the implied PMF against the exact
   analytic distribution (clipped-Poisson PMF via the float64 recurrence,
   uniform 1/n, rounded-normal via erf).  A wrong CDF threshold, an
   off-by-one in the clip, or a swapped branch shifts whole probability mass
   and fails at grid resolution (~1e-5), far below any statistical noise.
   The documented ``floor(u*n)`` modulo bias is O(n_outcomes * 2^-24) ~ 1e-6
   for the reference's demand ranges — covered by the tolerances.

2. **Host-empirical checks**: large MT19937 samples of the exact host draw
   (``clip(1 + poisson(lam), 1, lmax)``, ``randint``, rounded/clipped
   ``normal``, the seasonal pipeline at a fixed period) compared to the
   device path's PMF within 6-sigma binomial tolerance.

Matches reference distributions at demands_generator.py:33-89 and
supplychain_env.py:664-672.
"""
import math

import numpy as np
import pytest

from gym_supplychain_tpu.core.compile import DemandConfig
from gym_supplychain_tpu.rng.device import (_demand_from_uniform,
                                            poisson_clip_thresholds,
                                            stateless_step_rows)

N_GRID = 1 << 20
N_HOST = 1_000_000
ATOL_HOST = 3.2e-3          # ~6.4 sigma at p=0.5, n=1e6


def _grid(n=N_GRID):
    return (np.arange(n, dtype=np.float64) + 0.5) / n


def _clipped_poisson_pmf(lam: float, lmax: int) -> np.ndarray:
    """Exact float64 PMF of clip(1 + Poisson(lam), 1, lmax) over {1..lmax}."""
    pmf = np.zeros(lmax, np.float64)
    term = math.exp(-lam)
    for k in range(lmax - 1):           # outcomes 1 .. lmax-1 <- Poisson k
        pmf[k] = term
        term *= lam / (k + 1)
    pmf[lmax - 1] = 1.0 - pmf[:lmax - 1].sum()
    return pmf


def _leadtime_from_thresholds(u: np.ndarray, cdf: np.ndarray) -> np.ndarray:
    """The device sampling rule: 1 + sum_j(u >= cdf[j])."""
    lt = np.ones(u.shape, np.int64)
    for j in range(cdf.shape[0]):
        lt += (u >= cdf[j])
    return lt


def _pmf(values: np.ndarray, lo: int, hi: int) -> np.ndarray:
    counts = np.bincount(np.asarray(values, np.int64).ravel() - lo,
                         minlength=hi - lo + 1)
    return counts / counts.sum()


@pytest.mark.parametrize("lam,lmax", [(1.0, 4), (1.0, 2), (0.5, 3),
                                      (2.0, 6), (3.0, 5)])
def test_poisson_thresholds_exact_pmf(lam, lmax):
    """Grid-implied PMF of the threshold sampler == exact clipped-Poisson
    PMF, and == host MT19937 empirical PMF."""
    cdf = poisson_clip_thresholds(lam, lmax)
    assert cdf.shape == (max(lmax - 1, 0),)
    implied = _pmf(_leadtime_from_thresholds(_grid(), cdf), 1, lmax)
    exact = _clipped_poisson_pmf(lam, lmax)
    # float32 threshold quantization + grid resolution only
    np.testing.assert_allclose(implied, exact, atol=5e-6)

    rs = np.random.RandomState(0)
    host = np.clip(1 + rs.poisson(lam=lam, size=N_HOST), 1, lmax)
    np.testing.assert_allclose(implied, _pmf(host, 1, lmax), atol=ATOL_HOST)


def test_uniform_int_demand_exact():
    """floor(u*n)+lo over the grid is uniform on [minv, maxv] (reference
    randint, demands_generator.py:33-36) and matches host randint."""
    cfg = DemandConfig(minv=10, maxv=20, std=None, sen_peaks=None,
                       minavg=None, maxavg=None, perturb_norm=True)
    d = np.asarray(_demand_from_uniform(_grid(), cfg, 0, 360, np.float64))
    assert d.min() == 10 and d.max() == 20
    implied = _pmf(d, 10, 20)
    np.testing.assert_allclose(implied, np.full(11, 1 / 11), atol=2e-5)

    rs = np.random.RandomState(1)
    host = rs.randint(10, 21, size=N_HOST)
    np.testing.assert_allclose(implied, _pmf(host, 10, 20), atol=ATOL_HOST)


def test_normal_demand_exact():
    """ndtri path: rint(clip(normal(mid, std))) PMF == erf-integrated normal
    mass per integer bin (reference normal_data, demands_generator.py:38-49)."""
    cfg = DemandConfig(minv=0, maxv=40, std=6.0, sen_peaks=None,
                       minavg=None, maxavg=None, perturb_norm=True)
    d = np.asarray(_demand_from_uniform(_grid(), cfg, 0, 360, np.float64))
    implied = _pmf(d, 0, 40)

    mid, std = 20.0, 6.0
    cdf = lambda x: 0.5 * (1 + math.erf((x - mid) / (std * math.sqrt(2))))
    exact = np.zeros(41)
    for k in range(41):
        lo = -np.inf if k == 0 else k - 0.5   # clip folds the tail inward
        hi = np.inf if k == 40 else k + 0.5
        exact[k] = (1.0 if hi is np.inf else cdf(hi)) - \
                   (0.0 if lo == -np.inf else cdf(lo))
    np.testing.assert_allclose(implied, exact, atol=5e-5)

    rs = np.random.RandomState(2)
    host = np.rint(np.clip(rs.normal(mid, std, size=N_HOST), 0, 40))
    np.testing.assert_allclose(implied, _pmf(host, 0, 40), atol=ATOL_HOST)


@pytest.mark.parametrize("perturb_norm", [True, False])
def test_seasonal_demand_matches_host(perturb_norm):
    """Seasonal base + perturbation at a fixed period t: device grid PMF ==
    host MT19937 empirical PMF (reference senoidal_data,
    demands_generator.py:51-89).  Exercises both perturbation branches."""
    cfg = DemandConfig(minv=0, maxv=400, std=10, sen_peaks=4,
                       minavg=150, maxavg=250, perturb_norm=perturb_norm)
    T, t = 360, 37
    d = np.asarray(_demand_from_uniform(_grid(), cfg, t, T, np.float64))
    lo, hi = int(d.min()), int(d.max())
    implied = _pmf(d, lo, hi)

    rs = np.random.RandomState(3)
    if perturb_norm:
        perturb = rs.normal(0, 10, size=N_HOST)
    else:
        perturb = rs.randint(-30, 31, size=N_HOST)
    base = 150 + 50 * (1 + math.sin(4 * 2 * math.pi * t / T))
    host = np.rint(np.clip(base + perturb, 0, 400))
    assert host.min() >= lo and host.max() <= hi
    np.testing.assert_allclose(implied, _pmf(host, lo, hi), atol=ATOL_HOST)


def test_stateless_step_rows_end_to_end():
    """The fused per-step draw (the exact function the benchmark and trainer
    call): lead-time PMF matches the host Poisson table generator and the
    demand PMF matches host randint, on the N-to-M flagship config."""
    import jax

    from gym_supplychain_tpu.envs.presets import SupplyChainNtoMEnv

    cc = SupplyChainNtoMEnv(total_time_steps=360).cc
    assert cc.stochastic_leadtimes and cc.Lavg == 2 and cc.Lmax == 4

    B, n_keys = 8192, 16
    dems, lts = [], []
    for s in range(n_keys):
        d, lt = stateless_step_rows(jax.random.PRNGKey(s), s * 7 + 1, cc, B)
        dems.append(np.asarray(d))
        lts.append(np.asarray(lt))
    lt_all = np.concatenate(lts, axis=-1)            # [K, n_keys*B]
    dem_all = np.concatenate(dems, axis=-1)

    exact_lt = _clipped_poisson_pmf(cc.Lavg - 1, cc.Lmax)
    got_lt = _pmf(lt_all, 1, cc.Lmax)
    n = lt_all.size
    np.testing.assert_allclose(got_lt, exact_lt, atol=6 * 0.5 / math.sqrt(n))

    rs = np.random.RandomState(4)
    host_dem = rs.randint(10, 21, size=N_HOST)       # ntom demand_range
    got_dem = _pmf(dem_all, 10, 20)
    np.testing.assert_allclose(got_dem, _pmf(host_dem, 10, 20),
                               atol=6 * 0.5 / math.sqrt(dem_all.size)
                               + ATOL_HOST)

    # per-column/lane independence smoke: distinct keys give distinct rows
    assert not np.array_equal(lts[0], lts[1])
    assert not np.array_equal(dems[0], dems[1])
