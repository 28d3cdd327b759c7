"""Dense Pallas collect kernel parity (VERDICT r2 item 7 — large chains).

The dense kernel (ops/supplychain_pallas_dense.py) mirrors core/step.py's
padded array phases instead of the per-node unrolled body, so its trace
stays small on the 26-40 node NPerStage topologies.  The table-driven
'actions' mode must reproduce the scan engine's (obs, reward) trajectory
step-for-step, including multi-echelon sorted cuts, processing/ship
clipping, stochastic lead-time column consumption, lane tiling, and
in-kernel auto-reset.  Interpret mode on CPU; compiled-TPU parity + timing
live in benchmarks/large_topologies.py.
"""
import jax
import jax.numpy as jnp
import numpy as np

from tests.test_pallas_collect import _scan_traj


def _check_dense(cc, T, B, seed, lane_tile=None, episodes=1):
    from gym_supplychain_tpu.ops.supplychain_pallas_dense import (
        make_supplychain_dense_collect_pallas)

    rs = np.random.RandomState(seed)
    S = episodes * T
    actions = (2 * rs.rand(S, cc.A, B) - 1).astype(np.float32)
    actions[actions < -0.5] = -1.0     # some supplies must NOT fire (§2.1-5)
    demands = rs.randint(0, 25, size=(S + 1, cc.R, cc.P, B)).astype(np.float32)
    lt = None
    if cc.stochastic_leadtimes:
        lt = rs.randint(1, cc.Lmax + 1, size=(S, cc.K, B)).astype(np.int32)

    run = make_supplychain_dense_collect_pallas(
        cc, T, B, mode="actions", episodes=episodes,
        lane_tile=lane_tile or B, interpret=True)
    args = (demands[:S], lt, actions) if lt is not None \
        else (demands[:S], actions)
    pal_obs, pal_rew = [np.asarray(x) for x in run(*args)]
    assert pal_obs.shape == (S, cc.obs_dim, B)

    for e in range(episodes):
        sl = slice(e * T, (e + 1) * T)
        ref_obs, ref_rew = _scan_traj(
            cc, np.concatenate([demands[sl], demands[sl.start:sl.start + 1]]),
            actions[sl], None if lt is None else lt[sl])
        np.testing.assert_allclose(pal_obs[sl], ref_obs, rtol=0, atol=1e-5)
        np.testing.assert_allclose(
            pal_rew[sl], ref_rew, rtol=0, atol=1e-5 * np.abs(ref_rew).max())


def test_dense_nperstage_stochastic():
    """Multi-echelon, mixed out-degrees (the degree-group path)."""
    from gym_supplychain_tpu.envs.presets import SupplyChainNPerStage
    cc = SupplyChainNPerStage(nodes_per_echelon=[3, 2, 2, 3], num_products=1,
                              total_time_steps=10,
                              stochastic_leadtimes=True).cc
    _check_dense(cc, 10, 4, 0)


def test_dense_nperstage_multiproduct_tiled():
    """2 products + lane tiling (B=8 over two 4-lane tiles)."""
    from gym_supplychain_tpu.envs.presets import SupplyChainNPerStage
    cc = SupplyChainNPerStage(nodes_per_echelon=[2, 3, 2, 2], num_products=2,
                              total_time_steps=8,
                              stochastic_leadtimes=True).cc
    _check_dense(cc, 8, 8, 1, lane_tile=4)


def test_dense_2perstage_const_leadtime():
    import gym_supplychain_tpu as sct
    cc = sct.make("supplychain-2perstage-v0", total_time_steps=10,
                  stochastic_leadtimes=False).cc
    _check_dense(cc, 10, 4, 2)


def test_dense_linear_multi_episode():
    """Auto-reset across 2 back-to-back episodes."""
    import gym_supplychain_tpu as sct
    cc = sct.make("supplychain-linear-v0", total_time_steps=6).cc
    _check_dense(cc, 6, 4, 3, episodes=2)


def test_dense_rejects_bad_mode():
    import gym_supplychain_tpu as sct
    from gym_supplychain_tpu.ops.supplychain_pallas_dense import (
        make_supplychain_dense_collect_pallas)
    cc = sct.make("supplychain-linear-v0", total_time_steps=4).cc
    try:
        make_supplychain_dense_collect_pallas(cc, 4, 4, mode="nope")
    except ValueError:
        return
    raise AssertionError("expected ValueError")
