"""Trajectory parity against COMMITTED reference recordings (no checkout).

Replays the recorded reference episodes (tests/data/*.npz, produced once by
tests/record_fixtures.py from the live reference) through this package's
strict-obs single-env engine and asserts step-by-step observation/reward
parity.  This is the portable version of tests/test_reference_trajectory.py:
it runs everywhere — including this repo's own CI, which has no
/root/reference checkout — the same way the reference commits its RNG-stream
oracles as .npy fixtures (reference
gym_supplychain/envs/tests/test_supplychain_env.py:207-285).

Tolerances mirror the live comparison (test_reference_trajectory.py:32-42):
the engine emulates the reference's first-order float32 action arithmetic,
leaving <= one float32 ulp of residual in obs/rewards while stocks stay
bit-exact.
"""
import os

import numpy as np
import pytest

from .fixture_scenarios import SC_SCENARIOS, beergame_scenarios

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


@pytest.fixture(scope="module")
def sc_fixture():
    return np.load(os.path.join(DATA, "ref_trajectories.npz"))


@pytest.fixture(scope="module")
def bg_fixture():
    return np.load(os.path.join(DATA, "ref_beergame.npz"))


@pytest.mark.parametrize("name", sorted(SC_SCENARIOS))
def test_recorded_supplychain_trajectory(name, sc_fixture):
    spec = SC_SCENARIOS[name]
    _, env = spec["build"](None)
    env.seed(spec["seed"])
    for ep in range(spec["episodes"]):
        actions = sc_fixture[f"{name}/ep{ep}/actions"]
        ref_obs = sc_fixture[f"{name}/ep{ep}/obs"]
        ref_rews = sc_fixture[f"{name}/ep{ep}/rewards"]
        obs = env.reset()
        np.testing.assert_allclose(obs, ref_obs[0], atol=5e-7,
                                   err_msg=f"{name} ep{ep} reset obs")
        total = ref_total = 0.0
        for t in range(actions.shape[0]):
            obs, r, done, _ = env.step(actions[t])
            np.testing.assert_allclose(
                obs, ref_obs[t + 1], atol=5e-7,
                err_msg=f"{name} ep{ep} obs at t={t + 1}")
            assert np.allclose(r, ref_rews[t], rtol=1e-6, atol=1e-2), \
                (name, ep, t + 1, r, ref_rews[t])
            total += r
            ref_total += ref_rews[t]
        assert done
        assert np.allclose(total, ref_total), (name, ep, total, ref_total)


@pytest.mark.parametrize("name", sorted(beergame_scenarios()))
def test_recorded_beergame_trajectory(name, bg_fixture):
    import gym_supplychain_tpu.envs.beergame as bg
    spec = beergame_scenarios()[name]
    env = getattr(bg, spec["cls"])(*spec["args"], **spec["kwargs"])
    for ep, actions in enumerate(spec["actions"]):
        obs = env.reset()
        np.testing.assert_array_equal(obs, bg_fixture[f"{name}/ep{ep}/obs"][0],
                                      err_msg=f"{name} ep{ep} reset obs")
        np.testing.assert_array_equal(
            env.customer_demand, bg_fixture[f"{name}/ep{ep}/customer_demand"])
        np.testing.assert_array_equal(
            env.shipment_delays, bg_fixture[f"{name}/ep{ep}/shipment_delays"])
        for t in range(actions.shape[0]):
            obs, r, done, _ = env.step(actions[t])
            np.testing.assert_array_equal(
                obs, bg_fixture[f"{name}/ep{ep}/obs"][t + 1],
                err_msg=f"{name} ep{ep} obs week {t + 1}")
            assert float(r) == bg_fixture[f"{name}/ep{ep}/rewards"][t], \
                (name, ep, t + 1)
        np.testing.assert_array_equal(env.inventory,
                                      bg_fixture[f"{name}/ep{ep}/inventory"])
        np.testing.assert_array_equal(env.backlog,
                                      bg_fixture[f"{name}/ep{ep}/backlog"])
