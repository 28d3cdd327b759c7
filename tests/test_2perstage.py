"""Ports of reference test_supplychain_2perstage_env.py: exact per-step
rewards and full observation vectors for the 8-node chain."""
import numpy as np

from gym_supplychain_tpu import (SupplyChain2perStageEnv,
                                 SupplyChain2perStageSeasonalEnv)
from .utils import check_build_info, check_rewards, pipes


def test_initial_stocks():
    env = SupplyChain2perStageEnv()
    env.seed(0)
    env.reset()
    for n in range(8):
        assert env.stock(n).sum() == 0
        assert env.cc.stock_cap[n, 0] == (200 if n % 2 == 0 else 300)
        assert env.cc.stock_cost[n].sum() == 1


def test_chain_dynamics():
    """Reference test_supplychain_2perstage_env.py:29-170 (exact obs vectors
    and the per-step rewards -1015, -3469, -1752, -6400.333, -4479)."""
    env = SupplyChain2perStageEnv(total_time_steps=5, ship_capacity=250,
                                  build_info=True)
    env.seed(0)
    obs = env.reset()
    rewards = 0.0

    assert np.allclose(obs, [0., -1., -1., 0., 0., -1., -0.2, -0.2, -1.,
                             -0.76, -0.76, -1., -0.76, -0.76, -1., -0.92, -0.92, -1.,
                             -0.92, -0.92, -1., -0.92, -0.92, -1., -0.92, -0.92, 1.])
    assert np.allclose(env.customer_demands.flatten(),
                       [15, 10, 13, 13, 17, 19, 13, 15, 12, 14, 17, 16])
    for n in range(4):
        assert pipes(env, n) == {1: 60, 2: 60}
    for n in range(4, 8):
        assert pipes(env, n) == {1: 20, 2: 20}

    supply_action = 2 * np.array([1] + [0] * (env.cc.A - 1)) - 1
    obs, rew, _, info = env.step(supply_action)  # t=1
    rewards += rew
    check_rewards(rewards, info, env.num_products)
    assert np.allclose(obs, [-0.4, -0.4, -0.4, 0., 1.,
                             -0.6, -0.2, -1., -0.4, -0.76,
                             -1., -0.6, -0.76, -1., -0.8,
                             -0.92, -1., -0.86666667, -0.92, -1.,
                             -0.95, -0.92, -1., -0.93333333, -0.92,
                             -1., 0.6])
    assert rew == -1015.0
    assert pipes(env, 0) == {2: 60, 3: 120}
    assert env.stock(0).sum() == 60
    for n in range(1, 4):
        assert pipes(env, n) == {2: 60}
        assert env.stock(n).sum() == 60 if n <= 2 else 20
    for n in range(4, 6):
        assert pipes(env, n) == {2: 20}
        assert env.stock(n).sum() == 20
    for i, n in enumerate(range(6, 8)):
        assert env.stock(n).sum() == 20 - env.customer_demands[0, i]

    send_all = 2 * np.array([0, 1, 1] * 2 + [1] * 8) - 1
    obs, rew, _, info = env.step(send_all)  # t=2
    rewards += rew
    check_rewards(rewards, info, env.num_products)
    assert np.allclose(obs, [0.4, 0.8, -1., 1., -1.,
                             -1., -1., -1., -1., -1.,
                             -0.04, -1., -1., -1., -1.,
                             -1., -0.68, -1., -1., -1.,
                             -0.88, -1., -0.68, -0.88666667, -1.,
                             -1., 0.2])
    assert rew == -3469.0
    assert pipes(env, 0) == {3: 120}
    assert pipes(env, 1) == {}
    assert pipes(env, 2) == {4: 240}
    assert pipes(env, 3) == {}
    assert pipes(env, 4) == {4: 80}
    assert pipes(env, 5) == {}
    assert pipes(env, 6) == {4: 80}
    assert pipes(env, 7) == {}
    for n in range(6):
        assert env.stock(n).sum() == 0
    assert env.stock(6).sum() == 12
    assert env.stock(7).sum() == 17

    send_half = 2 * np.array([0, 0.5, 1] * 2 + [0.5, 1] * 4) - 1
    obs, rew, _, info = env.step(send_half)  # t=3
    rewards += rew
    check_rewards(rewards, info, env.num_products)
    assert np.allclose(obs, [-0.4, 0., -1., -1., -1., -1., -1., -1., -1.,
                             -0.04, -0.76, -1., -1., -0.76, -1., -0.68, -1., -1.,
                             -1., -1., -1., -0.68, -1., -1., -1., -1., -0.2])
    assert rew == -1752.0
    for n in (0, 1, 5, 7):
        assert pipes(env, n) == {}
    assert pipes(env, 2) == {4: 240, 5: 60}
    assert pipes(env, 3) == {5: 60}
    assert pipes(env, 4) == {4: 80}
    assert pipes(env, 6) == {4: 80}
    for n in range(8):
        assert env.stock(n).sum() == 0

    obs, rew, _, info = env.step(send_half)  # t=4
    rewards += rew
    check_rewards(rewards, info, env.num_products)
    assert np.allclose(obs, [-0.6, -0.2, -1., -1., -1., -1., -1., -1., -1.,
                             -0.76, -1., -1., -0.76, -1., -1., -1., -0.86666667, -1.,
                             -1., -0.86666667, -0.33, -1., -0.84, -1., -1., -0.84, -0.6])
    assert np.round(rew, 3) == -6400.333
    for n in range(2):
        assert pipes(env, n) == {}
    for n in range(2, 4):
        assert pipes(env, n) == {5: 60}
    for n in range(4, 6):
        p = pipes(env, n)
        assert list(p) == [6] and np.allclose(p[6], 33.333, atol=1e-3)
    for n in range(6, 8):
        assert pipes(env, n) == {6: 40}
    for n in range(6):
        assert env.stock(n).sum() == 0
    assert env.stock(6).sum() == 67
    assert env.stock(7).sum() == 0

    obs, rew, done, info = env.step(send_half)  # t=5
    rewards += rew
    check_rewards(rewards, info, env.num_products)
    assert np.allclose(obs, [0.4, 0.2, -1., -1., -1., -1., -1., -1., -1.,
                             -1., -1., -1., -1., -1., -1., -0.86666667, -0.92, -1.,
                             -0.86666667, -0.92, -0.45, -0.84, -1., -1., -0.84, -1., -1.])
    assert rew == -4479.0
    assert done
    for n in range(4):
        assert pipes(env, n) == {}
    for n in range(4, 6):
        p = pipes(env, n)
        assert sorted(p) == [6, 7]
        assert np.allclose(p[6], 33.333, atol=1e-3) and p[7] == 20
    for n in range(6):
        assert env.stock(n).sum() == 0
    assert env.stock(6).sum() == 55
    assert env.stock(7).sum() == 0


def test_seasonal_initial_stocks():
    env = SupplyChain2perStageSeasonalEnv()
    env.seed(0)
    env.reset()
    for n in range(8):
        assert env.stock(n).sum() == 800
        assert env.cc.stock_cap[n, 0] == (1600 if n % 2 == 0 else 1800)
        assert env.cc.stock_cost[n, 0] == 1


def test_seasonal_build_info():
    env = SupplyChain2perStageSeasonalEnv(
        stochastic_leadtimes=True, avg_leadtime=2, max_leadtime=4,
        demand_perturb_norm=True, build_info=True, total_time_steps=40)
    check_build_info(env)
