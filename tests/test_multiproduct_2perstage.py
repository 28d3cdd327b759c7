"""Ports of reference test_multiproduct_2perstage.py: fully heterogeneous
per-product dynamics (exact stocks/pipelines/costs/obs) plus the golden
episodic-return regressions under the replicated classic-gym sampler."""
import os

import numpy as np
import pytest

from gym_supplychain_tpu import (
    SupplyChainEnv, SupplyChainMultiProduct,
    SupplyChainMultiProduct_DemConfigByProd,
    SupplyChainMultiProduct_DemConfigByProd_IncCosts,
    SupplyChainMultiProduct_IncreasingCosts)
from .utils import assert_pipes, pipes

FULL = bool(os.environ.get("GST_FULL"))


def _chain():
    """Reference test_multiproduct_2perstage.py:10-54."""
    nodes_info = {}
    nodes_info['Supplier1'] = {'initial_stock': [11, 1], 'stock_capacity': [20, 10], 'stock_cost': [1, 2],
                               'initial_supply': [[1, 4], [2, 3]], 'supply_capacity': [50, 60], 'supply_cost': [10, 11],
                               'destinations': ['Factory1', 'Factory2'], 'dest_costs': [[1, 2], [0, 1]],
                               'ship_capacity': [100, 101]}
    nodes_info['Supplier2'] = {'initial_stock': [12, 2], 'stock_capacity': [21, 11], 'stock_cost': [3, 4],
                               'initial_supply': [[3, 1], [4, 2]], 'supply_capacity': [100, 110], 'supply_cost': [20, 21],
                               'destinations': ['Factory1', 'Factory2'], 'dest_costs': [[3, 4], [2, 3]],
                               'ship_capacity': [102, 103]}
    nodes_info['Factory1'] = {'initial_stock': [13, 3], 'stock_capacity': [22, 12], 'stock_cost': [3, 4],
                              'initial_shipments': [[1, 2], [3, 4]],
                              'processing_capacity': 40, 'processing_cost': [15, 16],
                              'destinations': ['Wholesal1', 'Wholesal2'], 'dest_costs': [[5, 6], [4, 5]],
                              'ship_capacity': [104, 105]}
    nodes_info['Factory2'] = {'initial_stock': [14, 4], 'stock_capacity': [23, 13], 'stock_cost': [1, 2],
                              'initial_shipments': [[4, 3], [2, 1]],
                              'processing_capacity': 30, 'processing_cost': [20, 21],
                              'destinations': ['Wholesal1', 'Wholesal2'], 'dest_costs': [[7, 8], [6, 7]],
                              'ship_capacity': [106, 107]}
    nodes_info['Wholesal1'] = {'initial_stock': [15, 5], 'stock_capacity': [24, 14], 'stock_cost': [5, 6],
                               'initial_shipments': [[5, 6], [7, 8]],
                               'destinations': ['Retailer1', 'Retailer2'], 'dest_costs': [[9, 10], [8, 9]],
                               'ship_capacity': [108, 109]}
    nodes_info['Wholesal2'] = {'initial_stock': [16, 6], 'stock_capacity': [25, 15], 'stock_cost': [6, 5],
                               'initial_shipments': [[8, 7], [6, 5]],
                               'destinations': ['Retailer1', 'Retailer2'], 'dest_costs': [[11, 12], [10, 11]],
                               'ship_capacity': [110, 111]}
    nodes_info['Retailer1'] = {'initial_stock': [17, 7], 'stock_capacity': [26, 16], 'stock_cost': [7, 8],
                               'initial_shipments': [[0, 5], [10, 15]], 'last_level': True}
    nodes_info['Retailer2'] = {'initial_stock': [18, 8], 'stock_capacity': [27, 17], 'stock_cost': [8, 7],
                               'initial_shipments': [[15, 10], [5, 0]], 'last_level': True}
    return nodes_info


def _create_env(total_time_steps=5, build_info=False):
    return SupplyChainEnv(_chain(), num_products=2, unmet_demand_cost=100,
                          exceeded_stock_capacity_cost=101,
                          exceeded_process_capacity_cost=102,
                          exceeded_ship_capacity_cost=103,
                          demand_range=(0, 100), processing_ratio=[2, 3],
                          stochastic_leadtimes=False, avg_leadtime=2,
                          max_leadtime=2, total_time_steps=total_time_steps,
                          build_info=build_info)


def _run_episode(env, seed=0, expected_rewards=None):
    env.seed(seed)
    env.reset()
    done = False
    rewards = 0.0
    while not done:
        _, reward, done, info = env.step(env.action_space.sample())
        rewards += reward
    if expected_rewards:
        assert np.allclose(expected_rewards, rewards)
    return info


def test_basic_dynamics():
    """Reference test_multiproduct_2perstage.py:84-218."""
    env = _create_env(build_info=True)
    env.seed(0)
    env.reset()
    assert np.all(env.customer_demands[:2].flatten()
                  == [44, 47, 64, 67, 67, 9, 83, 21])

    half_action = 2 * np.array(2 * [0.5, 0.5, 0.25, 0.5, 0.25, 0.5]
                               + 4 * [0.25, 0.5, 0.25, 0.5]) - 1
    obs, reward, _, info = env.step(half_action)  # t=1

    assert np.allclose(env.stock(0), [6, 1.5])
    assert np.allclose(env.stock(1), [7.5, 3])
    assert np.allclose(env.stock(2), [7, 3])
    assert np.allclose(env.stock(3), [9, 3])
    assert np.allclose(env.stock(4), [10, 6])
    assert np.allclose(env.stock(5), [12, 6])
    assert np.allclose(env.stock(6), [0, 0])
    assert np.allclose(env.stock(7), [0, 0])

    assert pipes(env, 0, 0) == {2: 4, 3: 25} and pipes(env, 0, 1) == {2: 3, 3: 30}
    assert pipes(env, 1, 0) == {2: 1, 3: 50} and pipes(env, 1, 1) == {2: 2, 3: 55}
    assert pipes(env, 2, 0) == {2: 2, 3: 3.75 + 3} and pipes(env, 2, 1) == {2: 4, 3: 1.5 + 0.75}
    assert pipes(env, 3, 0) == {2: 3, 3: 3.75 + 3} and pipes(env, 3, 1) == {2: 1, 3: 1.5 + 0.75}
    assert pipes(env, 4, 0) == {2: 6, 3: 2.25 + 1.75} and pipes(env, 4, 1) == {2: 8, 3: 1.0}
    assert pipes(env, 5, 0) == {2: 7, 3: 2.25 + 1.75} and pipes(env, 5, 1) == {2: 5, 3: 1.0}
    assert pipes(env, 6, 0) == {2: 5, 3: 11} and pipes(env, 6, 1) == {2: 15, 3: 6}
    assert pipes(env, 7, 0) == {2: 10, 3: 11} and pipes(env, 7, 1) == {3: 6}

    units = info['sc_episode']['units']
    costs = info['sc_episode']['costs']
    assert units['stock'] == [6 + 7.5 + 7 + 9 + 10 + 12, 1.5 + 3 + 3 + 3 + 6 + 6]
    assert costs['stock'] == [6 * 1 + 7.5 * 3 + 7 * 3 + 9 * 1 + 10 * 5 + 12 * 6,
                              1.5 * 2 + 3 * 4 + 3 * 4 + 3 * 2 + 6 * 6 + 6 * 5]
    assert units['stock_pen'] == [6, 1]
    assert costs['stock_pen'] == [101 * 6, 101 * 1]
    assert units['supply'] == [25 + 50, 30 + 55]
    assert costs['supply'] == [25 * 10 + 50 * 20, 30 * 11 + 55 * 21]
    assert units['process'] == [7 + 9, 3 + 3]
    assert costs['process'] == [7 * 15 + 9 * 20, 3 * 16 + 3 * 21]
    assert units['process_pen'] == [0, 0] and costs['process_pen'] == [0, 0]
    assert np.allclose(units['ship'],
                       [3.75 + 3 + 3.75 + 3 + 2.25 + 1.75 + 2.25 + 1.75 + 6 + 5 + 6 + 5,
                        1.5 + 0.75 + 1.5 + 0.75 + 0.5 + 0.5 + 0.5 + 0.5 + 3 + 3 + 3 + 3])
    assert np.allclose(costs['ship'],
                       [3.75 * 3 + 3 * 1 + 3.75 * 4 + 3 * 2 + 2.25 * 7 + 1.75 * 5
                        + 2.25 * 8 + 1.75 * 6 + 6 * 11 + 5 * 9 + 6 * 12 + 5 * 10,
                        1.5 * 2 + 0.75 * 0 + 1.5 * 3 + 0.75 * 1 + 0.5 * 6 + 0.5 * 4
                        + 0.5 * 7 + 0.5 * 5 + 3 * 10 + 3 * 8 + 3 * 11 + 3 * 9])
    assert units['ship_pen'] == [0, 0] and costs['ship_pen'] == [0, 0]
    assert units['unmet_dem'] == [44 - 17 + 64 - (18 + 15 - 6),
                                  47 - (7 + 10 - 1) + 67 - (8 + 5)]
    assert costs['unmet_dem'] == [100 * units['unmet_dem'][0],
                                  100 * units['unmet_dem'][1]]
    total_costs = sum(sum(costs[k]) for k in costs)
    assert reward == -total_costs

    expected_obs = [67 / 100, 9 / 100, 83 / 100, 21 / 100,
                    6 / 20, 1.5 / 10, 4 / 50, 25 / 50, 3 / 60, 30 / 60,
                    7.5 / 21, 3 / 11, 1 / 100, 50 / 100, 2 / 110, 55 / 110,
                    7 / 22, 3 / 12, 2 / 202, 6.75 / 202, 4 / 202, 2.25 / 202,
                    9 / 23, 3 / 13, 3 / 204, 6.75 / 204, 1 / 204, 2.25 / 204,
                    10 / 24, 6 / 14, 6 / 210, 4 / 210, 8 / 210, 1 / 210,
                    12 / 25, 6 / 15, 7 / 212, 4 / 212, 5 / 212, 1 / 212,
                    0 / 26, 0 / 16, 5 / 218, 11 / 218, 15 / 218, 6 / 218,
                    0 / 27, 0 / 17, 10 / 220, 11 / 220, 0 / 220, 6 / 220,
                    (5 - 1) / 5]
    assert np.allclose(obs, 2 * np.array(expected_obs) - 1)

    action = 2 * np.array(2 * [1.0, 0.5, 0.5, 1.0, 0.25, 0.5]
                          + 4 * [0.5, 1.0, 0.25, 0.5]) - 1
    obs, reward, _, info = env.step(action)  # t=2

    assert np.allclose(env.stock(0), [0, (1.5 + 3) / 2])
    assert np.allclose(env.stock(1), [0, (3 + 2) / 2])
    assert np.allclose(env.stock(2), [0, (3 + 4) / 2])
    assert np.allclose(env.stock(3), [0, (3 + 1) / 2])
    assert np.allclose(env.stock(4), [0, (6 + 8) / 2])
    assert np.allclose(env.stock(5), [0, (6 + 5) / 2])
    assert np.allclose(env.stock(6), [0, 0 + 15 - 9])
    assert np.allclose(env.stock(7), [0, 0])

    assert pipes(env, 0, 0) == {3: 25, 4: 50} and pipes(env, 0, 1) == {3: 30, 4: 30}
    assert pipes(env, 1, 0) == {3: 50, 4: 100} and pipes(env, 1, 1) == {3: 55, 4: 55}
    for n in (2, 3):
        assert pipes(env, n, 0) == {3: 6.75, 4: (7.5 + 1) / 2 + (6 + 4) / 2}
        assert pipes(env, n, 1) == {3: 2.25, 4: (3 + 2) / 4 + (1.5 + 3) / 4}
    for n in (4, 5):
        assert_pipes(env, n, 0, {3: 4, 4: (9 + 3) / 2 / 2 + (7 + 2) / 2 / 2})
        assert_pipes(env, n, 1, {3: 1, 4: (3 + 1) / 3 / 4 + (3 + 4) / 3 / 4})
    for n in (6, 7):
        assert pipes(env, n, 0) == {3: 11, 4: (12 + 7) / 2 + (10 + 6) / 2}
        assert pipes(env, n, 1) == {3: 6, 4: (6 + 5) / 4 + (6 + 8) / 4}


def test_SupplyChainMultiProduct():
    _run_episode(SupplyChainMultiProduct(), expected_rewards=-34704704.078214735)


def test_scenario_mp_N20():
    env = SupplyChainMultiProduct(demand_range=(0, 400), avg_demand_range=[100, 300],
                                  demand_std=20, demand_sen_peaks=4,
                                  demand_perturb_norm=True, stochastic_leadtimes=True,
                                  avg_leadtime=2, max_leadtime=4)
    _run_episode(env, expected_rewards=-33914245.32990393)


def test_scenario_mp_rN50():
    env = SupplyChainMultiProduct(demand_range=(0, 400), avg_demand_range=[100, 300],
                                  demand_std=50, demand_perturb_norm=True,
                                  stochastic_leadtimes=True, avg_leadtime=2,
                                  max_leadtime=4)
    _run_episode(env, expected_rewards=-33511405.156877503)


def test_SupplyChainMultiProduct_3products():
    _run_episode(SupplyChainMultiProduct(num_products=3),
                 expected_rewards=-52509572.65837007)


@pytest.mark.skipif(not FULL, reason="set GST_FULL=1 for the full golden sweep")
def test_scenario_m3p_N20():
    env = SupplyChainMultiProduct(num_products=3, demand_range=(0, 400),
                                  avg_demand_range=[100, 300], demand_std=20,
                                  demand_sen_peaks=4, demand_perturb_norm=True,
                                  stochastic_leadtimes=True, avg_leadtime=2,
                                  max_leadtime=4)
    _run_episode(env, expected_rewards=-51585258.57599297)


@pytest.mark.skipif(not FULL, reason="set GST_FULL=1 for the full golden sweep")
def test_scenario_m3p_rN50():
    env = SupplyChainMultiProduct(num_products=3, demand_range=(0, 400),
                                  avg_demand_range=[100, 300], demand_std=50,
                                  demand_perturb_norm=True, stochastic_leadtimes=True,
                                  avg_leadtime=2, max_leadtime=4)
    _run_episode(env, expected_rewards=-51132357.668103226)


@pytest.mark.skipif(not FULL, reason="set GST_FULL=1 for the full golden sweep")
def test_SupplyChainMultiProduct_10products():
    _run_episode(SupplyChainMultiProduct(num_products=10),
                 expected_rewards=-173415102.8513805)


def test_increasing_costs():
    """Reference test_multiproduct_2perstage.py:279-295: same units, costs
    scaled by (prod index + 1) for the value categories."""
    env = SupplyChainMultiProduct(build_info=True)
    env2 = SupplyChainMultiProduct_IncreasingCosts(build_info=True)
    info = _run_episode(env, expected_rewards=-34704704.078214735)['sc_episode']
    info2 = _run_episode(env2)['sc_episode']
    for key in info['units']:
        for i in range(env.num_products):
            assert np.allclose(info['units'][key][i], info2['units'][key][i])
            if key in ('stock', 'supply', 'process', 'ship'):
                assert np.allclose(info['costs'][key][i] * (i + 1),
                                   info2['costs'][key][i])
            else:
                assert np.allclose(info['costs'][key][i], info2['costs'][key][i])


def test_DemConfigByProd():
    env = SupplyChainMultiProduct_DemConfigByProd(
        demand_std=20, demand_perturb_norm=True, build_info=True)
    _run_episode(env, expected_rewards=-26065306.020432994)
    if FULL:
        env = SupplyChainMultiProduct_DemConfigByProd(
            num_products=3, demand_std=20, demand_perturb_norm=True, build_info=True)
        _run_episode(env, expected_rewards=-43549397.38202231)


def test_DemConfigByProd_IncCosts():
    env = SupplyChainMultiProduct_DemConfigByProd_IncCosts(
        demand_std=20, demand_perturb_norm=True, build_info=True)
    _run_episode(env, expected_rewards=-31556408.636398595)
    if FULL:
        env = SupplyChainMultiProduct_DemConfigByProd_IncCosts(
            num_products=3, demand_std=20, demand_perturb_norm=True, build_info=True)
        _run_episode(env, expected_rewards=-59867745.134582885)
