"""Ports of reference test_multiproduct.py: 2-product linear chain dynamics
and per-category cost accounting."""
import numpy as np

from gym_supplychain_tpu import SupplyChainEnv
from .utils import pipes


def _chain():
    """Reference test_multiproduct.py:7-24 (heterogeneous per-product params)."""
    nodes_info = {}
    common = {'initial_stock': [10, 20], 'stock_capacity': [100, 200],
              'stock_cost': [1, 2]}
    nodes_info['Supplier'] = dict(common, supply_capacity=[50, 50],
                                  supply_cost=[5, 10], destinations=['Factory'],
                                  dest_costs=[[2], [3]], ship_capacity=[100] * 2)
    nodes_info['Factory'] = dict(common, processing_capacity=50,
                                 processing_cost=[10, 20], destinations=['Wholesal'],
                                 dest_costs=[[2], [3]], ship_capacity=[100] * 2)
    nodes_info['Wholesal'] = dict(common, destinations=['Retailer'],
                                  dest_costs=[[2], [3]], ship_capacity=[100] * 2)
    nodes_info['Retailer'] = dict(common, last_level=True)
    return nodes_info


def _create_env(total_time_steps=5, build_info=False):
    return SupplyChainEnv(_chain(), num_products=2, unmet_demand_cost=1000,
                          exceeded_stock_capacity_cost=101,
                          exceeded_process_capacity_cost=102,
                          exceeded_ship_capacity_cost=103,
                          demand_range=(0, 5), processing_ratio=2,
                          stochastic_leadtimes=False, avg_leadtime=2,
                          max_leadtime=2, total_time_steps=total_time_steps,
                          build_info=build_info)


def test_initial_stocks():
    env = _create_env()
    env.seed(0)
    env.reset()
    for n in range(4):
        assert np.all(env.stock(n) == [10, 20])
        assert np.all(env.cc.stock_cap[n] == [100, 200])
        assert np.all(env.cc.stock_cost[n] == [1, 2])


def test_simpleenv():
    """Reference test_multiproduct.py:52-121."""
    env = _create_env()
    env.seed(0)
    env.reset()
    assert np.all(env.customer_demands.flatten()
                  == [4, 5, 0, 3, 3, 3, 1, 3, 5, 2, 4, 0])
    for n in range(4):
        assert pipes(env, n, 0) == {} and pipes(env, n, 1) == {}

    supply_action = 2 * np.array([1, 1, 0, 0, 0, 0, 0, 0]) - 1
    env.step(supply_action)  # t=1
    assert pipes(env, 0, 0) == {3: 50} and pipes(env, 0, 1) == {3: 50}
    for n in range(1, 4):
        assert pipes(env, n, 0) == {} and pipes(env, n, 1) == {}
    for n in range(3):
        assert np.allclose(env.stock(n), [10, 20])
    assert np.allclose(env.stock(3), [6, 15])

    send_all = 2 * np.ones(8) - 1
    env.step(send_all)  # t=2
    assert pipes(env, 0, 0) == {3: 50, 4: 50} and pipes(env, 0, 1) == {3: 50, 4: 50}
    assert pipes(env, 1, 0) == {4: 10} and pipes(env, 1, 1) == {4: 20}
    assert pipes(env, 2, 0) == {4: 5} and pipes(env, 2, 1) == {4: 10}
    assert pipes(env, 3, 0) == {4: 10} and pipes(env, 3, 1) == {4: 20}
    for n in range(3):
        assert np.allclose(env.stock(n), [0, 0])
    assert np.allclose(env.stock(3), [6, 12])

    env.step(send_all)  # t=3
    assert pipes(env, 0, 0) == {4: 50, 5: 50} and pipes(env, 0, 1) == {4: 50, 5: 50}
    assert pipes(env, 1, 0) == {4: 10, 5: 50} and pipes(env, 1, 1) == {4: 20, 5: 50}
    assert pipes(env, 2, 0) == {4: 5} and pipes(env, 2, 1) == {4: 10}
    assert pipes(env, 3, 0) == {4: 10} and pipes(env, 3, 1) == {4: 20}
    for n in range(3):
        assert np.allclose(env.stock(n), [0, 0])
    assert np.allclose(env.stock(3), [3, 9])

    env.step(send_all)  # t=4
    assert pipes(env, 0, 0) == {5: 50, 6: 50} and pipes(env, 0, 1) == {5: 50, 6: 50}
    assert pipes(env, 1, 0) == {5: 50, 6: 50} and pipes(env, 1, 1) == {5: 50, 6: 50}
    assert pipes(env, 2, 0) == {6: 5} and pipes(env, 2, 1) == {6: 10}
    assert pipes(env, 3, 0) == {6: 5} and pipes(env, 3, 1) == {6: 10}
    for n in range(3):
        assert np.allclose(env.stock(n), [0, 0])
    assert np.allclose(env.stock(3), [12, 26])

    env.step(send_all)  # t=5
    assert pipes(env, 0, 0) == {6: 50, 7: 50} and pipes(env, 0, 1) == {6: 50, 7: 50}
    assert pipes(env, 1, 0) == {6: 50, 7: 50} and pipes(env, 1, 1) == {6: 50, 7: 50}
    assert pipes(env, 2, 0) == {6: 5, 7: 25} and pipes(env, 2, 1) == {6: 10}
    assert pipes(env, 3, 0) == {6: 5} and pipes(env, 3, 1) == {6: 10}
    assert np.allclose(env.stock(0), [0, 0])
    assert np.allclose(env.stock(1), [0, 50])
    assert np.allclose(env.stock(3), [7, 24])


def test_basic_costs():
    """Reference test_multiproduct.py:123-166."""
    env = _create_env(build_info=True)
    supply_action = 2 * np.array([1, 1, 0, 0, 0, 0, 0, 0]) - 1
    send_all = 2 * np.ones(8) - 1
    env.seed(0)
    env.reset()
    env.step(supply_action)
    env.step(send_all)
    env.step(send_all)
    _, _, _, info = env.step(send_all)
    units = info['sc_episode']['units']
    costs = info['sc_episode']['costs']
    assert units['stock'] == [57, 122]
    assert costs['stock'] == [57, 244]
    assert units['stock_pen'] == [0, 0] and costs['stock_pen'] == [0, 0]
    assert units['supply'] == [200, 200]
    assert costs['supply'] == [1000, 2000]
    assert units['process'] == [20, 40]
    assert costs['process'] == [200, 800]
    assert units['process_pen'] == [0, 0] and costs['process_pen'] == [0, 0]
    assert units['ship'] == [135, 170]
    assert costs['ship'] == [270, 510]
    assert units['ship_pen'] == [0, 0] and costs['ship_pen'] == [0, 0]
    assert units['unmet_dem'] == [0, 0] and costs['unmet_dem'] == [0, 0]


def test_pen_costs():
    """Reference test_multiproduct.py:168-208 (stock/ship/unmet penalties)."""
    env = _create_env(build_info=True)
    supply_action = 2 * np.array([1, 1, 0, 0, 0, 0, 0, 0]) - 1
    env.seed(0)
    env.reset()
    for _ in range(4):
        _, _, _, info = env.step(supply_action)
    units = info['sc_episode']['units']
    costs = info['sc_episode']['costs']
    assert units['stock_pen'] == [10, 0]
    assert costs['stock_pen'] == [101 * 10, 0]
    assert np.allclose(env.stock(0), [100, 120])

    send_all = 2 * np.ones(8) - 1
    _, _, _, info = env.step(send_all)
    units = info['sc_episode']['units']
    costs = info['sc_episode']['costs']
    assert units['ship_pen'] == [0, 70]
    assert costs['ship_pen'] == [0, 103 * 70]
    assert np.allclose(env.stock(0), [0, 70])
    assert pipes(env, 1, 0) == {7: 100} and pipes(env, 1, 1) == {7: 100}
    assert units['unmet_dem'] == [3, 0]
    assert costs['unmet_dem'] == [3 * 1000, 0]


def test_processpen_costs():
    """Reference test_multiproduct.py:210-237 (processing-capacity penalty)."""
    env = _create_env(total_time_steps=6, build_info=True)
    supply_action = 2 * np.array([1, 1, 0, 0, 0, 0, 0, 0]) - 1
    supplier_full = 2 * np.array([1, 1, 1, 1, 0, 0, 0, 0]) - 1
    send_all = 2 * np.ones(8) - 1
    env.seed(0)
    env.reset()
    env.step(supply_action)
    for _ in range(4):
        env.step(supplier_full)
    _, _, _, info = env.step(send_all)
    units = info['sc_episode']['units']
    costs = info['sc_episode']['costs']
    assert units['process_pen'] == [50, 140]
    assert costs['process_pen'] == [102 * 50, 102 * 140]
