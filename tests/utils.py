"""Shared test helpers (port of reference tests/utils.py:3-22 plus builders)."""
import numpy as np


def pipes(env, node, prod=0):
    """Node pipeline as {arrival_time: amount} (dense aggregation of the
    reference's per-time heap entries)."""
    return {t: a for t, a in env.pipeline(node, prod)}


def assert_pipes(env, node, prod, expected):
    """Pipeline equality with float tolerance (dense buckets sum the
    reference's per-entry heap amounts, so ULP-level differences arise)."""
    got = pipes(env, node, prod)
    assert sorted(got) == sorted(expected), (got, expected)
    for t in expected:
        assert np.allclose(got[t], expected[t]), (node, prod, t, got, expected)


def check_rewards(acumm_rewards, info, num_products):
    """Accumulated rewards must equal the episode stats and -sum(costs)
    (reference tests/utils.py:3-11)."""
    assert np.allclose(acumm_rewards, info["sc_episode"]["rewards"])
    total = 0.0
    for key in info["sc_episode"]["costs"]:
        for prod in range(num_products):
            total += info["sc_episode"]["costs"][key][prod]
    assert np.allclose(acumm_rewards, -total)


def check_build_info(env):
    """Full-episode internal-consistency sweep (reference tests/utils.py:13-22)."""
    env.seed(1)
    env.reset()
    done = False
    rewards = 0.0
    while not done:
        _, r, done, info = env.step(env.action_space.sample())
        rewards += r
        check_rewards(rewards, info, env.num_products)


def simple_chain(num_products=1, initial_stock=0, stock_capacity=10,
                 stock_cost=1, dest_cost=2, supply_cost=5, supply_capacity=100,
                 processing_cost=10, processing_capacity=100, ship_capacity=10):
    """Reference linear-chain fixture (test_supplychain_env.py:11-27); note the
    deliberately oversized dest_costs/ship_capacity lists whose tails are
    unused."""
    nodes_info = {}
    nodes_info['Supplier'] = {'initial_stock': initial_stock, 'stock_capacity': stock_capacity,
                              'stock_cost': stock_cost, 'supply_capacity': supply_capacity,
                              'supply_cost': supply_cost, 'destinations': ['Factory'],
                              'dest_costs': [[dest_cost] * 2] * num_products,
                              'ship_capacity': [ship_capacity] * 2}
    nodes_info['Factory'] = {'initial_stock': initial_stock, 'stock_capacity': stock_capacity,
                             'stock_cost': stock_cost, 'processing_capacity': processing_capacity,
                             'processing_cost': processing_cost, 'destinations': ['Wholesal'],
                             'dest_costs': [[dest_cost] * 2] * num_products,
                             'ship_capacity': [ship_capacity] * 2}
    nodes_info['Wholesal'] = {'initial_stock': initial_stock, 'stock_capacity': stock_capacity,
                              'stock_cost': stock_cost, 'destinations': ['Retailer'],
                              'dest_costs': [[dest_cost] * 2] * num_products,
                              'ship_capacity': [ship_capacity] * 2}
    nodes_info['Retailer'] = {'initial_stock': initial_stock, 'stock_capacity': stock_capacity,
                              'stock_cost': stock_cost, 'last_level': True}
    return nodes_info
