"""Dev smoke driver (not a pytest module)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "true"

import numpy as np
from gym_supplychain_tpu.envs.single import SupplyChainEnv


def simple_chain(num_products=1, initial_stock=10, stock_capacity=100,
                 stock_cost=1, dest_cost=2, supply_cost=5, supply_capacity=50,
                 processing_cost=10, processing_capacity=100, ship_capacity=100):
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


env = SupplyChainEnv(simple_chain(), num_products=1, unmet_demand_cost=1000,
                     exceeded_stock_capacity_cost=1000, exceeded_process_capacity_cost=1000,
                     exceeded_ship_capacity_cost=1000, demand_range=(0, 5),
                     processing_ratio=2, stochastic_leadtimes=False, avg_leadtime=2,
                     max_leadtime=2, total_time_steps=5)
env.seed(0)
obs = env.reset()
print("demands:", env.customer_demands.flatten())
assert np.all(env.customer_demands.flatten() == [4, 5, 0, 3, 3, 3])

supply_action = 2 * np.array([1, 0, 0, 0, 0, 0]) - 1
env.step(supply_action)
print("t=1 supplier pipe:", env.pipeline(0))
assert env.pipeline(0) == [(3, 50)]
for n in range(1, 4):
    assert env.pipeline(n) == []
for n in range(3):
    assert env.stock(n) == [10]
print("retailer stock:", env.stock(3))
assert env.stock(3) == 10 - env.customer_demands[0]

send_all = 2 * np.ones(6) - 1
env.step(send_all)
print("t=2:", [env.pipeline(n) for n in range(4)])
assert env.pipeline(0) == [(3, 50), (4, 50)]
assert env.pipeline(1) == [(4, 10)]
assert env.pipeline(2) == [(4, 5)]
assert env.pipeline(3) == [(4, 10)]
for n in range(3):
    assert env.stock(n) == 0
print("OK")
