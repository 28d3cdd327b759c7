"""Scenario presets: every topology the reference ships, plus the README ids.

Each function builds a reference-schema ``nodes_info`` dict plus the env
kwargs, value-identical to the corresponding reference subclass:

* ``SupplyChain2perStageEnv`` / seasonal (supplychain_2perstage_env.py:3-97)
* ``SupplyChainMultiProduct`` + IncreasingCosts / DemConfigByProd variants
  (supplychain_multiproduct_env.py:3-274)
* ``SupplyChainNPerStage`` (supplychain_Nperstage_env.py:3-131)
* README-only topologies (linear, one-one-N, N-to-M) that the reference
  documents but never registers (README.md:17-23); the linear chain matches
  the test fixture (test_supplychain_env.py:11-27), the N-to-M graph matches
  the __main__ demo (supplychain_env.py:842-868).
"""
from __future__ import annotations

from .single import SupplyChainEnv

__all__ = [
    "SupplyChain2perStageEnv", "SupplyChain2perStageSeasonalEnv",
    "SupplyChainMultiProduct", "SupplyChainMultiProduct_IncreasingCosts",
    "SupplyChainMultiProduct_DemConfigByProd",
    "SupplyChainMultiProduct_DemConfigByProd_IncCosts",
    "SupplyChainNPerStage", "SupplyChainLinearEnv", "SupplyChainOneOneNEnv",
    "SupplyChainNtoMEnv",
]


class SupplyChain2perStageEnv(SupplyChainEnv):
    """2 suppliers -> 2 factories -> 2 wholesalers -> 2 retailers, full
    bipartite between stages (supplychain_2perstage_env.py:14-64)."""

    def __init__(self, num_products=1, initial_stocks=[0] * 8,
                 initial_supply=[[[60, 60]]] * 2,
                 initial_shipments=[[[60, 60]]] * 2 + [[[20, 20]]] * 4,
                 supply_capacities=[120, 150], processing_capacities=[300, 300],
                 stock_capacities=[200, 300] * 4, ship_capacity=300,
                 processing_ratio=3, processing_costs=[12, 10],
                 stock_costs=[1] * 8, supply_costs=[6, 4], dest_cost=2,
                 unmet_demand_cost=216, exceeded_stock_capacity_cost=10,
                 exceeded_process_capacity_cost=10,
                 exceeded_ship_capacity_cost=10,
                 demand_range=(10, 20), demand_std=None, demand_sen_peaks=None,
                 avg_demand_range=None, stochastic_leadtimes=False,
                 avg_leadtime=2, max_leadtime=2, total_time_steps=360,
                 seed=None, build_info=False, demand_perturb_norm=False,
                 **kw):
        if not initial_stocks:
            initial_stocks = [0] * 8
        nodes_info = {}
        for i in range(2):
            nodes_info['Supplier' + str(i + 1)] = {
                'initial_stock': initial_stocks[i], 'initial_supply': initial_supply[i],
                'stock_capacity': stock_capacities[i], 'stock_cost': stock_costs[i],
                'supply_capacity': supply_capacities[i], 'supply_cost': supply_costs[i],
                'destinations': ['Factory1', 'Factory2'],
                'dest_costs': [[dest_cost] * 2] * num_products,
                'ship_capacity': [ship_capacity] * 2}
        for i in range(2):
            nodes_info['Factory' + str(i + 1)] = {
                'initial_stock': initial_stocks[2 + i], 'initial_shipments': initial_shipments[i],
                'stock_capacity': stock_capacities[2 + i], 'stock_cost': stock_costs[2 + i],
                'processing_capacity': processing_capacities[i],
                'processing_cost': processing_costs[i],
                'destinations': ['WholeSaler1', 'WholeSaler2'],
                'dest_costs': [[dest_cost] * 2] * num_products,
                'ship_capacity': [ship_capacity] * 2}
        for i in range(2):
            nodes_info['WholeSaler' + str(i + 1)] = {
                'initial_stock': initial_stocks[4 + i], 'initial_shipments': initial_shipments[2 + i],
                'stock_capacity': stock_capacities[4 + i], 'stock_cost': stock_costs[4 + i],
                'destinations': ['Retailer1', 'Retailer2'],
                'dest_costs': [[dest_cost] * 2] * num_products,
                'ship_capacity': [ship_capacity] * 2}
        for i in range(2):
            nodes_info['Retailer' + str(i + 1)] = {
                'initial_stock': initial_stocks[6 + i], 'initial_shipments': initial_shipments[4 + i],
                'stock_capacity': stock_capacities[6 + i], 'stock_cost': stock_costs[6 + i],
                'last_level': True}
        super().__init__(nodes_info, num_products=num_products,
                         unmet_demand_cost=unmet_demand_cost,
                         exceeded_stock_capacity_cost=exceeded_stock_capacity_cost,
                         exceeded_process_capacity_cost=exceeded_process_capacity_cost,
                         exceeded_ship_capacity_cost=exceeded_ship_capacity_cost,
                         processing_ratio=processing_ratio, demand_range=demand_range,
                         demand_std=demand_std, demand_sen_peaks=demand_sen_peaks,
                         avg_demand_range=avg_demand_range,
                         total_time_steps=total_time_steps,
                         stochastic_leadtimes=stochastic_leadtimes,
                         avg_leadtime=avg_leadtime, max_leadtime=max_leadtime,
                         seed=seed, build_info=build_info,
                         demand_perturb_norm=demand_perturb_norm, **kw)


class SupplyChain2perStageSeasonalEnv(SupplyChain2perStageEnv):
    """Seasonal-demand 2perstage with 10x larger stocks/capacities
    (supplychain_2perstage_env.py:67-97)."""

    def __init__(self, num_products=1, initial_stocks=[800] * 8,
                 initial_supply=[[[600, 600]], [[840, 840]]],
                 initial_shipments=[[[600, 600]], [[840, 840]]] + [[[240, 240]]] * 4,
                 supply_capacities=[600, 840], processing_capacities=[840, 960],
                 stock_capacities=[1600, 1800] * 4, ship_capacity=1800,
                 processing_ratio=3, processing_costs=[12, 10],
                 stock_costs=[1] * 8, supply_costs=[6, 4], dest_cost=2,
                 unmet_demand_cost=216, exceeded_stock_capacity_cost=10,
                 exceeded_process_capacity_cost=10, exceeded_ship_capacity_cost=10,
                 demand_range=(0, 400), demand_std=10, demand_sen_peaks=4,
                 avg_demand_range=(150, 250), stochastic_leadtimes=False,
                 avg_leadtime=2, max_leadtime=2, total_time_steps=360,
                 seed=None, build_info=False, demand_perturb_norm=True, **kw):
        super().__init__(num_products=num_products, initial_stocks=initial_stocks,
                         initial_supply=initial_supply, initial_shipments=initial_shipments,
                         supply_capacities=supply_capacities,
                         processing_capacities=processing_capacities,
                         stock_capacities=stock_capacities, ship_capacity=ship_capacity,
                         processing_ratio=processing_ratio, processing_costs=processing_costs,
                         stock_costs=stock_costs, supply_costs=supply_costs,
                         dest_cost=dest_cost, unmet_demand_cost=unmet_demand_cost,
                         exceeded_stock_capacity_cost=exceeded_stock_capacity_cost,
                         exceeded_process_capacity_cost=exceeded_process_capacity_cost,
                         exceeded_ship_capacity_cost=exceeded_ship_capacity_cost,
                         demand_range=demand_range, demand_std=demand_std,
                         demand_sen_peaks=demand_sen_peaks,
                         avg_demand_range=avg_demand_range,
                         stochastic_leadtimes=stochastic_leadtimes,
                         avg_leadtime=avg_leadtime, max_leadtime=max_leadtime,
                         total_time_steps=total_time_steps, seed=seed,
                         build_info=build_info,
                         demand_perturb_norm=demand_perturb_norm, **kw)


def _multiproduct_nodes(num_products, initial_stocks, stock_capacities,
                        stock_costs, initial_supply, supply_capacities,
                        supply_costs, dest_cost, ship_capacity,
                        initial_shipments, processing_capacities,
                        processing_costs):
    """8-node multi-product chain (supplychain_multiproduct_env.py:4-51)."""
    nodes_info = {}
    nodes_info['Supplier1'] = {'initial_stock': initial_stocks[0], 'stock_capacity': stock_capacities[0],
                               'stock_cost': stock_costs, 'initial_supply': initial_supply[0],
                               'supply_capacity': supply_capacities[0], 'supply_cost': supply_costs[0],
                               'destinations': ['Factory1', 'Factory2'], 'dest_costs': dest_cost,
                               'ship_capacity': ship_capacity}
    nodes_info['Supplier2'] = {'initial_stock': initial_stocks[1], 'stock_capacity': stock_capacities[1],
                               'stock_cost': stock_costs, 'initial_supply': initial_supply[1],
                               'supply_capacity': supply_capacities[1], 'supply_cost': supply_costs[1],
                               'destinations': ['Factory1', 'Factory2'], 'dest_costs': dest_cost,
                               'ship_capacity': ship_capacity}
    nodes_info['Factory1'] = {'initial_stock': initial_stocks[2], 'stock_capacity': stock_capacities[2],
                              'stock_cost': stock_costs, 'initial_shipments': initial_shipments[0],
                              'processing_capacity': processing_capacities[0],
                              'processing_cost': processing_costs[0],
                              'destinations': ['Wholesal1', 'Wholesal2'], 'dest_costs': dest_cost,
                              'ship_capacity': ship_capacity}
    nodes_info['Factory2'] = {'initial_stock': initial_stocks[3], 'stock_capacity': stock_capacities[3],
                              'stock_cost': stock_costs, 'initial_shipments': initial_shipments[1],
                              'processing_capacity': processing_capacities[1],
                              'processing_cost': processing_costs[1],
                              'destinations': ['Wholesal1', 'Wholesal2'], 'dest_costs': dest_cost,
                              'ship_capacity': ship_capacity}
    nodes_info['Wholesal1'] = {'initial_stock': initial_stocks[4], 'stock_capacity': stock_capacities[4],
                               'stock_cost': stock_costs, 'initial_shipments': initial_shipments[2],
                               'destinations': ['Retailer1', 'Retailer2'], 'dest_costs': dest_cost,
                               'ship_capacity': ship_capacity}
    nodes_info['Wholesal2'] = {'initial_stock': initial_stocks[5], 'stock_capacity': stock_capacities[5],
                               'stock_cost': stock_costs, 'initial_shipments': initial_shipments[3],
                               'destinations': ['Retailer1', 'Retailer2'], 'dest_costs': dest_cost,
                               'ship_capacity': ship_capacity}
    nodes_info['Retailer1'] = {'initial_stock': initial_stocks[6], 'stock_capacity': stock_capacities[6],
                               'stock_cost': stock_costs, 'initial_shipments': initial_shipments[4],
                               'last_level': True}
    nodes_info['Retailer2'] = {'initial_stock': initial_stocks[7], 'stock_capacity': stock_capacities[7],
                               'stock_cost': stock_costs, 'initial_shipments': initial_shipments[5],
                               'last_level': True}
    return nodes_info


class SupplyChainMultiProduct(SupplyChainEnv):
    """Default-parameter multi-product 8-node chain
    (supplychain_multiproduct_env.py:53-114)."""

    def __init__(self, demand_config_by_product=False, num_products=2,
                 initial_stocks=None, stock_capacities=None, stock_costs=1,
                 initial_supply=None, supply_capacities=None, supply_costs=None,
                 dest_cost=None, ship_capacity=None, initial_shipments=None,
                 processing_capacities=None, processing_costs=None,
                 processing_ratio=3, unmet_demand_cost=216,
                 exceeded_stock_capacity_cost=10, exceeded_process_capacity_cost=10,
                 exceeded_ship_capacity_cost=10, demand_range=(0, 400),
                 demand_std=None, demand_sen_peaks=None, avg_demand_range=None,
                 demand_perturb_norm=False, stochastic_leadtimes=False,
                 avg_leadtime=2, max_leadtime=2, total_time_steps=360,
                 seed=None, build_info=False, **kw):
        if not stock_capacities:
            stock_capacities = [[1600] * num_products, [1800] * num_products,
                                [6400] * num_products, [7200] * num_products,
                                [1600] * num_products, [1800] * num_products,
                                [1600] * num_products, [1800] * num_products]
        if not initial_stocks:
            initial_stocks = [[800] * num_products] * 8
        if not initial_supply:
            initial_supply = [[[600] * avg_leadtime] * num_products,
                              [[840] * avg_leadtime] * num_products]
        if not supply_capacities:
            supply_capacities = [[600] * num_products, [840] * num_products]
        if not supply_costs:
            supply_costs = [[6] * num_products, [4] * num_products]
        if not dest_cost:
            dest_cost = [[2] * 2] * num_products
        if not ship_capacity:
            ship_capacity = [500 * num_products, 500 * num_products]
        if not initial_shipments:
            initial_shipments = ([[[600] * avg_leadtime] * num_products,
                                  [[840] * avg_leadtime] * num_products]
                                 + [[[240] * avg_leadtime] * num_products] * 4)
        if not processing_capacities:
            processing_capacities = [840 * num_products, 960 * num_products]
        if not processing_costs:
            processing_costs = [[12] * num_products, [10] * num_products]
        nodes_info = _multiproduct_nodes(
            num_products, initial_stocks, stock_capacities, stock_costs,
            initial_supply, supply_capacities, supply_costs, dest_cost,
            ship_capacity, initial_shipments, processing_capacities,
            processing_costs)
        super().__init__(nodes_info, demand_config_by_product=demand_config_by_product,
                         num_products=num_products, unmet_demand_cost=unmet_demand_cost,
                         exceeded_stock_capacity_cost=exceeded_stock_capacity_cost,
                         exceeded_process_capacity_cost=exceeded_process_capacity_cost,
                         exceeded_ship_capacity_cost=exceeded_ship_capacity_cost,
                         processing_ratio=processing_ratio, demand_range=demand_range,
                         demand_std=demand_std, demand_sen_peaks=demand_sen_peaks,
                         avg_demand_range=avg_demand_range,
                         total_time_steps=total_time_steps,
                         stochastic_leadtimes=stochastic_leadtimes,
                         avg_leadtime=avg_leadtime, max_leadtime=max_leadtime,
                         seed=seed, build_info=build_info,
                         demand_perturb_norm=demand_perturb_norm, **kw)


class SupplyChainMultiProduct_IncreasingCosts(SupplyChainMultiProduct):
    """Costs scale with (product index + 1)
    (supplychain_multiproduct_env.py:117-155)."""

    def __init__(self, num_products=2, **kw):
        supply_costs = [[6 * (i + 1) for i in range(num_products)],
                        [4 * (i + 1) for i in range(num_products)]]
        dest_cost = [[2 * (i + 1)] * 2 for i in range(num_products)]
        processing_costs = [[12 * (i + 1) for i in range(num_products)],
                            [10 * (i + 1) for i in range(num_products)]]
        stock_costs = [1 * (i + 1) for i in range(num_products)]
        super().__init__(num_products=num_products, supply_costs=supply_costs,
                         dest_cost=dest_cost, processing_costs=processing_costs,
                         stock_costs=stock_costs, **kw)


def _dem_by_prod_cfg(num_products, demand_std):
    """Per-product demand configs for DemConfigByProd variants
    (supplychain_multiproduct_env.py:180-198, :234-252).  The reference wraps
    the std of products 2-3 in a 1-element list (:243, :251); NumPy broadcasts
    that identically to the scalar, so the plain scalar is passed here."""
    assert 1 <= num_products <= 3
    demand_range = [(0, 400)]
    demand_stds = [demand_std]
    demand_sen_peaks = [4]
    avg_demand_range = [(100, 300)]
    if num_products > 1:
        demand_range.append((0, 300))
        demand_stds.append(demand_std)
        demand_sen_peaks.append(None)
        avg_demand_range.append(None)
    if num_products > 2:
        demand_range.append((0, 400))
        demand_stds.append(demand_std)
        demand_sen_peaks.append(2)
        avg_demand_range.append((100, 300))
    return demand_range, demand_stds, demand_sen_peaks, avg_demand_range


class SupplyChainMultiProduct_DemConfigByProd(SupplyChainMultiProduct):
    """Per-product demand processes (supplychain_multiproduct_env.py:157-209)."""

    def __init__(self, num_products=2, demand_std=None,
                 demand_perturb_norm=False, **kw):
        rng, stds, peaks, avg = _dem_by_prod_cfg(num_products, demand_std)
        super().__init__(demand_config_by_product=True, num_products=num_products,
                         demand_range=rng, demand_std=stds, demand_sen_peaks=peaks,
                         avg_demand_range=avg,
                         demand_perturb_norm=[demand_perturb_norm] * num_products,
                         **kw)


class SupplyChainMultiProduct_DemConfigByProd_IncCosts(SupplyChainMultiProduct):
    """Per-product demand + increasing costs
    (supplychain_multiproduct_env.py:211-274)."""

    def __init__(self, num_products=2, demand_std=None,
                 demand_perturb_norm=False, **kw):
        # NOTE: the reference wraps the 2nd/3rd product's std in a one-element
        # list here (supplychain_multiproduct_env.py:243, :250); NumPy's
        # normal() broadcasts it identically, so the stream is unchanged.
        rng, stds, peaks, avg = _dem_by_prod_cfg(num_products, demand_std)
        supply_costs = [[6 * (i + 1) for i in range(num_products)],
                        [4 * (i + 1) for i in range(num_products)]]
        dest_cost = [[2 * (i + 1)] * 2 for i in range(num_products)]
        processing_costs = [[12 * (i + 1) for i in range(num_products)],
                            [10 * (i + 1) for i in range(num_products)]]
        stock_costs = [1 * (i + 1) for i in range(num_products)]
        super().__init__(demand_config_by_product=True, num_products=num_products,
                         supply_costs=supply_costs, dest_cost=dest_cost,
                         processing_costs=processing_costs, stock_costs=stock_costs,
                         demand_range=rng, demand_std=stds, demand_sen_peaks=peaks,
                         avg_demand_range=avg,
                         demand_perturb_norm=[demand_perturb_norm] * num_products,
                         **kw)


class SupplyChainNPerStage(SupplyChainEnv):
    """4 echelons with configurable node counts, full bipartite wiring
    (supplychain_Nperstage_env.py:37-131)."""

    def __init__(self, nodes_per_echelon=3, num_products=2,
                 initial_stocks=None, stock_capacities=None, stock_costs=1,
                 initial_supply=None, supply_capacities=None, supply_costs=None,
                 dest_cost=None, ship_capacity=None, initial_shipments=None,
                 processing_capacities=None, processing_costs=None,
                 processing_ratio=3, unmet_demand_cost=216,
                 exceeded_stock_capacity_cost=10, exceeded_process_capacity_cost=10,
                 exceeded_ship_capacity_cost=10, demand_range=(0, 400),
                 demand_std=None, demand_sen_peaks=None, avg_demand_range=None,
                 demand_perturb_norm=False, stochastic_leadtimes=False,
                 avg_leadtime=2, max_leadtime=2, total_time_steps=360,
                 seed=None, build_info=False, **kw):
        if isinstance(nodes_per_echelon, int):
            nodes_per_echelon = [nodes_per_echelon] * 4
        ne = {'suppliers': nodes_per_echelon[0], 'factories': nodes_per_echelon[1],
              'wholesalers': nodes_per_echelon[2], 'retailers': nodes_per_echelon[3]}
        if not stock_capacities:
            stock_capacities = {
                'suppliers': [[1600] * num_products] * ne['suppliers'],
                'factories': [[6400] * num_products] * ne['factories'],
                'wholesalers': [[1600] * num_products] * ne['wholesalers'],
                'retailers': [[1600] * num_products] * ne['retailers']}
        if not initial_stocks:
            initial_stocks = {k: [[800] * num_products] * ne[k] for k in ne}
        if not initial_supply:
            initial_supply = [[[600] * avg_leadtime] * num_products] * ne['suppliers']
        if not supply_capacities:
            supply_capacities = [[600] * num_products] * ne['suppliers']
        if not supply_costs:
            supply_costs = [[6] * num_products] * ne['suppliers']
        if not dest_cost:
            dest_cost = {'suppliers': [[2] * ne['factories']] * num_products,
                         'factories': [[2] * ne['wholesalers']] * num_products,
                         'wholesalers': [[2] * ne['retailers']] * num_products}
        if not ship_capacity:
            ship_capacity = {'suppliers': [500 * num_products] * ne['factories'],
                             'factories': [500 * num_products] * ne['wholesalers'],
                             'wholesalers': [500 * num_products] * ne['retailers']}
        if not initial_shipments:
            initial_shipments = {
                'factories': [[[600] * avg_leadtime] * num_products] * ne['factories'],
                'wholesalers': [[[240] * avg_leadtime] * num_products] * ne['wholesalers'],
                'retailers': [[[240] * avg_leadtime] * num_products] * ne['retailers']}
        if not processing_capacities:
            processing_capacities = [840 * num_products] * ne['factories']
        if not processing_costs:
            processing_costs = [[12] * num_products] * ne['factories']

        nodes_info = {}
        for i in range(ne['suppliers']):
            nodes_info[f'Supplier{i}'] = {
                'initial_stock': initial_stocks['suppliers'][i],
                'stock_capacity': stock_capacities['suppliers'][i],
                'stock_cost': stock_costs, 'initial_supply': initial_supply[i],
                'supply_capacity': supply_capacities[i], 'supply_cost': supply_costs[i],
                'destinations': [f'Factory{j}' for j in range(ne['factories'])],
                'dest_costs': dest_cost['suppliers'],
                'ship_capacity': ship_capacity['suppliers']}
        for i in range(ne['factories']):
            nodes_info[f'Factory{i}'] = {
                'initial_stock': initial_stocks['factories'][i],
                'stock_capacity': stock_capacities['factories'][i],
                'stock_cost': stock_costs,
                'initial_shipments': initial_shipments['factories'][i],
                'processing_capacity': processing_capacities[i],
                'processing_cost': processing_costs[i],
                'destinations': [f'Wholesal{j}' for j in range(ne['wholesalers'])],
                'dest_costs': dest_cost['factories'],
                'ship_capacity': ship_capacity['factories']}
        for i in range(ne['wholesalers']):
            nodes_info[f'Wholesal{i}'] = {
                'initial_stock': initial_stocks['wholesalers'][i],
                'stock_capacity': stock_capacities['wholesalers'][i],
                'stock_cost': stock_costs,
                'initial_shipments': initial_shipments['wholesalers'][i],
                'destinations': [f'Retailer{j}' for j in range(ne['retailers'])],
                'dest_costs': dest_cost['wholesalers'],
                'ship_capacity': ship_capacity['wholesalers']}
        for i in range(ne['retailers']):
            nodes_info[f'Retailer{i}'] = {
                'initial_stock': initial_stocks['retailers'][i],
                'stock_capacity': stock_capacities['retailers'][i],
                'stock_cost': stock_costs,
                'initial_shipments': initial_shipments['retailers'][i],
                'last_level': True}

        super().__init__(nodes_info, num_products=num_products,
                         unmet_demand_cost=unmet_demand_cost,
                         exceeded_stock_capacity_cost=exceeded_stock_capacity_cost,
                         exceeded_process_capacity_cost=exceeded_process_capacity_cost,
                         exceeded_ship_capacity_cost=exceeded_ship_capacity_cost,
                         processing_ratio=processing_ratio, demand_range=demand_range,
                         demand_std=demand_std, demand_sen_peaks=demand_sen_peaks,
                         avg_demand_range=avg_demand_range,
                         total_time_steps=total_time_steps,
                         stochastic_leadtimes=stochastic_leadtimes,
                         avg_leadtime=avg_leadtime, max_leadtime=max_leadtime,
                         seed=seed, build_info=build_info,
                         demand_perturb_norm=demand_perturb_norm, **kw)


def _linear_nodes(num_products=1, initial_stock=10, stock_capacity=100,
                  stock_cost=1, dest_cost=2, supply_cost=5, supply_capacity=50,
                  processing_cost=10, processing_capacity=100, ship_capacity=100):
    """4-node linear chain Supplier->Factory->Wholesal->Retailer (matches the
    reference test fixture, test_supplychain_env.py:11-32)."""
    nodes_info = {}
    nodes_info['Supplier'] = {'initial_stock': initial_stock, 'stock_capacity': stock_capacity,
                              'stock_cost': stock_cost, 'supply_capacity': supply_capacity,
                              'supply_cost': supply_cost, 'destinations': ['Factory'],
                              'dest_costs': [[dest_cost]] * num_products,
                              'ship_capacity': [ship_capacity]}
    nodes_info['Factory'] = {'initial_stock': initial_stock, 'stock_capacity': stock_capacity,
                             'stock_cost': stock_cost, 'processing_capacity': processing_capacity,
                             'processing_cost': processing_cost, 'destinations': ['Wholesal'],
                             'dest_costs': [[dest_cost]] * num_products,
                             'ship_capacity': [ship_capacity]}
    nodes_info['Wholesal'] = {'initial_stock': initial_stock, 'stock_capacity': stock_capacity,
                              'stock_cost': stock_cost, 'destinations': ['Retailer'],
                              'dest_costs': [[dest_cost]] * num_products,
                              'ship_capacity': [ship_capacity]}
    nodes_info['Retailer'] = {'initial_stock': initial_stock, 'stock_capacity': stock_capacity,
                              'stock_cost': stock_cost, 'last_level': True}
    return nodes_info


class SupplyChainLinearEnv(SupplyChainEnv):
    """README's ``supplychain-linear-v0``: 4-node linear chain."""

    def __init__(self, num_products=1, demand_range=(0, 5), unmet_demand_cost=1000,
                 exceeded_stock_capacity_cost=1000, exceeded_process_capacity_cost=1000,
                 exceeded_ship_capacity_cost=1000, processing_ratio=2,
                 stochastic_leadtimes=False, avg_leadtime=2, max_leadtime=2,
                 total_time_steps=360, seed=None, build_info=False, **kw):
        super().__init__(_linear_nodes(num_products=num_products),
                         num_products=num_products, demand_range=demand_range,
                         unmet_demand_cost=unmet_demand_cost,
                         exceeded_stock_capacity_cost=exceeded_stock_capacity_cost,
                         exceeded_process_capacity_cost=exceeded_process_capacity_cost,
                         exceeded_ship_capacity_cost=exceeded_ship_capacity_cost,
                         processing_ratio=processing_ratio,
                         stochastic_leadtimes=stochastic_leadtimes,
                         avg_leadtime=avg_leadtime, max_leadtime=max_leadtime,
                         total_time_steps=total_time_steps, seed=seed,
                         build_info=build_info, **kw)


class SupplyChainOneOneNEnv(SupplyChainEnv):
    """README's ``supplychain-oneonen-v0``: one supplier, one factory, one
    wholesaler fanning out to N retailers."""

    def __init__(self, num_retailers=2, num_products=1, demand_range=(10, 20),
                 initial_stock=10, stock_capacity=600, stock_cost=1, dest_cost=2,
                 supply_cost=5, supply_capacity=150, processing_cost=10,
                 processing_capacity=300, ship_capacity=300, processing_ratio=3,
                 unmet_demand_cost=1000, exceeded_stock_capacity_cost=1000,
                 exceeded_process_capacity_cost=1000, exceeded_ship_capacity_cost=1000,
                 stochastic_leadtimes=False, avg_leadtime=2, max_leadtime=2,
                 total_time_steps=360, seed=None, build_info=False, **kw):
        retailers = [f'Retailer{i + 1}' for i in range(num_retailers)]
        nodes_info = {
            'Supplier': {'initial_stock': initial_stock, 'stock_capacity': stock_capacity,
                         'stock_cost': stock_cost, 'supply_capacity': supply_capacity,
                         'supply_cost': supply_cost, 'destinations': ['Factory'],
                         'dest_costs': [[dest_cost]] * num_products,
                         'ship_capacity': [ship_capacity]},
            'Factory': {'initial_stock': initial_stock, 'stock_capacity': stock_capacity,
                        'stock_cost': stock_cost, 'processing_capacity': processing_capacity,
                        'processing_cost': processing_cost, 'destinations': ['Wholesal'],
                        'dest_costs': [[dest_cost]] * num_products,
                        'ship_capacity': [ship_capacity]},
            'Wholesal': {'initial_stock': initial_stock, 'stock_capacity': stock_capacity,
                         'stock_cost': stock_cost, 'destinations': retailers,
                         'dest_costs': [[dest_cost] * num_retailers] * num_products,
                         'ship_capacity': [ship_capacity] * num_retailers},
        }
        for r in retailers:
            nodes_info[r] = {'initial_stock': initial_stock,
                             'stock_capacity': stock_capacity,
                             'stock_cost': stock_cost, 'last_level': True}
        super().__init__(nodes_info, num_products=num_products,
                         demand_range=demand_range,
                         unmet_demand_cost=unmet_demand_cost,
                         exceeded_stock_capacity_cost=exceeded_stock_capacity_cost,
                         exceeded_process_capacity_cost=exceeded_process_capacity_cost,
                         exceeded_ship_capacity_cost=exceeded_ship_capacity_cost,
                         processing_ratio=processing_ratio,
                         stochastic_leadtimes=stochastic_leadtimes,
                         avg_leadtime=avg_leadtime, max_leadtime=max_leadtime,
                         total_time_steps=total_time_steps, seed=seed,
                         build_info=build_info, **kw)


class SupplyChainNtoMEnv(SupplyChainEnv):
    """README's ``supplychain-ntom-v0``: the 2-2-2-2 full-bipartite graph of
    the reference __main__ demo (supplychain_env.py:815-875), with its derived
    cost structure."""

    def __init__(self, num_products=1, demand_range=(10, 20), stock_capacity=300,
                 ship_capacity=300, supply_capacity=50, processing_capacity=50,
                 processing_ratio=3, stochastic_leadtimes=True, avg_leadtime=2,
                 max_leadtime=4, stock_cost=1, total_time_steps=360, seed=None,
                 build_info=False, **kw):
        dest_cost = 2 * stock_cost
        supply_cost = 5 * stock_cost
        processing_cost = 2 * supply_cost
        product_cost = supply_cost + 3 * avg_leadtime * dest_cost + processing_cost
        unmet_demand_cost = 2 * product_cost
        exceeded_capacity_cost = 10 * stock_cost
        nodes_info = {}
        for i, stock0 in (('1', 10), ('2', 0)):
            nodes_info[f'Supplier {i}'] = {
                'initial_stock': stock0, 'stock_capacity': stock_capacity,
                'stock_cost': stock_cost, 'supply_capacity': supply_capacity,
                'supply_cost': supply_cost,
                'destinations': ['Factory  1', 'Factory  2'],
                'dest_costs': [[dest_cost] * 2] * num_products,
                'ship_capacity': [ship_capacity] * 2}
        for i in ('1', '2'):
            nodes_info[f'Factory  {i}'] = {
                'initial_stock': 0, 'stock_capacity': stock_capacity,
                'stock_cost': stock_cost, 'processing_capacity': processing_capacity,
                'processing_cost': processing_cost,
                'destinations': ['Wholesal 1', 'Wholesal 2'],
                'dest_costs': [[dest_cost] * 2] * num_products,
                'ship_capacity': [ship_capacity] * 2}
        for i, stock0 in (('1', 10), ('2', 15)):
            nodes_info[f'Wholesal {i}'] = {
                'initial_stock': stock0, 'stock_capacity': stock_capacity,
                'stock_cost': stock_cost,
                'destinations': ['Retailer 1', 'Retailer 2'],
                'dest_costs': [[dest_cost] * 2] * num_products,
                'ship_capacity': [ship_capacity] * 2}
        for i, stock0 in (('1', 10), ('2', 20)):
            nodes_info[f'Retailer {i}'] = {
                'initial_stock': stock0, 'stock_capacity': stock_capacity,
                'stock_cost': stock_cost, 'last_level': True}
        super().__init__(nodes_info, num_products=num_products,
                         demand_range=demand_range,
                         unmet_demand_cost=unmet_demand_cost,
                         exceeded_stock_capacity_cost=exceeded_capacity_cost,
                         exceeded_process_capacity_cost=exceeded_capacity_cost,
                         exceeded_ship_capacity_cost=exceeded_capacity_cost,
                         processing_ratio=processing_ratio,
                         stochastic_leadtimes=stochastic_leadtimes,
                         avg_leadtime=avg_leadtime, max_leadtime=max_leadtime,
                         total_time_steps=total_time_steps, seed=seed,
                         build_info=build_info, **kw)
