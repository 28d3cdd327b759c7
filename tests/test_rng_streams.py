"""RNG stream parity: demand/lead-time tables across consecutive episodes.

The reference pins MT19937 consumption order with .npy fixtures recorded over
10 seeds x 10 consecutive episodes (test_supplychain_env.py:207-285).  We
assert the same property against straight-line NumPy reference draws written
out inline (no fixture files needed): the engine's reset sequence must consume
the stream exactly as demands-then-leadtimes per episode, continuing across
episodes, and reproduce the reference's recorded seed-0 values.
"""
import numpy as np

from gym_supplychain_tpu import SupplyChain2perStageEnv, SupplyChainEnv
from .utils import simple_chain


def _simple_env(stochastic=False):
    return SupplyChainEnv(
        simple_chain(num_products=1, initial_stock=10, stock_capacity=100,
                     stock_cost=1, dest_cost=2, supply_cost=5, supply_capacity=50,
                     processing_cost=10, processing_capacity=100, ship_capacity=100),
        demand_range=(0, 5), processing_ratio=2, stochastic_leadtimes=stochastic,
        avg_leadtime=2, max_leadtime=4 if stochastic else 2, total_time_steps=5)


def test_demands_consecutive_episodes():
    """Engine tables == straight-line RandomState draws for 10 seeds x 5
    consecutive episodes (uniform demand)."""
    env = _simple_env()
    for seed in range(10):
        rs = np.random.RandomState(seed)
        env.seed(seed)
        for _ in range(5):
            env.reset()
            expected = rs.randint(0, 6, size=(6, 1, 1))
            assert np.array_equal(env.customer_demands, expected)


def test_leadtimes_consecutive_episodes():
    """Demands then Poisson lead-times per reset, stream continues across
    episodes (stochastic mode)."""
    env = _simple_env(stochastic=True)
    for seed in range(10):
        rs = np.random.RandomState(seed)
        env.seed(seed)
        for _ in range(5):
            env.reset()
            expected_d = rs.randint(0, 6, size=(6, 1, 1))
            expected_l = np.clip(1 + rs.poisson(lam=1, size=(5, 4)), 1, 4)
            assert np.array_equal(env.customer_demands, expected_d)
            assert np.array_equal(env.leadtimes, expected_l)


def test_2perstage_demand_stream():
    """2perstage uniform demand tables over consecutive episodes
    (reference test_supplychain_2perstage_env.py:172-188, fixture-free)."""
    env = SupplyChain2perStageEnv(total_time_steps=8)
    for seed in range(3):
        rs = np.random.RandomState(seed + 1)
        env.seed(seed + 1)
        for _ in range(3):
            env.reset()
            expected = rs.randint(10, 21, size=(9, 2, 1))
            assert np.array_equal(env.customer_demands, expected)


def test_seasonal_demand_stream():
    """Seasonal (sinusoidal + normal perturbation) demand parity against a
    straight-line NumPy transcription of demands_generator.py:51-89."""
    from gym_supplychain_tpu import SupplyChain2perStageSeasonalEnv
    env = SupplyChain2perStageSeasonalEnv(total_time_steps=12)
    T = 12
    for seed in (1, 5):
        rs = np.random.RandomState(seed)
        env.seed(seed)
        for _ in range(2):
            env.reset()
            perturb = rs.normal(0, 10, size=(T + 1, 2, 1))
            periods = np.arange(T + 1).reshape(-1, 1, 1)
            base = 150 + 50 * (1 + np.sin(4 * 2 * np.pi * periods / T))
            expected = np.rint(np.clip(base + perturb, 0, 400)).astype(int)
            assert np.array_equal(env.customer_demands, expected)


def test_action_space_sampler_fixed():
    """env.seed hard-seeds the action space with 0 (supplychain_env.py:813):
    two envs seeded differently still sample identical action streams."""
    e1, e2 = _simple_env(), _simple_env()
    e1.seed(3)
    e2.seed(99)
    for _ in range(5):
        assert np.array_equal(e1.action_space.sample(), e2.action_space.sample())
