"""Native C++ MT19937 batch generator: bit-exactness vs NumPy legacy streams."""
import numpy as np
import pytest

from gym_supplychain_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason=f"native lib unavailable: "
                                       f"{native.build_error()}")


def test_bit_exact_streams():
    """randint (32- and 64-bit ranges), normal (polar w/ cache), poisson
    (multiplication and PTRS) all match np.random.RandomState exactly,
    interleaved in one stream."""
    seeds = [0, 1, 5, 42, 12345, 4294967295]
    rng = native.NativeBatchRNG(seeds)
    got = [rng.randint(0, 6, 20), rng.normal(150, 10, 15),
           rng.poisson(1.0, 30), rng.randint(-15, 16, 10),
           rng.poisson(25.0, 10), rng.randint(0, 2 ** 40, 5),
           rng.randint(10, 21, 9), rng.normal(0, 20, 7)]
    for i, seed in enumerate(seeds):
        rs = np.random.RandomState(seed)
        exp = [rs.randint(0, 6, 20), rs.normal(150, 10, 15),
               rs.poisson(1.0, 30), rs.randint(-15, 16, 10),
               rs.poisson(25.0, 10), rs.randint(0, 2 ** 40, 5),
               rs.randint(10, 21, 9), rs.normal(0, 20, 7)]
        for g, e in zip(got, exp):
            np.testing.assert_array_equal(g[i], e)


def test_batch_host_rng_matches_single():
    """BatchHostRNG lane b == HostEpisodeRNG(seed=b), including stream
    continuation across consecutive episodes."""
    from gym_supplychain_tpu import compile_chain
    from gym_supplychain_tpu.rng.host import BatchHostRNG, HostEpisodeRNG
    from .utils import simple_chain

    cc = compile_chain(simple_chain(initial_stock=10, stock_capacity=100,
                                    supply_capacity=50, processing_capacity=100,
                                    ship_capacity=100),
                       demand_range=(0, 5), processing_ratio=2,
                       stochastic_leadtimes=True, avg_leadtime=2,
                       max_leadtime=4, total_time_steps=6)
    B = 5
    batch = BatchHostRNG(cc, list(range(B)))
    singles = [HostEpisodeRNG(cc, b) for b in range(B)]
    for episode in range(3):
        d, lt = batch.episode_tables()
        for b in range(B):
            ds, ls = singles[b].episode_tables()
            np.testing.assert_array_equal(d[..., b], ds)
            np.testing.assert_array_equal(lt[..., b], ls)


def test_batch_host_rng_seasonal():
    from gym_supplychain_tpu import SupplyChain2perStageSeasonalEnv
    from gym_supplychain_tpu.rng.host import BatchHostRNG, HostEpisodeRNG
    cc = SupplyChain2perStageSeasonalEnv(total_time_steps=12).cc
    batch = BatchHostRNG(cc, [7, 8])
    d, _ = batch.episode_tables()
    for i, s in enumerate((7, 8)):
        ds, _ = HostEpisodeRNG(cc, s).episode_tables()
        np.testing.assert_array_equal(d[..., i], ds)


def test_vec_env_host_lanes_mode():
    from gym_supplychain_tpu import SupplyChainEnv
    from gym_supplychain_tpu.envs.vector import VecSupplyChainEnv
    from .utils import simple_chain
    import jax.numpy as jnp

    nodes = simple_chain(initial_stock=10, stock_capacity=100,
                         supply_capacity=50, processing_capacity=100,
                         ship_capacity=100)
    kw = dict(demand_range=(0, 5), processing_ratio=2, total_time_steps=5)
    vec = VecSupplyChainEnv(nodes, batch_size=3, rng_mode="host-lanes",
                            seed=10, dtype=jnp.float64, **kw)
    vec.reset()
    a = np.full((vec.cc.A, 3), 0.2)
    rewards = np.zeros((3, 5))
    for t in range(5):
        out = vec.step(jnp.asarray(a))
        rewards[:, t] = np.asarray(out.reward)
    # lane b == single env seeded 10 + b
    for b in range(3):
        env = SupplyChainEnv(nodes, **kw)
        env.seed(10 + b)
        env.reset()
        for t in range(5):
            _, r, _, _ = env.step(a[:, b])
            assert np.allclose(r, rewards[b, t])
