"""Gymnasium integration: registration + 5-tuple adapter."""
import numpy as np
import pytest

gymnasium = pytest.importorskip("gymnasium")

from gym_supplychain_tpu.envs.gym_registry import register_gymnasium


def test_register_and_run():
    assert register_gymnasium()
    env = gymnasium.make("gym_supplychain_tpu/sc-2perstage-v0",
                         total_time_steps=3)
    obs, info = env.reset(seed=0)
    assert env.observation_space.contains(obs)
    terminated = False
    steps = 0
    while not terminated:
        obs, reward, terminated, truncated, info = env.step(
            env.action_space.sample())
        assert not truncated
        steps += 1
    assert steps == 3


def test_multidiscrete_spaces():
    register_gymnasium()
    env = gymnasium.make("gym_supplychain_tpu/beergame-v2")
    obs, _ = env.reset(seed=1)
    assert env.observation_space.contains(obs)
    obs, r, term, trunc, _ = env.step(env.action_space.sample())
    assert obs.dtype.kind == "i"


def test_vector_adapter():
    gymnasium = pytest.importorskip("gymnasium")
    from gym_supplychain_tpu.envs.gym_registry import GymnasiumVectorAdapter

    B = 8
    vec = GymnasiumVectorAdapter("supplychain-linear-v0", num_envs=B,
                                 total_time_steps=4)
    obs, info = vec.reset(seed=0)
    assert obs.shape == (B, vec.single_observation_space.shape[0])
    for t in range(5):       # crosses the T=4 auto-reset boundary
        a = np.zeros((B, vec.single_action_space.shape[0]), np.float32)
        obs, r, term, trunc, _ = vec.step(a)
        assert obs.shape[0] == B and r.shape == (B,)
        assert term.all() == (t == 3)
