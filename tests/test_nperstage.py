"""Ports of reference test_Nperstage.py golden episodic returns."""
import os

import numpy as np
import pytest

from gym_supplychain_tpu import SupplyChainNPerStage

FULL = bool(os.environ.get("GST_FULL"))


def _run_episode(env, seed=0, expected_rewards=None):
    env.seed(seed)
    env.reset()
    done = False
    rewards = 0.0
    while not done:
        _, reward, done, _ = env.step(env.action_space.sample())
        rewards += reward
    if expected_rewards:
        assert np.allclose(expected_rewards, rewards)


def test3perStage():
    _run_episode(SupplyChainNPerStage(nodes_per_echelon=3),
                 expected_rewards=-60038768.011493534)


def test3perStageSeasonalDemands():
    env = SupplyChainNPerStage(nodes_per_echelon=3, demand_std=60,
                               demand_sen_peaks=4, avg_demand_range=(100, 300),
                               demand_perturb_norm=True)
    _run_episode(env, expected_rewards=-57730855.89812181)


def test3perStage3Products():
    _run_episode(SupplyChainNPerStage(nodes_per_echelon=3, num_products=3),
                 expected_rewards=-88943757.80027954)


@pytest.mark.skipif(not FULL, reason="set GST_FULL=1 for the full golden sweep")
def test10perStage():
    _run_episode(SupplyChainNPerStage(nodes_per_echelon=10),
                 expected_rewards=-197097090.01279718)


def testChain_3_2_3_5():
    _run_episode(SupplyChainNPerStage(nodes_per_echelon=[3, 2, 3, 5]),
                 expected_rewards=-120404116.66453858)


@pytest.mark.skipif(not FULL, reason="set GST_FULL=1 for the full golden sweep")
def testChain_5_4_7_10():
    _run_episode(SupplyChainNPerStage(nodes_per_echelon=[5, 4, 7, 10]),
                 expected_rewards=-251255147.76827675)


@pytest.mark.skipif(not FULL, reason="set GST_FULL=1 for the full golden sweep")
def testChain_5_4_7_10_and_4products():
    _run_episode(SupplyChainNPerStage(nodes_per_echelon=[5, 4, 7, 10],
                                      num_products=4),
                 expected_rewards=-501101931.2484466)
