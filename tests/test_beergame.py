"""Beer game kernel tests.

The reference ships NO beer game tests (SURVEY.md §4), so these are new: a
hand-computed classic first week, plus full-trajectory comparison against a
straight-line NumPy oracle transcribing the documented 6-phase week update
(beergame_env.py:66-138 / beergame2_env.py:114-192).
"""
import numpy as np

from gym_supplychain_tpu.envs.beergame import BeerGameEnv, BeerGameEnv2


def _oracle(levels, demand, delays, initial_inventory, init_ship, init_orders,
            inv_cost, backlog_cost, actions, v2=False, max_stock=0, pen=0):
    """NumPy reference of the week update; returns (obs, reward) lists."""
    W = len(demand) + int(np.max(delays)) + 2
    inventory = np.array(initial_inventory, dtype=int).copy()
    backlog = np.zeros(levels, int)
    orders_placed = np.full(levels, init_orders)
    shipments = np.zeros((W, levels), int)
    shipments[1:1 + delays[0]][:] = init_ship
    out = []
    for week in range(1, len(demand) + 1):
        inventory = inventory + shipments[week]
        incoming = np.concatenate([[demand[week - 1]], orders_placed[:-1]])
        orders_to_fill = incoming + backlog
        to_deliver = np.minimum(inventory, orders_to_fill)
        if delays[week] == 0:
            inventory[:-1] += to_deliver[1:]
        else:
            shipments[week + delays[week]][:-1] += to_deliver[1:]
        inventory = inventory - to_deliver
        backlog = orders_to_fill - to_deliver
        if delays[week] == 0:
            inventory[-1] += orders_placed[-1]
        else:
            shipments[week + delays[week]][-1] += orders_placed[-1]
        orders_placed = (incoming + actions[week - 1]) if not v2 \
            else np.array(actions[week - 1])
        reward = -np.sum(inv_cost * inventory + backlog_cost * backlog)
        obs = inventory - backlog
        if v2:
            exceeded = (np.clip(inventory - max_stock, 0, None)
                        + np.clip(backlog - max_stock, 0, None))
            reward += -np.sum(pen * exceeded)
            obs = max_stock + inventory - backlog
        out.append((obs.copy(), int(reward)))
    return out


def test_classic_first_week():
    env = BeerGameEnv()
    obs = env.reset()
    assert np.array_equal(obs, [12, 12, 12, 12])
    obs, reward, done, _ = env.step(np.zeros(4, int))
    assert np.array_equal(obs, [12, 12, 12, 12])
    assert reward == -48
    assert not done


def test_v0_matches_oracle_default():
    rng = np.random.RandomState(0)
    actions = rng.randint(0, 8, size=(35, 4))
    env = BeerGameEnv()
    obs = env.reset()
    expected = _oracle(4, [4] * 4 + [8] * 31, [2] * 36, [12] * 4, 4, 4, 1, 2,
                       actions)
    for k in range(35):
        obs, reward, done, _ = env.step(actions[k])
        eobs, erew = expected[k]
        assert np.array_equal(obs, eobs), f"week {k + 1}"
        assert reward == erew
    assert done


def test_v0_zero_delay_and_custom():
    """Per-week delays including 0 (immediate delivery, beergame_env.py:93-96)."""
    demand = [5, 3, 7, 2, 6, 8, 1, 4]
    delays = [0, 1, 2, 0, 3, 1, 0, 2]
    info = {'customer_demand': demand, 'shipment_delays': delays,
            'initial_inventory': [10, 8, 6, 4], 'inv_cost': 2, 'backlog_cost': 3,
            'initial_shipment_value': 3, 'initial_orders_value': 2}
    env = BeerGameEnv(info)
    env.reset()
    rng = np.random.RandomState(1)
    actions = rng.randint(0, 6, size=(8, 4))
    expected = _oracle(4, demand, [2] + delays, [10, 8, 6, 4], 3, 2, 2, 3,
                       actions)
    for k in range(8):
        obs, reward, done, _ = env.step(actions[k])
        eobs, erew = expected[k]
        assert np.array_equal(obs, eobs), f"week {k + 1}"
        assert reward == erew
    assert done


def test_v2_matches_oracle():
    env = BeerGameEnv2(max_stock=20, exceeded_capacity_penalty=7)
    obs = env.reset()
    assert np.array_equal(obs, [32, 32, 32, 32])
    rng = np.random.RandomState(2)
    actions = rng.randint(0, 30, size=(35, 4))
    expected = _oracle(4, [4] * 4 + [8] * 31, [2] * 36, [12] * 4, 4, 4, 1, 2,
                       actions, v2=True, max_stock=20, pen=7)
    for k in range(35):
        obs, reward, done, _ = env.step(actions[k])
        eobs, erew = expected[k]
        assert np.array_equal(obs, eobs), f"week {k + 1}"
        assert reward == erew
    assert done


def test_v2_stochastic_ranges():
    """Stochastic demand/delays drawn per reset from randint ranges with a
    prepended delay 2 (beergame2_env.py:41-58, :87-92)."""
    env = BeerGameEnv2(customer_demand=(2, 10), shipment_delays=(1, 4), seed=5)
    env.reset()
    rs = np.random.RandomState(5)
    exp_demand = rs.randint(2, 10, size=35)
    exp_delays = np.insert(rs.randint(1, 4, size=35), 0, 2)
    assert np.array_equal(env.customer_demand, exp_demand)
    assert np.array_equal(env.shipment_delays, exp_delays)

    rng = np.random.RandomState(3)
    actions = rng.randint(0, 30, size=(35, 4))
    expected = _oracle(4, exp_demand, exp_delays, [12] * 4, 4, 4, 1, 2,
                       actions, v2=True, max_stock=100, pen=100)
    for k in range(35):
        obs, reward, done, _ = env.step(actions[k])
        eobs, erew = expected[k]
        assert np.array_equal(obs, eobs), f"week {k + 1}"
        assert reward == erew

    # consecutive episode continues the stream
    env.reset()
    exp_demand2 = rs.randint(2, 10, size=35)
    exp_delays2 = np.insert(rs.randint(1, 4, size=35), 0, 2)
    assert np.array_equal(env.customer_demand, exp_demand2)
    assert np.array_equal(env.shipment_delays, exp_delays2)


def test_multidiscrete_sampler():
    space = BeerGameEnv2().action_space
    space.seed(0)
    s = space.sample()
    assert s.shape == (4,) and (s >= 0).all() and (s < 30).all()
    space.seed(0)
    assert np.array_equal(s, space.sample())
