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


# ---------------------------------------------------------------------------
# Vectorized beer game v2 stochastic ranges (VERDICT r2 item 8)
# ---------------------------------------------------------------------------

def test_vec_beergame_v2_host_stream_parity():
    """VecBeerGameEnv host mode: lane b replays a single BeerGameEnv2 seeded
    ``seed + b`` bit-exactly, including the per-episode stochastic demand and
    delay draws (draw order beergame2_env.py:87-92), across two consecutive
    episodes of the same streams."""
    import jax
    import numpy as np
    from gym_supplychain_tpu.envs.vector import VecBeerGameEnv

    B, seed = 3, 11
    kw = dict(customer_demand=(0, 12), shipment_delays=(0, 4), max_stock=40,
              exceeded_capacity_penalty=37)
    vec = VecBeerGameEnv(batch_size=B, v2=True, rng_mode="host", seed=seed,
                         **kw)
    singles = [BeerGameEnv2(seed=seed + b, **kw) for b in range(B)]
    rs = np.random.RandomState(0)
    vec.reset()                             # episode 1 tables
    for ep in range(2):                     # consecutive episodes, one stream
        for b, env in enumerate(singles):
            env.reset()
            np.testing.assert_array_equal(vec.customer_demand[:, b],
                                          env.customer_demand)
            np.testing.assert_array_equal(vec.shipment_delays[:, b],
                                          env.shipment_delays)
        for w in range(vec.max_weeks):
            a = rs.randint(0, 20, size=(4, B))
            obs, reward, done = vec.step(a)
            obs, reward = jax.device_get((obs, reward))
            terminal = w == vec.max_weeks - 1
            for b, env in enumerate(singles):
                o, r, d, _ = env.step(a[:, b])
                # the vec env auto-resets at the boundary: the terminal
                # step's obs is the FRESH episode's initial observation
                # (checked via the table compare at the top of the next
                # episode); non-terminal obs must match bit-exactly
                if not terminal:
                    np.testing.assert_array_equal(obs[:, b], o)
                assert float(reward[b]) == float(r)
                assert bool(done) == bool(d)
    # the auto-resets consumed one more table set per lane than the singles;
    # one more singles reset must land on the same stream position
    for b, env in enumerate(singles):
        env.reset()
        np.testing.assert_array_equal(vec.customer_demand[:, b],
                                      env.customer_demand)
        np.testing.assert_array_equal(vec.shipment_delays[:, b],
                                      env.shipment_delays)


def test_vec_beergame_v2_device_stochastic_draws():
    """Device mode: per-lane tables are in-range, differ across lanes and
    across consecutive resets."""
    import numpy as np
    from gym_supplychain_tpu.envs.vector import VecBeerGameEnv

    vec = VecBeerGameEnv(batch_size=64, v2=True, customer_demand=(3, 9),
                         shipment_delays=(0, 4), seed=0)
    vec.reset()
    d1, l1 = vec.customer_demand, vec.shipment_delays
    assert d1.shape == (35, 64) and l1.shape == (36, 64)
    assert d1.min() >= 3 and d1.max() <= 8          # randint high exclusive
    assert l1[1:].min() >= 0 and l1[1:].max() <= 3
    np.testing.assert_array_equal(l1[0], 2)          # prepended initial delay
    assert not np.array_equal(d1[:, 0], d1[:, 1])    # lanes independent
    vec.reset()
    assert not np.array_equal(d1, vec.customer_demand)  # fresh per episode
    # all outcomes of the scripted ranges actually occur
    assert set(np.unique(d1)) == set(range(3, 9))
    assert set(np.unique(l1[1:])) == set(range(0, 4))


def test_beergame_ppo_stochastic_ranges_smoke():
    """make_beergame_ppo trains on the stochastic v2 variant: per-lane tables
    drawn at init and at every in-scan auto-reset; loss stays finite and the
    env state's tables change across the episode boundary."""
    import jax
    import numpy as np
    from gym_supplychain_tpu.learn.ppo import PPOConfig, make_beergame_ppo

    cfg = PPOConfig(rollout_steps=6, epochs=1, hidden=(16, 16),
                    rollout_unroll=1)
    init_fn, train_step = make_beergame_ppo(
        8, cfg, weeks=4, max_order=8, v2=True, customer_demand=(0, 12),
        shipment_delays=(0, 4), max_stock=40, exceeded_capacity_penalty=37)
    state = init_fn(jax.random.PRNGKey(0))
    d0 = np.asarray(state.env.customer_demand)
    assert d0.shape == (4, 8) and d0.min() >= 0 and d0.max() <= 11
    step_jit = jax.jit(train_step)
    state, metrics = step_jit(state)       # 6 steps > 4 weeks: crosses reset
    assert np.isfinite(float(metrics["loss"]))
    d1 = np.asarray(state.env.customer_demand)
    assert not np.array_equal(d0, d1), "auto-reset did not redraw tables"
    state, metrics = step_jit(state)
    assert np.isfinite(float(metrics["loss"]))
