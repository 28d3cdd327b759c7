"""Vectorized batched environment: thousands of lockstep envs under jit.

This is the capability the reference lacks entirely (one env object = one
episode; SURVEY.md §2 "Data parallelism" row): a batched ``reset/step`` pair
with batched auto-reset and on-device PRNG episode streams, suitable for
``lax.scan`` rollouts and ``shard_map`` sharding over a device mesh.

All arrays keep the env batch as the trailing axis (TPU lanes).  Episodes are
fixed-length with no early termination (reference supplychain_env.py:742), so
the whole batch shares one clock and auto-reset is a single ``lax.cond``.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.compile import CompiledChain, compile_chain
from ..core.step import EnvState, StepOutput, make_supplychain_kernels
from ..rng.device import device_episode_tables
from ..rng.host import HostEpisodeRNG

__all__ = ["VecState", "make_vec_env", "VecSupplyChainEnv"]


class VecState(NamedTuple):
    key: jax.Array          # PRNG key driving episode streams (fast mode)
    env: EnvState


def make_vec_env(cc: CompiledChain, batch_size: int, dtype=jnp.float32):
    """Pure-functional batched env API over a compiled chain.

    Returns ``(init_fn, step_fn)``:
      ``init_fn(key) -> VecState``
      ``step_fn(state, action[A, B]) -> (VecState, StepOutput)`` with batched
      auto-reset: when the (shared) episode clock hits T, fresh on-device
      episode tables are drawn and the state is re-initialized; the terminal
      observation of the finished episode is replaced by the initial
      observation of the new one (standard vec-env auto-reset contract).
    """
    B = batch_size
    reset_k, step_k, obs_k = make_supplychain_kernels(cc, dtype=dtype)

    def _fresh(key) -> EnvState:
        demands, leadtimes = device_episode_tables(key, cc, B, dtype)
        return reset_k(demands, leadtimes, B)

    def init_fn(key) -> VecState:
        key, sub = jax.random.split(key)
        return VecState(key=key, env=_fresh(sub))

    def obs_fn(state: VecState):
        return obs_k(state.env)

    def step_fn(state: VecState, action) -> Tuple[VecState, StepOutput]:
        env, out = step_k(state.env, action)
        key, sub = jax.random.split(state.key)

        def do_reset(_):
            fresh = _fresh(sub)
            return fresh, obs_k(fresh)

        def no_reset(_):
            return env, out.obs

        env2, obs2 = jax.lax.cond(out.done, do_reset, no_reset, None)
        return (VecState(key=key, env=env2),
                out._replace(obs=obs2))

    return init_fn, step_fn, obs_fn


class VecSupplyChainEnv:
    """Object-style wrapper over the functional batched API.

    ``rng_mode='device'`` (default) draws episode tables on device;
    ``rng_mode='host'`` uses the MT19937 parity generator (each batch lane
    plays consecutive episodes of the single-env reference stream).
    """

    def __init__(self, nodes_info=None, batch_size: int = 1024, cc=None,
                 dtype=jnp.float32, rng_mode: str = "device", seed: int = 0,
                 **env_kwargs):
        if cc is None:
            cc = compile_chain(nodes_info, **env_kwargs)
        self.cc = cc
        self.B = batch_size
        self.dtype = dtype
        self.rng_mode = rng_mode
        self._init_fn, self._step_fn, self._obs_fn = make_vec_env(
            cc, batch_size, dtype)
        self._step_jit = jax.jit(self._step_fn)
        self._init_jit = jax.jit(self._init_fn)
        reset_k, _, obs_k = make_supplychain_kernels(cc, dtype=dtype)
        self._reset_k = jax.jit(reset_k, static_argnums=2)
        self._host_rng = HostEpisodeRNG(cc, seed)
        self._key = jax.random.PRNGKey(seed)
        self.state: Optional[VecState] = None

    def reset(self):
        if self.rng_mode == "device":
            self.state = self._init_jit(self._key)
        else:
            demands, leadtimes = self._host_rng.batch_tables(self.B)
            self.state = VecState(key=self._key,
                                  env=self._reset_k(demands, leadtimes, self.B))
        return self._obs_fn(self.state)

    def step(self, action):
        self.state, out = self._step_jit(self.state, action)
        return out

    @property
    def action_shape(self):
        return (self.cc.A, self.B)
