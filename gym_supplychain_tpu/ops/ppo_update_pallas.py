"""Fused clipped-PPO update kernel: forward + loss + backward in one pass.

The PPO update phase is the throughput wall of the trainer (VERDICT r3
item 3): XLA materializes every [H, M] trunk activation to HBM between the
forward and backward passes, so at the fused trainer's M = 256k samples the
2-epoch update moves ~3 GB of activations per iteration and runs at
~15-27 TFLOP/s — 8.8 ms of the 9.3 ms iteration.  This kernel computes the
whole loss gradient in ONE Pallas pass over sample tiles: each grid step
loads an [X, Mt] tile of the flattened trajectory, runs the actor+critic
forward, the clipped-PPO loss math, and the hand-derived backward entirely
in VMEM, and accumulates parameter gradients in VMEM scratch — activation
traffic drops from O(H * M) HBM round-trips to the obs/action tiles alone,
leaving the MXU matmuls as the cost.

The loss is exactly ``learn/ppo.py::_make_cont_loss`` (clipped surrogate +
value MSE + entropy bonus estimated as -E[logp] + pre-tanh L2), and the
gradients are asserted against ``jax.value_and_grad`` of that loss by
tests/test_ppo_update_pallas.py (interpret mode, f32) and on-device by the
deployed trainer's parity test.  ``compute_dtype=bfloat16`` casts the
matmul operands only (f32 accumulation and loss math), matching the
learner_dtype trunk of the XLA path — the learner has no env-parity
obligation (docs/TRAINING.md).

Weight layout follows ``_flat_actor_critic`` (supplychain_pallas.py):
actor trunk (W, b) pairs + mu head, critic trunk + v head, log_std.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_ppo_update_grads"]

_LOG_STD_MIN, _LOG_STD_MAX = -5.0, 2.0


def _softplus(x):
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def make_ppo_update_grads(obs_dim: int, act_dim: int, hidden, M: int,
                          clip: float = 0.2, vf_coef: float = 0.5,
                          ent_coef: float = 1e-3, pre_tanh_reg: float = 1e-3,
                          tile: int = 4096, compute_dtype=None,
                          interpret: bool = False):
    """Build ``grads(params, obs, pre, old_logp, adv, ret) -> (loss, grads)``.

    ``params`` is the ``init_actor_critic`` dict; data is sample-trailing
    ([obs_dim, M], [act_dim, M], [M], [M], [M]; advantages pre-normalized
    as in ``_flatten_traj``).  Returns the scalar loss and a gradient
    pytree matching ``params``.
    """
    O, A, H = obs_dim, act_dim, tuple(hidden)
    nL = len(H)
    Mt = min(tile, M)
    if M % Mt:
        raise ValueError(f"M={M} not divisible by tile={Mt}")
    nT = M // Mt
    f32 = jnp.float32
    cdt = compute_dtype

    def _c(x):
        return x.astype(cdt) if cdt is not None else x

    def _dot(a, b):
        """a [r, k] @ b [k, c] -> f32 [r, c] (operands in compute dtype)."""
        return jax.lax.dot(_c(a), _c(b), preferred_element_type=f32)

    def _dot_nt(a, b):
        """a [r, m] @ b[c, m]^T -> f32 [r, c] (contract the sample axis)."""
        return jax.lax.dot_general(
            _c(a), _c(b), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    def _dot_tn(a, b):
        """a[k, r]^T @ b [k, m] -> f32 [r, m] (contract the row axis)."""
        return jax.lax.dot_general(
            _c(a), _c(b), (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    # flat weight layout (supplychain_pallas._flat_actor_critic):
    # actor (W,b)*nL + mu (W,b), critic (W,b)*nL + v (W,b), log_std
    n_w = 4 * nL + 5

    def _kernel(*refs):
        w_refs = refs[:n_w]
        obs_ref, pre_ref, oldlp_ref, adv_ref, ret_ref = refs[n_w:n_w + 5]
        out_refs = refs[n_w + 5:n_w + 5 + n_w]
        loss_ref = refs[n_w + 5 + n_w]
        acc_refs = refs[n_w + 5 + n_w + 1:]

        ti = pl.program_id(0)

        @pl.when(ti == 0)
        def _zero():
            for acc in acc_refs:
                acc[...] = jnp.zeros(acc.shape, f32)
            loss_ref[0] = 0.0

        aw = [w_refs[2 * i][...] for i in range(nL + 1)]
        ab = [w_refs[2 * i + 1][...] for i in range(nL + 1)]
        cw = [w_refs[2 * (nL + 1) + 2 * i][...] for i in range(nL + 1)]
        cb = [w_refs[2 * (nL + 1) + 2 * i + 1][...] for i in range(nL + 1)]
        log_std_p = w_refs[n_w - 1][...]                     # [A, 1]

        obs = obs_ref[...]                                   # [O, Mt]
        pre = pre_ref[...]                                   # [A, Mt]
        old_logp = oldlp_ref[0]                              # [Mt]
        adv = adv_ref[0]
        ret = ret_ref[0]

        # ---- forward --------------------------------------------------
        a_acts = [obs]
        x = obs
        for i in range(nL):
            x = jnp.tanh(_dot(aw[i], x) + ab[i])
            a_acts.append(x)
        mu = _dot(aw[nL], x) + ab[nL]                        # [A, Mt]
        c_acts = [obs]
        x = obs
        for i in range(nL):
            x = jnp.tanh(_dot(cw[i], x) + cb[i])
            c_acts.append(x)
        v = (_dot(cw[nL], x) + cb[nL])[0]                    # [Mt]

        ls = jnp.clip(log_std_p, _LOG_STD_MIN, _LOG_STD_MAX)  # [A, 1]
        std = jnp.exp(ls)
        z = (pre - mu) / std                                 # [A, Mt]
        g = -0.5 * (z * z + 2 * ls + math.log(2 * math.pi))
        corr = 2 * (math.log(2.0) - pre - _softplus(-2.0 * pre))
        logp = (g - corr).sum(axis=0)                        # [Mt]

        ratio = jnp.exp(logp - old_logp)
        lo, hi = 1.0 - clip, 1.0 + clip
        u = ratio * adv
        w = jnp.clip(ratio, lo, hi) * adv
        pg_i = -jnp.minimum(u, w)
        vres = v - ret
        part = (pg_i.sum() / M
                + vf_coef * 0.5 * (vres * vres).sum() / M
                + ent_coef * logp.sum() / M
                + pre_tanh_reg * (mu * mu).sum() / (A * M))
        loss_ref[0] += part

        # ---- backward -------------------------------------------------
        # d loss / d logp: clipped-surrogate branch + entropy bonus
        inside = (ratio > lo) & (ratio < hi)
        sel_adv = jnp.where(u <= w, adv, jnp.where(inside, adv, 0.0))
        dlogp = (-sel_adv * ratio + ent_coef) * (1.0 / M)    # [Mt]

        # actor head: d logp / d mu = z / std; + pre-tanh L2 reg
        dmu = (dlogp[None, :] * z / std
               + (2.0 * pre_tanh_reg / (A * M)) * mu)        # [A, Mt]
        # log_std (clip gate): d g_k / d ls_k = z^2 - 1
        ls_gate = ((log_std_p > _LOG_STD_MIN)
                   & (log_std_p < _LOG_STD_MAX)).astype(f32)
        dls = (dlogp[None, :] * (z * z - 1.0)).sum(
            axis=1, keepdims=True) * ls_gate                 # [A, 1]
        acc_refs[n_w - 1][...] += dls

        # actor backprop
        dy = dmu
        for i in range(nL, 0, -1):
            acc_refs[2 * i][...] += _dot_nt(dy, a_acts[i])
            acc_refs[2 * i + 1][...] += dy.sum(axis=1, keepdims=True)
            da = _dot_tn(aw[i], dy)
            ai = a_acts[i]
            dy = da * (1.0 - ai * ai)
        acc_refs[0][...] += _dot_nt(dy, a_acts[0])
        acc_refs[1][...] += dy.sum(axis=1, keepdims=True)

        # critic backprop
        dv = ((vf_coef / M) * vres)[None, :]                 # [1, Mt]
        base = 2 * (nL + 1)
        dy = dv
        for i in range(nL, 0, -1):
            acc_refs[base + 2 * i][...] += _dot_nt(dy, c_acts[i])
            acc_refs[base + 2 * i + 1][...] += dy.sum(axis=1, keepdims=True)
            dc = _dot_tn(cw[i], dy)
            ci = c_acts[i]
            dy = dc * (1.0 - ci * ci)
        acc_refs[base][...] += _dot_nt(dy, c_acts[0])
        acc_refs[base + 1][...] += dy.sum(axis=1, keepdims=True)

        @pl.when(ti == nT - 1)
        def _emit():
            for out, acc in zip(out_refs, acc_refs):
                out[...] = acc[...]

    # ---- pallas_call plumbing -----------------------------------------
    dims = []
    n_in = O
    for h in H:
        dims += [(h, n_in), (h, 1)]
        n_in = h
    dims += [(A, n_in), (A, 1)]
    # critic mirrors the actor trunk with a 1-dim head
    c_dims = []
    n_in = O
    for h in H:
        c_dims += [(h, n_in), (h, 1)]
        n_in = h
    c_dims += [(1, n_in), (1, 1)]
    all_dims = dims + c_dims + [(A, 1)]
    assert len(all_dims) == n_w

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_w)]
    in_specs += [
        pl.BlockSpec((O, Mt), lambda t: (0, t)),
        pl.BlockSpec((A, Mt), lambda t: (0, t)),
        pl.BlockSpec((1, Mt), lambda t: (0, t)),
        pl.BlockSpec((1, Mt), lambda t: (0, t)),
        pl.BlockSpec((1, Mt), lambda t: (0, t)),
    ]
    out_shapes = ([jax.ShapeDtypeStruct(d, f32) for d in all_dims]
                  + [jax.ShapeDtypeStruct((1,), f32)])
    out_specs = ([pl.BlockSpec(memory_space=pltpu.VMEM)
                  for _ in range(n_w)]
                 + [pl.BlockSpec(memory_space=pltpu.SMEM)])
    scratch = [pltpu.VMEM(d, f32) for d in all_dims]
    params = (None if interpret else
              pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024))

    call = pl.pallas_call(
        _kernel,
        grid=(nT,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )

    def _flat(params):
        flat = []
        for layer in params["actor"]:
            flat += [jnp.asarray(layer["w"], f32),
                     jnp.asarray(layer["b"], f32)]
        flat += [jnp.asarray(params["mu"]["w"], f32),
                 jnp.asarray(params["mu"]["b"], f32)]
        for layer in params["critic"]:
            flat += [jnp.asarray(layer["w"], f32),
                     jnp.asarray(layer["b"], f32)]
        flat += [jnp.asarray(params["v"]["w"], f32),
                 jnp.asarray(params["v"]["b"], f32),
                 jnp.asarray(params["log_std"], f32)]
        assert len(flat) == n_w
        return flat

    def _unflat(flat):
        g = {"actor": [], "critic": []}
        i = 0
        for _ in range(nL):
            g["actor"].append({"w": flat[i], "b": flat[i + 1]})
            i += 2
        g["mu"] = {"w": flat[i], "b": flat[i + 1]}
        i += 2
        for _ in range(nL):
            g["critic"].append({"w": flat[i], "b": flat[i + 1]})
            i += 2
        g["v"] = {"w": flat[i], "b": flat[i + 1]}
        i += 2
        g["log_std"] = flat[i]
        return g

    def grads(params, obs, pre, old_logp, adv, ret):
        outs = call(*_flat(params),
                    jnp.asarray(obs, f32), jnp.asarray(pre, f32),
                    jnp.asarray(old_logp, f32).reshape(1, M),
                    jnp.asarray(adv, f32).reshape(1, M),
                    jnp.asarray(ret, f32).reshape(1, M))
        return outs[n_w][0], _unflat(list(outs[:n_w]))

    return grads
