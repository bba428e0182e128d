"""Fused multi-head self-attention for short sequences (the ViT hot path).

Profiling the flagship train step (tools/profile_step.py) shows the ViT's
50-token attention dominating: XLA materializes (B,T,H,D) <-> (B,H,T,S)
transposes around every batched matmul — ~110 ms/step of pure "data
formatting" plus ~100 ms of tiny (50x64) matmuls at B*T*H ~ 24k.

This kernel keeps everything in the natural (B, T, H*D) layout: one grid
program per block of frames loads q/k/v once into VMEM, loops the heads with
in-register lane slices, runs f32 softmax (+ optional hardware-PRNG dropout
on the weights), and writes the output back in the same layout — zero
HBM-level transposes. The backward pass is a second kernel that recomputes
the weights (and the identical dropout mask from the same seed) and produces
dq/dk/dv in one pass — the flash-attention recompute trade, specialized for
sequences short enough to hold (T, T) scores per head in registers.

No mask support: the ViT is bidirectional. Sequence length is padded to a
multiple of 8 in the kernel; padded key columns are masked with -inf scores.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _head_attention(q, k, v, t_real, sm_scale, dropout_rate, bits):
    """One head: q,k,v (Tp, D) f32 -> (Tp, D) f32. Static shapes."""
    t_pad = q.shape[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    if t_real < t_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < t_real, scores, _NEG)
    weights = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0:
        threshold = min(int(dropout_rate * (2 ** 32)), 2 ** 32 - 1)
        keep = bits >= jnp.uint32(threshold)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    out = jax.lax.dot_general(
        weights, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out, weights


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, num_heads,
                head_dim, t_real, dropout_rate, block_b):
    sm_scale = 1.0 / (head_dim ** 0.5)
    t_pad = q_ref.shape[1]
    for b in range(block_b):
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            q = q_ref[b, :, sl].astype(jnp.float32)
            k = k_ref[b, :, sl].astype(jnp.float32)
            v = v_ref[b, :, sl].astype(jnp.float32)
            bits = None
            if dropout_rate > 0.0:
                pltpu.prng_seed(seed_ref[0],
                                pl.program_id(0) * block_b + b, h)
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits((t_pad, t_pad)), jnp.uint32)
            out, _ = _head_attention(q, k, v, t_real, sm_scale,
                                     dropout_rate, bits)
            o_ref[b, :, sl] = out.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, num_heads, head_dim, t_real,
                dropout_rate, block_b):
    sm_scale = 1.0 / (head_dim ** 0.5)
    t_pad = q_ref.shape[1]
    inv_keep = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
    for b in range(block_b):
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            q = q_ref[b, :, sl].astype(jnp.float32)
            k = k_ref[b, :, sl].astype(jnp.float32)
            v = v_ref[b, :, sl].astype(jnp.float32)
            g = g_ref[b, :, sl].astype(jnp.float32)
            bits = None
            keep = None
            if dropout_rate > 0.0:
                pltpu.prng_seed(seed_ref[0],
                                pl.program_id(0) * block_b + b, h)
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits((t_pad, t_pad)), jnp.uint32)
            _, weights = _head_attention(q, k, v, t_real, sm_scale, 0.0, None)
            if dropout_rate > 0.0:
                threshold = min(int(dropout_rate * (2 ** 32)), 2 ** 32 - 1)
                keep = bits >= jnp.uint32(threshold)
                dropped = jnp.where(keep, weights * inv_keep, 0.0)
            else:
                dropped = weights

            # dv = dropped^T @ g
            dv = jax.lax.dot_general(
                dropped, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # d(dropped) = g @ v^T ; undo dropout -> dw
            d_dropped = jax.lax.dot_general(
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if dropout_rate > 0.0:
                dw = jnp.where(keep, d_dropped * inv_keep, 0.0)
            else:
                dw = d_dropped
            # softmax backward: ds = w * (dw - sum(dw * w))
            ds = weights * (dw - jnp.sum(dw * weights, axis=-1,
                                         keepdims=True))
            ds = ds * sm_scale
            dq = jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq_ref[b, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[b, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[b, :, sl] = dv.astype(dv_ref.dtype)


def _pad_t(x, t_pad):
    t = x.shape[1]
    if t == t_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))


def _specs(block_b, t_pad, hd):
    data = pl.BlockSpec((block_b, t_pad, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return seed, data


def _choose_block_b(b: int) -> int:
    for cand in (8, 4, 2, 1):
        if b % cand == 0:
            return cand
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def mhsa_short(q, k, v, seed, num_heads: int, dropout_rate: float = 0.0,
               interpret: Optional[bool] = None):
    """Fused bidirectional MHSA: q,k,v (B, T, H*D) -> (B, T, H*D).

    seed: scalar int32 (ignored when dropout_rate == 0).
    """
    out, _ = _mhsa_fwd_impl(q, k, v, seed, num_heads, dropout_rate, interpret)
    return out


def _mhsa_fwd_impl(q, k, v, seed, num_heads, dropout_rate, interpret):
    b, t, hd = q.shape
    head_dim = hd // num_heads
    t_pad = _round8(t)
    block_b = _choose_block_b(b)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qp, kp, vp = (_pad_t(x, t_pad) for x in (q, k, v))
    seed_arr = jnp.reshape(seed, (1,)).astype(jnp.int32)
    seed_spec, data_spec = _specs(block_b, t_pad, hd)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads,
                          head_dim=head_dim, t_real=t,
                          dropout_rate=dropout_rate, block_b=block_b),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, hd), q.dtype),
        grid=(b // block_b,),
        in_specs=[seed_spec, data_spec, data_spec, data_spec],
        out_specs=data_spec,
        interpret=interpret,
    )(seed_arr, qp, kp, vp)
    return out[:, :t], (q, k, v, seed)


def _mhsa_fwd(q, k, v, seed, num_heads, dropout_rate, interpret):
    return _mhsa_fwd_impl(q, k, v, seed, num_heads, dropout_rate, interpret)


def _mhsa_bwd(num_heads, dropout_rate, interpret, residuals, g):
    q, k, v, seed = residuals
    b, t, hd = q.shape
    head_dim = hd // num_heads
    t_pad = _round8(t)
    block_b = _choose_block_b(b)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qp, kp, vp = (_pad_t(x, t_pad) for x in (q, k, v))
    gp = _pad_t(g, t_pad)
    seed_arr = jnp.reshape(seed, (1,)).astype(jnp.int32)
    seed_spec, data_spec = _specs(block_b, t_pad, hd)
    shape = jax.ShapeDtypeStruct((b, t_pad, hd), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads,
                          head_dim=head_dim, t_real=t,
                          dropout_rate=dropout_rate, block_b=block_b),
        out_shape=(shape, shape, shape),
        grid=(b // block_b,),
        in_specs=[seed_spec, data_spec, data_spec, data_spec, data_spec],
        out_specs=(data_spec, data_spec, data_spec),
        interpret=interpret,
    )(seed_arr, qp, kp, vp, gp)
    return dq[:, :t], dk[:, :t], dv[:, :t], None


mhsa_short.defvjp(_mhsa_fwd, _mhsa_bwd)
