"""Fused multi-head self-attention for short sequences (the ViT hot path).

Profiling the flagship train step (tools/profile_step.py) shows the ViT's
50-token attention dominating: XLA materializes (B,T,H,D) <-> (B,H,T,S)
transposes around every batched matmul (~110 ms/step of "data formatting")
and bounces (B,T,H,50,50) score/weight/mask tensors through HBM.

Kernel design: grid = (frame-blocks, heads) over (B, H, T, D) inputs (one
cheap XLA transpose each — vs the reference pattern of transposing around
EVERY batched matmul). BlockSpecs deliver contiguous per-head (bb, T, D)
slabs; inside the kernel one batched dot produces all (bb, T, T) scores,
softmax (+ optional hardware-PRNG dropout on the weights) runs in VMEM, and
a second batched dot writes the output slab — score/weight/mask tensors
never touch HBM. The backward kernel recomputes the weights and
the identical dropout mask (same seed) and emits dq/dk/dv in one pass — the
flash-attention recompute trade, specialized for sequences short enough to
hold (T, T) scores per head in VMEM.

No mask support: the ViT is bidirectional.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _batched_dot(a, b, contract_a, contract_b):
    """(bb, M, K) x (bb, N, K|K, N) batched matmul, f32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _weights_for(q, k, sm_scale):
    scores = _batched_dot(q, k, 2, 2) * sm_scale  # (bb, T, T)
    return jax.nn.softmax(scores, axis=-1)


def _dropout_bits(seed_ref, shape, head_stride):
    pltpu.prng_seed(seed_ref[0],
                    pl.program_id(0) * head_stride + pl.program_id(1))
    return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)


def _apply_dropout(weights, bits, dropout_rate):
    threshold = min(int(dropout_rate * (2 ** 32)), 2 ** 32 - 1)
    keep = bits >= jnp.uint32(threshold)
    return jnp.where(keep, weights / (1.0 - dropout_rate), 0.0), keep


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, head_dim,
                dropout_rate, num_heads):
    sm_scale = 1.0 / (head_dim ** 0.5)
    q = q_ref[:, 0].astype(jnp.float32)  # (bb, T, D)
    k = k_ref[:, 0].astype(jnp.float32)
    v = v_ref[:, 0].astype(jnp.float32)
    weights = _weights_for(q, k, sm_scale)
    if dropout_rate > 0.0:
        bits = _dropout_bits(seed_ref, weights.shape, num_heads)
        weights, _ = _apply_dropout(weights, bits, dropout_rate)
    out = _batched_dot(weights, v, 2, 1)  # (bb, T, D)
    o_ref[:, 0] = out.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, head_dim, dropout_rate,
                num_heads):
    sm_scale = 1.0 / (head_dim ** 0.5)
    q = q_ref[:, 0].astype(jnp.float32)
    k = k_ref[:, 0].astype(jnp.float32)
    v = v_ref[:, 0].astype(jnp.float32)
    g = g_ref[:, 0].astype(jnp.float32)

    weights = _weights_for(q, k, sm_scale)
    if dropout_rate > 0.0:
        bits = _dropout_bits(seed_ref, weights.shape, num_heads)
        dropped, keep = _apply_dropout(weights, bits, dropout_rate)
    else:
        dropped, keep = weights, None

    # dv = dropped^T @ g   (contract over T_query)
    dv = jax.lax.dot_general(
        dropped, g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    # d(dropped) = g @ v^T
    d_dropped = _batched_dot(g, v, 2, 2)
    if dropout_rate > 0.0:
        dw = jnp.where(keep, d_dropped / (1.0 - dropout_rate), 0.0)
    else:
        dw = d_dropped
    ds = weights * (dw - jnp.sum(dw * weights, axis=-1, keepdims=True))
    ds = ds * sm_scale
    dq = _batched_dot(ds, k, 2, 1)
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dq_ref[:, 0] = dq.astype(dq_ref.dtype)
    dk_ref[:, 0] = dk.astype(dk_ref.dtype)
    dv_ref[:, 0] = dv.astype(dv_ref.dtype)


def _choose_block_b(b: int) -> int:
    for cand in (8, 4, 2, 1):
        if b % cand == 0:
            return cand
    return 1


def _specs(block_b, t, head_dim):
    # (bb, 1, T, D) blocks: last two dims are the full array dims (legal
    # regardless of tiling), and each head slab is contiguous.
    data = pl.BlockSpec((block_b, 1, t, head_dim), lambda i, h: (i, h, 0, 0),
                        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return seed, data


def _as_heads(x, num_heads):
    """(B, T, H*D) -> (B, H, T, D): one transpose, amortized per kernel."""
    b, t, hd = x.shape
    return x.reshape(b, t, num_heads, hd // num_heads).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def mhsa_short(q, k, v, seed, num_heads: int, dropout_rate: float = 0.0,
               interpret: Optional[bool] = None):
    """Fused bidirectional MHSA: q,k,v (B, T, H*D) -> (B, T, H*D).

    seed: scalar int32 (ignored when dropout_rate == 0).
    """
    out, _ = _mhsa_fwd(q, k, v, seed, num_heads, dropout_rate, interpret)
    return out


def _mhsa_fwd(q, k, v, seed, num_heads, dropout_rate, interpret):
    b, t, hd = q.shape
    head_dim = hd // num_heads
    block_b = _choose_block_b(b)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    seed_arr = jnp.reshape(seed, (1,)).astype(jnp.int32)
    seed_spec, data_spec = _specs(block_b, t, head_dim)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, head_dim=head_dim,
                          dropout_rate=dropout_rate, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((b, num_heads, t, head_dim), q.dtype),
        grid=(b // block_b, num_heads),
        in_specs=[seed_spec, data_spec, data_spec, data_spec],
        out_specs=data_spec,
        interpret=interpret,
    )(seed_arr, _as_heads(q, num_heads), _as_heads(k, num_heads),
      _as_heads(v, num_heads))
    out = out.transpose(0, 2, 1, 3).reshape(b, t, hd)
    return out, (q, k, v, seed)


def _mhsa_bwd(num_heads, dropout_rate, interpret, residuals, g):
    q, k, v, seed = residuals
    b, t, hd = q.shape
    head_dim = hd // num_heads
    block_b = _choose_block_b(b)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    seed_arr = jnp.reshape(seed, (1,)).astype(jnp.int32)
    seed_spec, data_spec = _specs(block_b, t, head_dim)
    shape = jax.ShapeDtypeStruct((b, num_heads, t, head_dim), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, head_dim=head_dim,
                          dropout_rate=dropout_rate, num_heads=num_heads),
        out_shape=(shape, shape, shape),
        grid=(b // block_b, num_heads),
        in_specs=[seed_spec] + [data_spec] * 4,
        out_specs=(data_spec, data_spec, data_spec),
        interpret=interpret,
    )(seed_arr, _as_heads(q, num_heads), _as_heads(k, num_heads),
      _as_heads(v, num_heads), _as_heads(g, num_heads))
    merge = lambda x: x.transpose(0, 2, 1, 3).reshape(b, t, hd)  # noqa: E731
    return merge(dq), merge(dk), merge(dv), None


mhsa_short.defvjp(_mhsa_fwd, _mhsa_bwd)
