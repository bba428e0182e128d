"""Fused multi-head self-attention for short sequences (the ViT hot path).

Profiling the flagship train step (tools/profile_step.py +
tools/analyze_trace.py) showed the ViT's 50-token attention dominating:
XLA materializes (B,T,H,D) <-> (B,H,T,S) transposes around every batched
matmul and bounces (B,H,50,50) score/weight/mask tensors through HBM.
A first kernel revision that still required XLA-side head transposes spent
~67 ms/step in them — HBM-level 4D transposes run far below bandwidth.

Kernel design (v4): grid over frame-blocks only; BlockSpecs deliver
(bb, T, H*D) slabs in the SAME layout the surrounding Dense layers
produce — H*D (1024) lanes tile exactly, so the XLA graph has neither
transposes nor retiling copies (the v3 kernel took (bb, T, H, D) blocks,
whose 64-lane minor dim pads to 128: XLA inserted a physical retiling
copy on every kernel boundary, ~40 ms/step of 'data formatting' in the
r2 trace). Inside VMEM the head axis is peeled with static lane slices
and restacked head-major along the untiled leading dim (the direct lane
split is an unsupported Mosaic shape cast); one batched dot then produces
all (H*bb, T, T) scores, f32 softmax (+ optional hardware-PRNG dropout)
runs in registers, and per-head static slices write the output back. The
backward kernel recomputes the weights and the identical dropout mask
(same seed) and emits dq/dk/dv in one pass — the flash-attention
recompute trade, specialized for sequences short enough to hold per-head
(T, T) scores in VMEM.

No mask support: the ViT is bidirectional.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videocad_tpu.ops.prng import keep_mask, require_seed


def _batched_dot(a, b, contract_a, contract_b):
    """(N, M, K) x (N, ...) batched matmul, f32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _to_heads(x_ref, num_heads, head_dim):
    """(bb, T, H*D) ref -> (H*bb, T, D) value, head-major, IO dtype.

    The HBM arrays stay in the natural (bb, T, H*D) layout — H*D (1024)
    lanes tile perfectly, whereas a host-side (bb, T, H, D) reshape pads
    D=64 to 128 lanes and XLA inserts a physical retiling copy on every
    kernel boundary (~40 ms/step of 'data formatting' in the r2 trace).
    The in-kernel lane split is an unsupported Mosaic shape cast, so the
    head axis is peeled with static lane slices and re-stacked along the
    (untiled) leading dim — head-major: slab row = h * bb + j.

    Values stay in the IO dtype: on the bf16 hot path every dot then runs
    as a single-pass bf16 MXU matmul with f32 accumulation (identical
    products — bf16 values are exact in f32 — where the r2-r3 kernels
    cast to f32 first and paid the multi-pass f32 MXU rate).
    """
    x = x_ref[:]
    return jnp.concatenate(
        [x[:, :, h * head_dim:(h + 1) * head_dim]
         for h in range(num_heads)], axis=0)


def _write_heads(o_ref, out, bb, num_heads, head_dim):
    """Store a head-major (H*bb, T, D) f32 value into a (bb, T, H*D) ref."""
    for h in range(num_heads):
        o_ref[:, :, h * head_dim:(h + 1) * head_dim] = (
            out[h * bb:(h + 1) * bb].astype(o_ref.dtype))


def _weights_for(q, k, sm_scale):
    return jax.nn.softmax(_batched_dot(q, k, 2, 2) * sm_scale, axis=-1)


def _dropout_bits(seed_ref, block_b, num_heads, t):
    """Block-size-invariant dropout bits for the head-major (H*block_b,
    T, T) weights slab.

    Seeded per ABSOLUTE batch row (seed, i*block_b + j), not per grid
    block: the forward and backward kernels choose different block_b at
    realistic shapes (their VMEM footprints differ), so any block-indexed
    stream would regenerate a different mask in the backward — silently
    wrong gradients. Per-row streams are identical for every legal block
    size; each row's (H, T, T) draw is reordered to the head-major slab
    with a leading-dims-only transpose (no lane movement).
    """
    base = pl.program_id(0) * block_b
    rows = []
    for j in range(block_b):
        pltpu.prng_seed(seed_ref[0], base + j)
        rows.append(pltpu.bitcast(
            pltpu.prng_random_bits((1, num_heads, t, t)), jnp.uint32))
    stack = (jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0])
    # (bb, H, t, t) -> head-major (H*bb, t, t)
    return stack.transpose(1, 0, 2, 3).reshape(num_heads * block_b, t, t)


def _apply_dropout(weights, bits, dropout_rate):
    keep = keep_mask(bits, dropout_rate)
    return jnp.where(keep, weights / (1.0 - dropout_rate), 0.0), keep


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, num_heads,
                head_dim, dropout_rate):
    sm_scale = 1.0 / (head_dim ** 0.5)
    bb = q_ref.shape[0]
    q = _to_heads(q_ref, num_heads, head_dim)
    k = _to_heads(k_ref, num_heads, head_dim)
    v = _to_heads(v_ref, num_heads, head_dim)
    weights = _weights_for(q, k, sm_scale)
    if dropout_rate > 0.0:
        bits = _dropout_bits(seed_ref, bb, num_heads, weights.shape[-1])
        weights, _ = _apply_dropout(weights, bits, dropout_rate)
    # weights drop to the IO dtype for the PV dot (single-pass MXU on
    # bf16) — the same rounding the XLA reference path applies
    # (layers.xla_attention casts the softmax output back to the compute
    # dtype before the value einsum).
    out = _batched_dot(weights.astype(v.dtype), v, 2, 1)
    _write_heads(o_ref, out, bb, num_heads, head_dim)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, num_heads, head_dim,
                dropout_rate):
    sm_scale = 1.0 / (head_dim ** 0.5)
    bb = q_ref.shape[0]
    q = _to_heads(q_ref, num_heads, head_dim)
    k = _to_heads(k_ref, num_heads, head_dim)
    v = _to_heads(v_ref, num_heads, head_dim)
    g = _to_heads(g_ref, num_heads, head_dim)

    weights = _weights_for(q, k, sm_scale)
    if dropout_rate > 0.0:
        bits = _dropout_bits(seed_ref, bb, num_heads, weights.shape[-1])
        dropped, keep = _apply_dropout(weights, bits, dropout_rate)
    else:
        dropped, keep = weights, None

    # dv = dropped^T @ g (contract over T_query). The softmax weights and
    # ds drop to the IO dtype at each dot — bf16 single-pass MXU matmuls,
    # the same rounding XLA autodiff applies differentiating the bf16
    # einsum path; with f32 IO the casts are identities.
    dv = jax.lax.dot_general(
        dropped.astype(g.dtype), g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    d_dropped = _batched_dot(g, v, 2, 2)
    if dropout_rate > 0.0:
        dw = jnp.where(keep, d_dropped / (1.0 - dropout_rate), 0.0)
    else:
        dw = d_dropped
    ds = weights * (dw - jnp.sum(dw * weights, axis=-1, keepdims=True))
    ds = (ds * sm_scale).astype(q.dtype)
    dq = _batched_dot(ds, k, 2, 1)
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    _write_heads(dq_ref, dq, bb, num_heads, head_dim)
    _write_heads(dk_ref, dk, bb, num_heads, head_dim)
    _write_heads(dv_ref, dv, bb, num_heads, head_dim)


_VMEM_BUDGET = 10 * 1024 * 1024  # scoped-vmem headroom (chip limit ~16M)


def _choose_block_b(b: int, t: int, num_heads: int, head_dim: int,
                    itemsize: int, n_io: int, n_f32: int,
                    n_scores: int) -> int:
    """Largest frame block whose VMEM footprint fits the scoped budget.

    Model: n_io pipelined ref buffers (x2 double buffering) in the input
    dtype, n_f32 head-transposed copies (also IO dtype since the bf16-dot
    rework), n_scores f32 (bbH, T, T) score-sized tensors.
    """
    hd = num_heads * head_dim
    for cand in (8, 4, 2, 1):
        if b % cand != 0:
            continue
        slab = cand * t * hd
        est = (slab * itemsize * (n_io * 2 + n_f32)
               + cand * num_heads * t * t * 4 * n_scores)
        if est <= _VMEM_BUDGET:
            return cand
    return 1


def _specs(block_b, t, num_heads, head_dim):
    # Natural (block, T, H*D) layout: H*D lanes tile exactly, so the XLA
    # graph has neither transposes nor retiling copies; the head split +
    # transpose happen inside VMEM (_to_heads).
    data = pl.BlockSpec((block_b, t, num_heads * head_dim),
                        lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return seed, data


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def mhsa_short(q, k, v, seed, num_heads: int, dropout_rate: float = 0.0,
               interpret: Optional[bool] = None):
    """Fused bidirectional MHSA: q,k,v (B, T, H*D) -> (B, T, H*D).

    seed: scalar int32 (ignored when dropout_rate == 0).
    """
    out, _ = _mhsa_fwd(q, k, v, seed, num_heads, dropout_rate, interpret)
    return out


def _mhsa_fwd(q, k, v, seed, num_heads, dropout_rate, interpret):
    require_seed(seed, dropout_rate, "mhsa_short")
    b, t, hd = q.shape
    head_dim = hd // num_heads
    block_b = _choose_block_b(b, t, num_heads, head_dim, q.dtype.itemsize,
                              n_io=4, n_f32=4, n_scores=3)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    seed_arr = jnp.reshape(seed, (1,)).astype(jnp.int32)
    seed_spec, data_spec = _specs(block_b, t, num_heads, head_dim)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads,
                          head_dim=head_dim, dropout_rate=dropout_rate),
        out_shape=jax.ShapeDtypeStruct((b, t, hd), q.dtype),
        grid=(b // block_b,),
        in_specs=[seed_spec, data_spec, data_spec, data_spec],
        out_specs=data_spec,
        interpret=interpret,
    )(seed_arr, q, k, v)
    return out, (q, k, v, seed)


def _mhsa_bwd(num_heads, dropout_rate, interpret, residuals, g):
    q, k, v, seed = residuals
    b, t, hd = q.shape
    head_dim = hd // num_heads
    block_b = _choose_block_b(b, t, num_heads, head_dim, q.dtype.itemsize,
                              n_io=7, n_f32=7, n_scores=6)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    seed_arr = jnp.reshape(seed, (1,)).astype(jnp.int32)
    seed_spec, data_spec = _specs(block_b, t, num_heads, head_dim)
    shape = jax.ShapeDtypeStruct((b, t, hd), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads,
                          head_dim=head_dim, dropout_rate=dropout_rate),
        out_shape=(shape, shape, shape),
        grid=(b // block_b,),
        in_specs=[seed_spec] + [data_spec] * 4,
        out_specs=(data_spec, data_spec, data_spec),
        interpret=interpret,
    )(seed_arr, q, k, v, g)
    return dq, dk, dv, None


mhsa_short.defvjp(_mhsa_fwd, _mhsa_bwd)
