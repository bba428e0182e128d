"""Fused multi-head self-attention for short sequences (the ViT hot path).

Profiling the flagship train step (tools/profile_step.py +
tools/analyze_trace.py) showed the ViT's 50-token attention dominating:
XLA materializes (B,T,H,D) <-> (B,H,T,S) transposes around every batched
matmul and bounces (B,H,50,50) score/weight/mask tensors through HBM.
A first kernel revision that still required XLA-side head transposes spent
~67 ms/step in them — HBM-level 4D transposes run far below bandwidth.

Kernel design (v5): grid over frame-blocks only; the kernel ingests
LOGICALLY TRANSPOSED (T, B, H*D) arrays and BlockSpecs deliver
(T, bb, H*D) slabs. Why transposed: the surrounding qkv/out-projection
Dense fusions prefer the token-major {2,0,1} physical layout on a
(B, T, H*D) array, while a Pallas custom-call pins its operands to the
default {2,1,0} — the r4 trace showed XLA bridging that mismatch with a
physical HBM copy at EVERY kernel boundary (~24 copies x 0.52 ms/step on
bf16[1528,50,1024]). A {2,1,0} layout on the transposed (T, B, H*D)
shape is byte-identical to {2,0,1} on (B, T, H*D), so the jnp.transpose
at each boundary compiles to a bitcast (verified in compiled HLO: zero
copies) and the producers keep their preferred layout. The DMA pattern
stays friendly: a (T, bb, H*D) block is T contiguous bb*H*D-byte runs
(16 KB on the flagship). History: the v3 kernel took (bb, T, H, D)
blocks, whose 64-lane minor dim pads to 128 — ~40 ms/step of retiling;
v4 moved to (bb, T, H*D) which tiled exactly but still paid the
{2,0,1}<->{2,1,0} copies.

In the transposed block the frame dim bb sits in the (8-granular)
sublane position, so bb must be a multiple of 8 (or the whole batch) —
larger than v4's bb, which would overflow VMEM if all heads' f32 scores
were live at once. The kernels therefore loop over LANE GROUPS of ~128
lanes (2 heads at D=64): per group, static lane slices peel the heads
(the direct lane split is an unsupported Mosaic shape cast), a per-head
in-VMEM transpose brings them batch-major (Mosaic dots require batch
dims at position 0; the transpose replaces the old HBM copy), one
batched dot produces the (gh*bb, T, T) scores, f32 softmax (+ optional
hardware-PRNG dropout) runs in registers, and the group's output slice
is written back through the mirror transpose. Only one group's scores
are live at a time. The backward kernel recomputes the weights and the
identical dropout mask (same seed) and emits dq/dk/dv in one pass — the
flash-attention recompute trade, specialized for sequences short enough
to hold per-group (T, T) scores in VMEM.

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


def _head_groups(num_heads: int, head_dim: int) -> int:
    """Heads per in-kernel lane group (a VMEM dial, not a correctness one).

    Aim for ~128 lanes per group so one group's f32 (gh*bb, T, T) scores
    stay small; fall back to a single full group when the head count
    doesn't split evenly.
    """
    hd = num_heads * head_dim
    if hd <= 128:
        return num_heads
    if head_dim % 128 == 0:
        return 1
    if 128 % head_dim == 0 and num_heads % (128 // head_dim) == 0:
        return 128 // head_dim
    return num_heads


def _to_heads(x, g0, group_heads, head_dim):
    """(T, bb, H*D) value -> (gh*bb, T, D) head-major slab for one group.

    Heads g0..g0+gh are peeled with static lane slices, transposed
    per-head in VMEM (Mosaic's dot_general requires batch dims at
    position 0, and concat of offset lane slices is only supported along
    the untiled leading dim), and stacked head-major: row = h * bb + j,
    matching _dropout_bits' slab layout.

    Values stay in the IO dtype: on the bf16 hot path every dot then runs
    as a single-pass bf16 MXU matmul with f32 accumulation (identical
    products — bf16 values are exact in f32 — where the r2-r3 kernels
    cast to f32 first and paid the multi-pass f32 MXU rate).
    """
    return jnp.concatenate(
        [jnp.transpose(
            x[:, :, (g0 + h) * head_dim:(g0 + h + 1) * head_dim], (1, 0, 2))
         for h in range(group_heads)], axis=0)


def _write_heads(o_ref, out, bb, g0, group_heads, head_dim):
    """Store a head-major (gh*bb, T, D) value into a (T, bb, H*D) ref.

    Per-head in-VMEM transposes (IO dtype, after the downcast — half the
    bytes of transposing the f32 accumulator) replace the per-boundary
    HBM layout copy the v4 kernel paid.
    """
    for h in range(group_heads):
        o_ref[:, :, (g0 + h) * head_dim:(g0 + h + 1) * head_dim] = (
            jnp.transpose(out[h * bb:(h + 1) * bb].astype(o_ref.dtype),
                          (1, 0, 2)))


def _batched_dot(a, b, contract_a, contract_b):
    """(N, M, K) x (N, ...) batched matmul, f32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _weights_for(q, k, sm_scale):
    """q, k: (gh*bb, T, D) -> softmaxed scores (gh*bb, T, T), f32."""
    return jax.nn.softmax(_batched_dot(q, k, 2, 2) * sm_scale, axis=-1)


def _dropout_bits(seed_ref, block_b, group_idx, group_heads, t):
    """Block-size-invariant dropout bits for one group's head-major
    (gh*block_b, T, T) weights slab.

    Seeded per (ABSOLUTE batch row, lane group) — (seed, i*bb + j, gi) —
    never per grid block: the forward and backward kernels choose
    different block_b at some shapes, so any block-indexed stream would
    regenerate a different mask in the backward — silently wrong
    gradients. Per-(row, group) streams are identical for every legal
    block size; each row's (gh, T, T) draw is reordered to the head-major
    slab with a leading-dims-only transpose (no lane movement).
    """
    base = pl.program_id(0) * block_b
    rows = []
    for j in range(block_b):
        pltpu.prng_seed(seed_ref[0], base + j, group_idx)
        rows.append(pltpu.bitcast(
            pltpu.prng_random_bits((1, group_heads, t, t)), jnp.uint32))
    stack = (jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0])
    # (bb, gh, t, t) -> head-major (gh*bb, t, t)
    return stack.transpose(1, 0, 2, 3).reshape(group_heads * block_b, t, t)


def _apply_dropout(weights, bits, dropout_rate):
    keep = keep_mask(bits, dropout_rate)
    return jnp.where(keep, weights / (1.0 - dropout_rate), 0.0), keep


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, num_heads,
                head_dim, group_heads, dropout_rate):
    sm_scale = 1.0 / (head_dim ** 0.5)
    bb = q_ref.shape[1]
    q_all, k_all, v_all = q_ref[:], k_ref[:], v_ref[:]
    for gi in range(num_heads // group_heads):
        g0 = gi * group_heads
        q = _to_heads(q_all, g0, group_heads, head_dim)
        k = _to_heads(k_all, g0, group_heads, head_dim)
        v = _to_heads(v_all, g0, group_heads, head_dim)
        weights = _weights_for(q, k, sm_scale)
        if dropout_rate > 0.0:
            bits = _dropout_bits(seed_ref, bb, gi, group_heads,
                                 weights.shape[-1])
            weights, _ = _apply_dropout(weights, bits, dropout_rate)
        # weights drop to the IO dtype for the PV dot (single-pass MXU on
        # bf16) — the same rounding the XLA reference path applies
        # (layers.xla_attention casts the softmax output back to the
        # compute dtype before the value einsum).
        out = _batched_dot(weights.astype(v.dtype), v, 2, 1)
        _write_heads(o_ref, out, bb, g0, group_heads, head_dim)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, num_heads, head_dim,
                group_heads, dropout_rate):
    sm_scale = 1.0 / (head_dim ** 0.5)
    bb = q_ref.shape[1]
    q_all, k_all, v_all, g_all = q_ref[:], k_ref[:], v_ref[:], g_ref[:]
    for gi in range(num_heads // group_heads):
        g0 = gi * group_heads
        q = _to_heads(q_all, g0, group_heads, head_dim)
        k = _to_heads(k_all, g0, group_heads, head_dim)
        v = _to_heads(v_all, g0, group_heads, head_dim)
        g = _to_heads(g_all, g0, group_heads, head_dim)

        weights = _weights_for(q, k, sm_scale)
        if dropout_rate > 0.0:
            bits = _dropout_bits(seed_ref, bb, gi, group_heads,
                                 weights.shape[-1])
            dropped, keep = _apply_dropout(weights, bits, dropout_rate)
        else:
            dropped, keep = weights, None

        # dv = dropped^T @ g (contract over T_query). The softmax weights
        # and ds drop to the IO dtype at each dot — bf16 single-pass MXU
        # matmuls, the same rounding XLA autodiff applies differentiating
        # the bf16 einsum path; with f32 IO the casts are identities.
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
        _write_heads(dq_ref, dq, bb, g0, group_heads, head_dim)
        _write_heads(dk_ref, dk, bb, g0, group_heads, head_dim)
        _write_heads(dv_ref, dv, bb, g0, group_heads, head_dim)


_VMEM_BUDGET = 14 * 1024 * 1024  # scoped-vmem headroom (chip limit ~16M)


def _choose_block_b(b: int, t: int, num_heads: int, head_dim: int,
                    itemsize: int, n_slabs: int, n_scores: int,
                    n_vec: int) -> int:
    """Largest legal frame block whose VMEM footprint fits the budget.

    In the transposed (T, bb, H*D) block the frame dim is the sublane
    dim, so bb must be a multiple of 8 — or the whole batch (Mosaic
    allows a block dim equal to the array dim). Model: n_slabs pipelined
    ref buffers (x2 double buffering) in the IO dtype, plus ONE lane
    group's temporaries — n_scores f32 (gh*bb, T, T) score-sized tensors
    and n_vec f32 (gh*bb, T, D) head-slab-sized tensors.
    """
    hd = num_heads * head_dim
    gh = _head_groups(num_heads, head_dim)
    legal = [c for c in (64, 48, 32, 24, 16, 8) if b % c == 0] or [b]
    for cand in legal:
        gr = gh * cand
        est = (cand * t * hd * itemsize * n_slabs * 2
               + gr * t * t * 4 * n_scores
               + gr * t * head_dim * 4 * n_vec)
        if est <= _VMEM_BUDGET:
            return cand
    return legal[-1]


def _specs(block_b, t, num_heads, head_dim):
    # Transposed (T, block, H*D) blocks: {2,1,0} on the transposed array
    # is byte-identical to the producers' preferred {2,0,1} on the
    # (B, T, H*D) original, so every boundary jnp.transpose is a bitcast;
    # the head split + transpose happen inside VMEM (_to_heads).
    data = pl.BlockSpec((t, block_b, num_heads * head_dim),
                        lambda i: (0, i, 0), memory_space=pltpu.VMEM)
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
                              n_slabs=4, n_scores=3, n_vec=4)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    seed_arr = jnp.reshape(seed, (1,)).astype(jnp.int32)
    seed_spec, data_spec = _specs(block_b, t, num_heads, head_dim)
    # boundary transposes compile to bitcasts (see module docstring)
    qt, kt, vt = (jnp.transpose(x, (1, 0, 2)) for x in (q, k, v))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads,
                          head_dim=head_dim,
                          group_heads=_head_groups(num_heads, head_dim),
                          dropout_rate=dropout_rate),
        out_shape=jax.ShapeDtypeStruct((t, b, hd), q.dtype),
        grid=(b // block_b,),
        in_specs=[seed_spec, data_spec, data_spec, data_spec],
        out_specs=data_spec,
        interpret=interpret,
    )(seed_arr, qt, kt, vt)
    return jnp.transpose(out, (1, 0, 2)), (q, k, v, seed)


def _mhsa_bwd(num_heads, dropout_rate, interpret, residuals, g):
    q, k, v, seed = residuals
    b, t, hd = q.shape
    head_dim = hd // num_heads
    block_b = _choose_block_b(b, t, num_heads, head_dim, q.dtype.itemsize,
                              n_slabs=7, n_scores=6, n_vec=8)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    seed_arr = jnp.reshape(seed, (1,)).astype(jnp.int32)
    seed_spec, data_spec = _specs(block_b, t, num_heads, head_dim)
    shape = jax.ShapeDtypeStruct((t, b, hd), q.dtype)
    qt, kt, vt, gt = (jnp.transpose(x, (1, 0, 2)) for x in (q, k, v, g))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads,
                          head_dim=head_dim,
                          group_heads=_head_groups(num_heads, head_dim),
                          dropout_rate=dropout_rate),
        out_shape=(shape, shape, shape),
        grid=(b // block_b,),
        in_specs=[seed_spec] + [data_spec] * 4,
        out_specs=(data_spec, data_spec, data_spec),
        interpret=interpret,
    )(seed_arr, qt, kt, vt, gt)
    return (jnp.transpose(dq, (1, 0, 2)), jnp.transpose(dk, (1, 0, 2)),
            jnp.transpose(dv, (1, 0, 2)), None)


mhsa_short.defvjp(_mhsa_fwd, _mhsa_bwd)
