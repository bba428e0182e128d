"""Pallas flash attention: fused forward, Pallas backward, in-kernel dropout.

The decoder's hot attention pattern (causal self-attention + banded-window
cross-attention over frame memory — reference autoregressive_transformer.py:
180-213) fused into one kernel: scores, mask, online softmax, dropout, and
the P @ V contraction never leave VMEM, so HBM sees only Q/K/V/O (+ a bool
mask and a per-row logsumexp) instead of the (B, H, T, S) score tensor XLA
would materialize unfused at long T.

Layout: heads fold into the grid — one program per (batch*head, q-block);
K/V stream through a loop of k-blocks with running (max, denom) carries
(the standard flash recurrence; unrolled at decoder-scale trip counts and
whenever dropout is on — the drop tiles are pregenerated into a Python
list). f32 accumulation regardless of input dtype.

Undefined rows: a query row whose mask admits no column is out of
contract (the model never produces one — causal self-attention always
attends col == t). The backward kernels zero such rows' weights; the
forward emits the masked-softmax-of--1e30 average. Don't compare either
against XLA there.

Differentiation (flash recompute, all Pallas):
  * the forward stores only the per-row logsumexp alongside the output;
  * ``_dq_kernel`` (grid = (B*H, q-blocks)) recomputes the normalized
    weights from Q/K + lse and emits dQ;
  * ``_dkv_kernel`` (grid = (B*H, k-blocks)) streams q-row chunks and
    accumulates dK/dV;
  * ``delta = rowsum(g * out)`` is computed outside in XLA (it fuses).

Dropout runs inside the kernel on the TPU hardware PRNG. The bit stream is
GRID-INVARIANT: bits generate in fixed (8-row, block_k-column) tiles, each
seeded by one folded stream index (batch*head, row-chunk, column-chunk) —
block_q/block_k are resolved identically for the forward and both backward
kernels, so every kernel regenerates exactly the tiles it touches and the
masks agree for any grid decomposition (the failure mode ADVICE.md round 1
found in the fused-MHSA kernel), with no dynamic lane slicing (not
lowerable on TPU). Off-TPU (interpret mode) the hardware PRNG does not
exist; dropout training falls back to XLA in models/layers.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videocad_tpu.ops.prng import keep_scale as _keep_scale
from videocad_tpu.ops.prng import require_seed as _require_seed
from videocad_tpu.ops.prng import seed_arr as _seed_arr

_NEG_INF = -1e30
_ROW_CHUNK = 8    # dropout-bit generation unit (rows); divides every block_q
_LANE_TILE = 128  # dropout bits draw in native register tiles (see below)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dropout_bits(seed_ref, bh, t_chunks, c_chunks, row_start, nrows,
                  cchunk, block_k):
    """(nrows, block_k) uint32 bits for query rows [row_start,
    row_start+nrows) x k-column chunk ``cchunk``.

    The generation unit is a fixed (8-row, block_k-column) tile keyed by
    one folded stream index (Mosaic supports at most two seed values):
    ``stream = (bh * t_chunks + row_chunk) * c_chunks + cchunk``. block_q
    and block_k are resolved identically for the forward and both backward
    kernels, so every kernel regenerates the same tiles with no dynamic
    lane slicing. ``nrows`` must be a multiple of ``_ROW_CHUNK`` and
    ``row_start`` chunk-aligned (true for all callers — blocks are
    multiples of 8).
    """
    chunks = []
    for c in range(nrows // _ROW_CHUNK):
        rchunk = row_start // _ROW_CHUNK + c
        stream = (bh * t_chunks + rchunk) * c_chunks + cchunk
        pltpu.prng_seed(seed_ref[0], stream)
        # Always draw a full native (8, 128) register tile and statically
        # slice: sub-128-lane draws are layout-sensitive — the same seed
        # produced different values in the forward and dkv kernels at
        # e.g. block_k=24 (observed on v5e). block_k is either exactly
        # 128 or the single k-block (_resolve_blocks), so a k-block never
        # straddles lane tiles.
        chunks.append(pltpu.bitcast(
            pltpu.prng_random_bits((_ROW_CHUNK, _LANE_TILE)),
            jnp.uint32)[:, :block_k])
    return jnp.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]


def _dot(a, b, contract_a, contract_b, precision):
    """Non-batched dot with f32 accumulation and a static precision knob.

    ``precision=None`` (default) lets the MXU run its native bf16 passes on
    f32 inputs — right for training throughput. The parity tests force
    ``HIGHEST`` so kernel-vs-XLA comparisons aren't dominated by bf16
    input rounding.
    """
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


def _flash_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                  *, sm_scale, block_k, kv_len, dropout_rate, precision):
    """One (batch*head, q-block) program.

    q_ref: (1, Bq, D); k_ref/v_ref: (1, S, D); mask_ref: (Bq, S) int8;
    o_ref: (1, Bq, D); lse_ref: (1, Bq, 1) f32 (trailing singleton keeps the
    block's last-two dims TPU-tileable: (Bq, 1) with Bq % 8 == 0).
    """
    q = q_ref[0].astype(jnp.float32) * sm_scale
    block_q, d = q.shape
    num_kv = kv_len // block_k
    bh = pl.program_id(0)
    row0 = pl.program_id(1) * block_q
    t_chunks = block_q * pl.num_programs(1) // _ROW_CHUNK

    if dropout_rate > 0.0:
        # ALL seed/draw pairs run back-to-back before any compute: with
        # draws interleaved into the compute loop the compiler groups the
        # stateful pairs and every chunk reads the last seed's bits
        # (observed on v5e as fwd/bwd mask divergence).
        drops = [
            _keep_scale(_dropout_bits(seed_ref, bh, t_chunks, num_kv,
                                      row0, block_q, i, block_k),
                        dropout_rate)
            for i in range(num_kv)]

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = _dot(q, k, 1, 1, precision)  # (Bq, Bk)
        msk = mask_ref[:, pl.ds(i * block_k, block_k)]
        s = jnp.where(msk != 0, s, _NEG_INF)

        m_cur = jnp.max(s, axis=1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1)
        if dropout_rate > 0.0:
            p = p * drops[i]  # unrolled loop: i is a Python int
        pv = _dot(p, v, 1, 0, precision)
        acc = acc * alpha[:, None] + pv
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q,), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    if dropout_rate > 0.0 or num_kv <= 8:
        # Unrolled: required when dropout is on (drops[i] is a Python-list
        # lookup), and at decoder lengths the trip count is tiny anyway.
        carry = (acc0, m0, l0)
        for i in range(num_kv):
            carry = body(i, carry)
        acc, m, l = carry
    else:
        acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))
    # Fully-masked (padded) rows have l == 0; emit zeros, not NaNs. Their
    # lse is garbage-but-finite; the backward re-applies the mask so the
    # value never matters.
    l_safe = jnp.maximum(l, 1e-20)
    o_ref[0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    lse_ref[0] = (m + jnp.log(l_safe))[:, None]


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, g_ref, lse_ref,
               delta_ref, dq_ref, *, sm_scale, block_k, dropout_rate,
               precision):
    """dQ for one (batch*head, q-block): recompute weights, softmax-bwd."""
    q = q_ref[0].astype(jnp.float32) * sm_scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    block_q = q.shape[0]
    kv_len = k.shape[0]

    s = _dot(q, k, 1, 1, precision)
    w = jnp.where(mask_ref[...] != 0,
                  jnp.exp(s - lse_ref[0, :, 0][:, None]), 0.0)
    dwd = _dot(g, v, 1, 1, precision)
    if dropout_rate > 0.0:
        bh = pl.program_id(0)
        row0 = pl.program_id(1) * block_q
        t_chunks = block_q * pl.num_programs(1) // _ROW_CHUNK
        c_chunks = kv_len // block_k
        drop = jnp.concatenate(
            [_keep_scale(_dropout_bits(seed_ref, bh, t_chunks, c_chunks,
                                       row0, block_q, j, block_k),
                         dropout_rate)
             for j in range(c_chunks)], axis=1)
        dw = dwd * drop
    else:
        dw = dwd
    ds = w * (dw - delta_ref[0, :, 0][:, None])
    dq = _dot(ds, k, 1, 0, precision)
    dq_ref[0] = (dq * sm_scale).astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, g_ref, lse_ref,
                delta_ref, dk_ref, dv_ref, *, sm_scale, block_k,
                kv_len, q_len, q_chunk, dropout_rate, precision):
    """dK/dV for one (batch*head, k-block): stream q-row chunks."""
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    d = k.shape[1]
    bh = pl.program_id(0)
    num_q = q_len // q_chunk

    if dropout_rate > 0.0:
        # Back-to-back seed/draw pairs before any compute (see the
        # forward kernel's comment).
        drops = [
            _keep_scale(_dropout_bits(seed_ref, bh, q_len // _ROW_CHUNK,
                                      kv_len // block_k, i * q_chunk,
                                      q_chunk, pl.program_id(1), block_k),
                        dropout_rate)
            for i in range(num_q)]

    def body(i, carry):
        dk_acc, dv_acc = carry
        r0 = i * q_chunk
        q = q_ref[0, pl.ds(r0, q_chunk), :].astype(jnp.float32) * sm_scale
        g = g_ref[0, pl.ds(r0, q_chunk), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(r0, q_chunk), 0]
        delta = delta_ref[0, pl.ds(r0, q_chunk), 0]
        msk = mask_ref[pl.ds(r0, q_chunk), :]
        s = _dot(q, k, 1, 1, precision)
        w = jnp.where(msk != 0, jnp.exp(s - lse[:, None]), 0.0)
        dwd = _dot(g, v, 1, 1, precision)
        if dropout_rate > 0.0:
            drop = drops[i]  # unrolled loop: i is a Python int
            wd = w * drop
            dw = dwd * drop
        else:
            wd, dw = w, dwd
        # dv += (w * drop)^T @ g    (contract over the q rows)
        dv_acc = dv_acc + _dot(wd, g, 0, 0, precision)
        ds = w * (dw - delta[:, None])
        dk_acc = dk_acc + _dot(ds, q, 0, 0, precision)
        return dk_acc, dv_acc

    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    if dropout_rate > 0.0 or num_q <= 8:
        # Unrolled for the same reasons as the forward.
        carry = (dk0, dv0)
        for i in range(num_q):
            carry = body(i, carry)
        dk, dv = carry
    else:
        dk, dv = jax.lax.fori_loop(0, num_q, body, (dk0, dv0))
    # q was pre-scaled by sm_scale, so dk already carries the factor.
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _prep_inputs(q, k, v, mask, block_q, block_k):
    """Fold heads, pad sequence dims to block multiples."""
    b, t, h, d = q.shape
    s = k.shape[1]
    if mask is None:
        mask = jnp.ones((t, s), dtype=bool)
    mask = jnp.broadcast_to(mask, (t, s))
    t_pad = _round_up(t, block_q)
    s_pad = _round_up(s, block_k)
    qf = jnp.pad(q.transpose(0, 2, 1, 3).reshape(b * h, t, d),
                 ((0, 0), (0, t_pad - t), (0, 0)))
    kf = jnp.pad(k.transpose(0, 2, 1, 3).reshape(b * h, s, d),
                 ((0, 0), (0, s_pad - s), (0, 0)))
    vf = jnp.pad(v.transpose(0, 2, 1, 3).reshape(b * h, s, d),
                 ((0, 0), (0, s_pad - s), (0, 0)))
    mf = jnp.pad(mask.astype(jnp.int8), ((0, t_pad - t), (0, s_pad - s)))
    return qf, kf, vf, mf, t_pad, s_pad


def _flash_forward(q, k, v, mask, seed, dropout_rate, block_q, block_k,
                   precision=None):
    b, t, h, d = q.shape
    dtype = q.dtype
    qf, kf, vf, mf, t_pad, s_pad = _prep_inputs(q, k, v, mask,
                                                block_q, block_k)
    grid = (b * h, t_pad // block_q)
    interpret = jax.default_backend() != "tpu"
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, sm_scale=1.0 / (d ** 0.5),
                          block_k=block_k, kv_len=s_pad,
                          dropout_rate=dropout_rate, precision=precision),
        out_shape=(jax.ShapeDtypeStruct((b * h, t_pad, d), dtype),
                   jax.ShapeDtypeStruct((b * h, t_pad, 1), jnp.float32)),
        grid=grid,
        in_specs=[
            seed_spec,
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, s_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(_seed_arr(seed), qf, kf, vf, mf)
    out = out[:, :t].reshape(b, h, t, d).transpose(0, 2, 1, 3)
    return out, lse


def _flash_backward(q, k, v, mask, seed, out, lse, g, dropout_rate,
                    block_q, block_k, precision=None):
    b, t, h, d = q.shape
    s = k.shape[1]
    dtype = q.dtype
    qf, kf, vf, mf, t_pad, s_pad = _prep_inputs(q, k, v, mask,
                                                block_q, block_k)
    gf = jnp.pad(g.transpose(0, 2, 1, 3).reshape(b * h, t, d),
                 ((0, 0), (0, t_pad - t), (0, 0)))
    # delta_i = rowsum(g * out): cheap elementwise+reduce, XLA fuses it.
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)  # (B, T, H)
    delta = jnp.pad(delta.transpose(0, 2, 1).reshape(b * h, t),
                    ((0, 0), (0, t_pad - t)))[..., None]  # (B*H, T_pad, 1)
    interpret = jax.default_backend() != "tpu"
    sm_scale = 1.0 / (d ** 0.5)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    row_spec = pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    full_rows = pl.BlockSpec((1, t_pad, 1), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, sm_scale=sm_scale, block_k=block_k,
                          dropout_rate=dropout_rate, precision=precision),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), dtype),
        grid=(b * h, t_pad // block_q),
        in_specs=[
            seed_spec,
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, s_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec,
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(_seed_arr(seed), qf, kf, vf, mf, gf, lse, delta)

    q_chunk = next(c for c in (32, 16, 8) if t_pad % c == 0)
    kv_shape = jax.ShapeDtypeStruct((b * h, s_pad, d), dtype)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, sm_scale=sm_scale, block_k=block_k,
                          kv_len=s_pad, q_len=t_pad, q_chunk=q_chunk,
                          dropout_rate=dropout_rate, precision=precision),
        out_shape=(kv_shape, kv_shape),
        grid=(b * h, s_pad // block_k),
        in_specs=[
            seed_spec,
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_pad, block_k), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full_rows, full_rows,
        ],
        out_specs=(pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(_seed_arr(seed), qf, kf, vf, mf, gf, lse, delta)

    unfold = lambda x, n: (x[:, :n].reshape(b, h, n, d)  # noqa: E731
                           .transpose(0, 2, 1, 3))
    return unfold(dq, t), unfold(dk, s), unfold(dv, s)


def _resolve_blocks(q, k, block_q, block_k):
    block_q = min(block_q, _round_up(q.shape[1], _ROW_CHUNK))
    block_k = min(block_k, _round_up(k.shape[1], _ROW_CHUNK))
    return block_q, block_k


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def flash_attention(q, k, v, mask: Optional[jnp.ndarray] = None,
                    seed: Optional[jnp.ndarray] = None,
                    dropout_rate: float = 0.0,
                    block_q: int = 128, block_k: int = 128,
                    precision=None):
    """dropout(softmax(q k^T / sqrt(d), mask)) v — fully fused, trainable.

    q: (B, T, H, D); k, v: (B, S, H, D); mask: (T, S) bool, True = attend;
    seed: scalar int32 for the in-kernel hardware-PRNG dropout (required
    when dropout_rate > 0; TPU only — see module docstring).
    Returns (B, T, H, D) in q's dtype.
    """
    _require_seed(seed, dropout_rate, "flash_attention")
    block_q, block_k = _resolve_blocks(q, k, block_q, block_k)
    out, _ = _flash_forward(q, k, v, mask, seed, dropout_rate,
                            block_q, block_k, precision)
    return out


def _fwd(q, k, v, mask, seed, dropout_rate, block_q, block_k, precision):
    _require_seed(seed, dropout_rate, "flash_attention")
    block_q, block_k = _resolve_blocks(q, k, block_q, block_k)
    out, lse = _flash_forward(q, k, v, mask, seed, dropout_rate,
                              block_q, block_k, precision)
    return out, (q, k, v, mask, seed, out, lse)


def _bwd(dropout_rate, block_q, block_k, precision, res, g):
    q, k, v, mask, seed, out, lse = res
    block_q, block_k = _resolve_blocks(q, k, block_q, block_k)
    dq, dk, dv = _flash_backward(q, k, v, mask, seed, out, lse, g,
                                 dropout_rate, block_q, block_k, precision)
    return dq, dk, dv, None, None


flash_attention.defvjp(_fwd, _bwd)
