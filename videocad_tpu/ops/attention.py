"""Pallas flash attention with in-VMEM masked online softmax.

The decoder's hot attention pattern (causal self-attention + banded-window
cross-attention over frame memory — reference autoregressive_transformer.py:
180-213) fused into one kernel: scores, mask, online softmax, and the
P @ V contraction never leave VMEM, so HBM sees only Q/K/V/O (+ a bool
mask) instead of the (B, H, T, S) score tensor XLA would materialize
unfused at long T.

Layout: heads fold into the grid — one program per (batch*head, q-block);
K/V stream through a fori_loop of k-blocks with running (max, denom)
carries (the standard flash recurrence). f32 accumulation regardless of
input dtype.

Differentiation: forward runs the Pallas kernel; the backward pass
recomputes attention with plain XLA ops via jax.vjp of the same math
(flash-style recompute instead of storing probabilities), wired through
jax.custom_vjp.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, sm_scale,
                  block_k, kv_len):
    """One (batch*head, q-block) program.

    q_ref: (1, Bq, D); k_ref/v_ref: (1, S, D); mask_ref: (Bq, S) int8;
    o_ref: (1, Bq, D).
    """
    q = q_ref[0].astype(jnp.float32) * sm_scale
    block_q, d = q.shape
    num_kv = kv_len // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (Bq, Bk)
        msk = mask_ref[:, pl.ds(i * block_k, block_k)]
        s = jnp.where(msk != 0, s, _NEG_INF)

        m_cur = jnp.max(s, axis=1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1)
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc * alpha[:, None] + pv
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q,), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, _m, l = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))
    # Fully-masked (padded) rows have l == 0; emit zeros, not NaNs.
    out = acc / jnp.maximum(l, 1e-20)[:, None]
    o_ref[0] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_forward(q, k, v, mask, block_q: int, block_k: int):
    b, t, h, d = q.shape
    s = k.shape[1]
    dtype = q.dtype

    if mask is None:
        mask = jnp.ones((t, s), dtype=bool)
    mask = jnp.broadcast_to(mask, (t, s))

    t_pad = _round_up(t, block_q)
    s_pad = _round_up(s, block_k)
    # (B, T, H, D) -> (B*H, T, D); pad sequence dims to block multiples.
    qf = jnp.pad(q.transpose(0, 2, 1, 3).reshape(b * h, t, d),
                 ((0, 0), (0, t_pad - t), (0, 0)))
    kf = jnp.pad(k.transpose(0, 2, 1, 3).reshape(b * h, s, d),
                 ((0, 0), (0, s_pad - s), (0, 0)))
    vf = jnp.pad(v.transpose(0, 2, 1, 3).reshape(b * h, s, d),
                 ((0, 0), (0, s_pad - s), (0, 0)))
    mf = jnp.pad(mask.astype(jnp.int8),
                 ((0, t_pad - t), (0, s_pad - s)))

    grid = (b * h, t_pad // block_q)
    # Off-TPU (CPU tests) the kernel runs in interpreter mode.
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_flash_kernel, sm_scale=1.0 / (d ** 0.5),
                          block_k=block_k, kv_len=s_pad),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, s_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf, mf)
    return out[:, :t].reshape(b, h, t, d).transpose(0, 2, 1, 3)


def _xla_reference(q, k, v, mask):
    """Same math, plain XLA — used for the backward recompute."""
    depth = q.shape[-1]
    scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / (depth ** 0.5)
    if mask is not None:
        scores = jnp.where(mask[None, None], scores, _NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", weights,
                      v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(q, k, v, mask: Optional[jnp.ndarray] = None,
                    block_q: int = 128, block_k: int = 128):
    """softmax(q k^T / sqrt(d), mask) v.

    q: (B, T, H, D); k, v: (B, S, H, D); mask: (T, S) bool, True = attend.
    Returns (B, T, H, D) in q's dtype.
    """
    block_q = min(block_q, _round_up(q.shape[1], 8))
    block_k = min(block_k, _round_up(k.shape[1], 8))
    return _flash_forward(q, k, v, mask, block_q, block_k)


def _fwd(q, k, v, mask, block_q, block_k):
    out = flash_attention(q, k, v, mask, block_q, block_k)
    return out, (q, k, v, mask)


def _bwd(block_q, block_k, res, g):
    q, k, v, mask = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, mask),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
