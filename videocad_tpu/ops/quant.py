"""Int8 quantized matmul (AQT-style) — the MXU's 2x-rate integer path.

TPU v5e's datasheet rate for int8 MXU matmuls is 2x bf16 — but the
measured reality on this toolchain (docs/PERF.md "Int8 quantized matmuls")
is that XLA's int8 ``dot_general`` runs BELOW the bf16 rate at this
model's K=512/1024 contractions (29.9 vs 54.5 TFLOP/s at the ViT shapes)
and only reaches parity at 4096-scale. The mode therefore ships as a
**capability, off by default** (``quant="none"``): checkpoints are
bit-identical across ``quant`` settings, the int8_bwd overfit CLI test
proves the quantized gradients learn, and models large enough to amortize
the int8 pipeline can turn it on.

Scheme (the standard "dynamic symmetric per-channel" recipe, as used by
AQT / quantized-training literature):

  * activations x: per-row abs-max scale over the contraction axis
    (one scale per token vector),
  * weights w: per-column abs-max scale (one scale per output feature),
  * int8 x int8 -> int32 ``lax.dot_general`` (MXU-native accumulate),
  * rescale by the scale outer product, cast back to the compute dtype.

Backward (``jax.custom_vjp``):

  * ``backward='bf16'`` (default): straight-through estimator — gradients
    are computed from the UNquantized operands in the compute dtype, i.e.
    exactly the gradients of the bf16 matmul. Only the forward third of the
    matmul FLOPs moves to int8, but training dynamics are the well-studied
    quantization-aware-training ones.
  * ``backward='int8'``: both backward matmuls (dx = dy @ w^T and
    dw = x^T @ dy) also run int8 with fresh per-channel scales over their
    own contraction axes. All matmul FLOPs move to the 2x path; gradient
    round-to-nearest noise is the trade (AQT uses stochastic rounding
    here; we accept RTN and gate the mode behind an explicit config knob).

There is deliberately no Pallas here: XLA lowers int8 ``dot_general`` with
``preferred_element_type=int32`` straight onto the MXU and fuses the
quantize (abs-max reduce + scale + round + clip + cast) into neighbouring
elementwise work. Reference counterpart: none — the reference trains pure
fp32/TF32 torch (main.py:28); this is a TPU-native capability beyond
parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-12  # scale floor: keeps all-zero rows/cols finite


def _rowwise_scale(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Symmetric abs-max scale along ``axis`` (kept), in f32."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    return jnp.maximum(amax, _EPS) / 127.0


def _to_int8(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def _q8_dot(a: jnp.ndarray, sa: jnp.ndarray, b: jnp.ndarray,
            sb: jnp.ndarray) -> jnp.ndarray:
    """int8 a @ b with int32 accumulate, rescaled to f32.

    ``a``: (..., K) already int8; ``b``: (K, N) int8; ``sa``: (..., 1) and
    ``sb``: (1, N) f32 scales (broadcast over the output).
    """
    acc = jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sa * sb


def _forward(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    sx = _rowwise_scale(x, axis=-1)
    sw = _rowwise_scale(w, axis=0)
    y = _q8_dot(_to_int8(x, sx), sx, _to_int8(w, sw), sw)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def q8_matmul(x: jnp.ndarray, w: jnp.ndarray,
              backward: str = "bf16") -> jnp.ndarray:
    """Quantized ``x @ w``: int8 MXU forward, selectable backward.

    x: (..., K) activations (any compute dtype; returns the same dtype);
    w: (K, N) weights; backward: 'bf16' (straight-through) | 'int8'.
    """
    return _forward(x, w)


def _q8_fwd(x, w, backward):
    return _forward(x, w), (x, w)


def _q8_bwd(backward, res, dy):
    x, w = res
    k = x.shape[-1]
    xm = x.reshape(-1, k)
    dym = dy.reshape(-1, dy.shape[-1]).astype(jnp.float32)

    if backward == "int8":
        # dx = dy @ w^T, contraction over N.
        wt = jnp.transpose(w)
        sdy = _rowwise_scale(dym, axis=-1)
        swt = _rowwise_scale(wt, axis=0)
        dxm = _q8_dot(_to_int8(dym, sdy), sdy, _to_int8(wt, swt), swt)
        # dw = x^T @ dy, contraction over the token axis M.
        xt = jnp.transpose(xm)
        sxt = _rowwise_scale(xt, axis=-1)
        sdy_col = _rowwise_scale(dym, axis=0)
        dw = _q8_dot(_to_int8(xt, sxt), sxt, _to_int8(dym, sdy_col), sdy_col)
    else:
        dym_c = dym.astype(x.dtype)
        dxm = dym_c @ jnp.transpose(w).astype(x.dtype)
        dw = jnp.transpose(xm) @ dym_c

    dx = dxm.reshape(x.shape).astype(x.dtype)
    return dx, dw.astype(w.dtype)


q8_matmul.defvjp(_q8_fwd, _q8_bwd)


def quantized_dense(x: jnp.ndarray, kernel: jnp.ndarray,
                    bias: jnp.ndarray | None, dtype,
                    backward: str = "bf16") -> jnp.ndarray:
    """Drop-in body for a Dense layer: q8 matmul + bias in ``dtype``."""
    y = q8_matmul(x.astype(dtype), kernel.astype(dtype), backward)
    if bias is not None:
        y = y + bias.astype(dtype)
    return y
