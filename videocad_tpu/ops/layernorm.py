"""Fused LayerNorm (forward + backward) for the ViT token stream.

Profiling (tools/analyze_trace.py) shows XLA's LayerNorm fusions over the
(B*T*tokens, 512) ViT activations running ~20x below HBM bandwidth (f32
mean/var reduce fusions with narrow (N, 50) outputs). This kernel does the
whole normalization in one VMEM pass per row block and saves (mean, rstd)
for a one-pass backward; dgamma/dbeta accumulate across the sequential TPU
grid into a single output block.

Matches flax nn.LayerNorm semantics: statistics in f32, eps inside the
rsqrt, y = (x - mean) * rstd * scale + bias, outputs in the input dtype.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 1024


def _fwd_kernel(x_ref, scale_ref, bias_ref, y_ref, mean_ref, rstd_ref, *,
                eps):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=1, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    norm = centered * rstd
    y = norm * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(
        jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)
    mean_ref[:] = mean
    rstd_ref[:] = rstd


def _bwd_kernel(x_ref, scale_ref, mean_ref, rstd_ref, g_ref,
                dx_ref, dscale_ref, dbias_ref, *, n_real, block_rows):
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    scale = scale_ref[0].astype(jnp.float32)
    mean, rstd = mean_ref[:], rstd_ref[:]
    norm = (x - mean) * rstd

    # Mask padded rows out of the parameter gradients.
    row = (pl.program_id(0) * block_rows
           + jax.lax.broadcasted_iota(jnp.int32, (g.shape[0], 1), 0))
    valid = (row < n_real).astype(jnp.float32)
    gv = g * valid

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dscale_ref[:] += jnp.sum(gv * norm, axis=0, keepdims=True)
    dbias_ref[:] += jnp.sum(gv, axis=0, keepdims=True)

    gs = g * scale
    m1 = jnp.mean(gs, axis=1, keepdims=True)
    m2 = jnp.mean(gs * norm, axis=1, keepdims=True)
    dx = rstd * (gs - m1 - norm * m2)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _pad_rows(x, rows):
    n = x.shape[0]
    if n == rows:
        return x
    return jnp.pad(x, ((0, rows - n), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm(x, scale, bias, eps: float = 1e-6,
               interpret: Optional[bool] = None):
    """LayerNorm over the last dim; x (..., D), scale/bias (D,)."""
    y, _ = _ln_fwd(x, scale, bias, eps, interpret)
    return y


def _ln_fwd(x, scale, bias, eps, interpret):
    orig_shape = x.shape
    d = orig_shape[-1]
    flat = x.reshape(-1, d)
    n = flat.shape[0]
    block = min(_BLOCK_ROWS, max(8, n))
    rows = -(-n // block) * block
    flat_p = _pad_rows(flat, rows)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    row_spec = pl.BlockSpec((block, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((block, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    param_spec = pl.BlockSpec((1, d), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    y, mean, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((rows, d), x.dtype),
                   jax.ShapeDtypeStruct((rows, 1), jnp.float32),
                   jax.ShapeDtypeStruct((rows, 1), jnp.float32)),
        grid=(rows // block,),
        in_specs=[row_spec, param_spec, param_spec],
        out_specs=(row_spec, stat_spec, stat_spec),
        interpret=interpret,
    )(flat_p, scale.reshape(1, d), bias.reshape(1, d))
    return y[:n].reshape(orig_shape), (x, scale, mean, rstd)


def _ln_bwd(eps, interpret, residuals, g):
    x, scale, mean, rstd = residuals
    orig_shape = x.shape
    d = orig_shape[-1]
    flat = x.reshape(-1, d)
    n = flat.shape[0]
    block = min(_BLOCK_ROWS, max(8, n))
    rows = -(-n // block) * block
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    row_spec = pl.BlockSpec((block, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((block, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    param_spec = pl.BlockSpec((1, d), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    dx, dscale, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, n_real=n, block_rows=block),
        out_shape=(jax.ShapeDtypeStruct((rows, d), x.dtype),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)),
        grid=(rows // block,),
        in_specs=[row_spec, param_spec, stat_spec, stat_spec, row_spec],
        out_specs=(row_spec, param_spec, param_spec),
        interpret=interpret,
    )(_pad_rows(flat, rows), scale.reshape(1, d), mean, rstd,
      _pad_rows(g.reshape(-1, d), rows))
    return (dx[:n].reshape(orig_shape),
            dscale.reshape(scale.shape).astype(scale.dtype),
            dbias.reshape(scale.shape).astype(scale.dtype))


layer_norm.defvjp(_ln_fwd, _ln_bwd)
