"""Fused dropout on the TPU hardware PRNG.

Training with dropout 0.1 (the reference default) spends a large share of
step time generating threefry random bits and materializing masks for the
huge attention-weight tensors (measured: ~35% of the flagship step). This
kernel:

  * draws bits from the TPU's per-core hardware PRNG (pltpu.prng_random_bits)
    — no threefry chains in the XLA graph;
  * applies the mask in one VMEM pass (x * mask / keep);
  * stores NO mask for the backward pass: jax.custom_vjp re-runs the same
    kernel on the cotangent with the same seed (the PRNG is deterministic
    per seed+program), the flash-attention-style recompute trade.

Falls back to jnp bernoulli off-TPU (interpret-mode PRNG differs) and is
drop-in for flax Dropout given an explicit uint32 seed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 1024          # elements per row in the kernel view
_ROWS_PER_BLOCK = 512  # rows per grid step


def _dropout_kernel(seed_ref, x_ref, o_ref, *, threshold, inv_keep):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bits = pltpu.prng_random_bits(x_ref.shape)
    bits = pltpu.bitcast(bits, jnp.uint32)
    keep = bits >= jnp.uint32(threshold)
    o_ref[:] = jnp.where(keep, x_ref[:] * inv_keep, 0.0).astype(o_ref.dtype)


def _dropout_pallas(x: jnp.ndarray, seed: jnp.ndarray, rate: float):
    orig_shape, orig_dtype = x.shape, x.dtype
    n = x.size
    cols = _LANES
    rows = -(-n // cols)
    pad = rows * cols - n
    flat = jnp.pad(x.reshape(-1), (0, pad)).reshape(rows, cols)
    block_rows = min(_ROWS_PER_BLOCK, rows)
    grid_rows = -(-rows // block_rows)
    if rows % block_rows:
        flat = jnp.pad(flat, ((0, grid_rows * block_rows - rows), (0, 0)))

    threshold = min(int(rate * (2 ** 32)), 2 ** 32 - 1)
    out = pl.pallas_call(
        functools.partial(_dropout_kernel, threshold=threshold,
                          inv_keep=1.0 / (1.0 - rate)),
        out_shape=jax.ShapeDtypeStruct(flat.shape, orig_dtype),
        grid=(grid_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(seed.reshape(1).astype(jnp.int32), flat)
    return out.reshape(-1)[:n].reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hw_dropout(x: jnp.ndarray, seed: jnp.ndarray, rate: float):
    """Dropout with hardware-PRNG bits; differentiable, mask never stored.

    x: any shape/dtype; seed: scalar int32; rate: drop probability (static).
    """
    return _dropout_pallas(x, seed, rate)


def _hw_dropout_fwd(x, seed, rate):
    return _dropout_pallas(x, seed, rate), seed


def _hw_dropout_bwd(rate, seed, g):
    # Same seed + same grid -> identical mask; applying the kernel to the
    # cotangent IS multiplication by mask/keep.
    return _dropout_pallas(g, seed, rate), None


hw_dropout.defvjp(_hw_dropout_fwd, _hw_dropout_bwd)


def dropout(x: jnp.ndarray, rng: jax.Array, rate: float,
            deterministic: bool = False, impl: str = "xla") -> jnp.ndarray:
    """Dropout entry point: 'pallas' = hw_dropout on TPU, else jnp bernoulli."""
    if deterministic or rate == 0.0:
        return x
    if impl == "pallas" and jax.default_backend() == "tpu":
        seed = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max,
                                  dtype=jnp.int32)
        return hw_dropout(x, seed, rate)
    # u8 integer-threshold mask instead of jax.random.bernoulli. Two wins
    # measured on the flagship (r4): (1) bernoulli lowers to bits ->
    # u32->f32 uniform conversion -> float compare; comparing raw bits
    # against an integer threshold skips the conversion chain. (2) u8
    # bits quarter the RngBitGenerator output traffic — the 13 dropout
    # sites generated ~2 GB/step of u32 bits (~4.5 ms). Together:
    # 11,074 -> 12,025 frames/s/chip (+8.6%).
    #
    # The drop rate quantizes to 1/256 granularity: rate 0.1 realizes as
    # 26/256 = 0.1016. The keep-scale uses the EFFECTIVE rate, so
    # E[dropout(x)] == x exactly; only the regularization strength
    # shifts, by <= 1/512 absolute for any rate the u8 grid represents.
    # Exact-rate bernoulli never held bit-parity with the reference's
    # torch RNG anyway, and dropout has never guaranteed a stable mask
    # stream across versions.
    threshold = round(rate * 256)
    if not 1 <= threshold <= 255:
        # Rates off the u8 grid (< ~0.002 or > ~0.998) would quantize to
        # a multiple of the requested rate (ADVICE r4: rate 0.001 -> u8
        # floor 1/256, ~4x the asked drop probability) — take the exact
        # u32 path instead; these rates never appear on the hot configs.
        bits32 = jax.random.bits(rng, x.shape, jnp.uint32)
        keep = bits32 >= jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
        return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)
    eff_rate = threshold / 256.0
    bits = jax.random.bits(rng, x.shape, jnp.uint8)
    keep = bits >= jnp.uint8(threshold)
    return jnp.where(keep, x / (1.0 - eff_rate), 0.0).astype(x.dtype)
