"""Shared dropout-PRNG helpers for the Pallas kernels and their callers.

The uint32-threshold dropout math must stay bit-identical everywhere a
kernel's forward and backward regenerate the same mask (ops/attention.py,
ops/fused_attention.py, ops/fused_block.py) — one definition here keeps
them in lockstep. Likewise the seed derivation from a JAX PRNG key is a
single contract shared by every kernel call site.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout_threshold(rate: float) -> int:
    """uint32 cutoff: bits below it are dropped (P(drop) == rate)."""
    return min(int(rate * (2 ** 32)), 2 ** 32 - 1)


def keep_mask(bits, rate: float):
    """uint32 bits -> bool keep mask."""
    return bits >= jnp.uint32(dropout_threshold(rate))


def keep_scale(bits, rate: float):
    """uint32 bits -> keep/(1-rate) multiplier (0 where dropped)."""
    return jnp.where(keep_mask(bits, rate), 1.0 / (1.0 - rate), 0.0)


def seed_arr(seed) -> jnp.ndarray:
    """Scalar (or None) -> the (1,) int32 SMEM operand kernels expect.

    None maps to 0 ONLY for dropout-free calls; entry points must call
    require_seed first so an active dropout never silently reuses seed 0
    (and therefore the identical mask) every step.
    """
    if seed is None:
        seed = 0
    return jnp.reshape(jnp.asarray(seed, jnp.int32), (1,))


def require_seed(seed, dropout_rate: float, op: str) -> None:
    """Trace-time guard: an active dropout needs an explicit seed."""
    if dropout_rate > 0.0 and seed is None:
        raise ValueError(
            f"{op}: dropout_rate={dropout_rate} > 0 requires an explicit "
            "int32 seed (derive one per step via prng.derive_seed); "
            "defaulting to 0 would reuse the same dropout mask every step")


def derive_seed(rng) -> jnp.ndarray:
    """JAX PRNG key -> scalar int32 seed for the hardware-PRNG kernels."""
    return jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
