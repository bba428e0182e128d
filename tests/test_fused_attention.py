"""Fused short-sequence MHSA kernel vs XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocad_tpu.models.layers import xla_attention
from videocad_tpu.ops.fused_attention import mhsa_short


def _qkv(b, t, h, d, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (b, t, h * d)
    return [jax.random.normal(k, shape, jnp.float32) for k in keys]


def _reference(q, k, v, h):
    b, t, hd = q.shape
    d = hd // h
    split = lambda x: x.reshape(b, t, h, d)  # noqa: E731
    out = xla_attention(split(q), split(k), split(v))
    return out.reshape(b, t, hd)


@pytest.mark.parametrize("b,t,h,d", [
    (4, 50, 16, 64),   # the ViT shape (pads 50 -> 56)
    (2, 16, 2, 32),
    (8, 8, 4, 16),
    (3, 13, 2, 8),     # odd batch -> block_b 1; uneven T
])
def test_fused_matches_xla(b, t, h, d):
    q, k, v = _qkv(b, t, h, d)
    expected = _reference(q, k, v, h)
    got = mhsa_short(q, k, v, jnp.int32(0), h, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-5, rtol=1e-4)


def test_fused_gradients_match_xla():
    b, t, h, d = 2, 16, 4, 16
    q, k, v = _qkv(b, t, h, d, seed=3)

    def loss_fused(q, k, v):
        return (mhsa_short(q, k, v, jnp.int32(0), h, 0.0) ** 2).sum()

    def loss_ref(q, k, v):
        return (_reference(q, k, v, h) ** 2).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-5, rtol=1e-3)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel dropout needs the hardware PRNG")
@pytest.mark.parametrize("B,T,H,D", [
    (2, 16, 4, 16),
    # fwd chooses block_b=2 but bwd block_b=1 at this f32 shape — the
    # regression case for block-indexed dropout streams (ADVICE r1 high):
    # the masks must be identical regardless of each pass's block size.
    (4, 64, 16, 64),
])
def test_dropout_gradients_exact_on_tpu(B, T, H, D):
    """Extract the kernel's actual dropout mask (per-head identity v makes
    the output the dropped weights; requires D == T), rebuild the same
    function in pure JAX, and require bitwise-equal gradients."""
    from videocad_tpu.ops.fused_attention import _choose_block_b
    assert D == T or (B, T, H, D) == (2, 16, 4, 16)
    if (B, T, H, D) == (4, 64, 16, 64):
        fwd_b = _choose_block_b(B, T, H, D, 4, n_io=4, n_f32=4, n_scores=3)
        bwd_b = _choose_block_b(B, T, H, D, 4, n_io=7, n_f32=7, n_scores=6)
        assert fwd_b != bwd_b, "shape no longer triggers the block mismatch"
    key = jax.random.PRNGKey(0)
    q, k, v = [jax.random.normal(kk, (B, T, H * D), jnp.float32)
               for kk in jax.random.split(key, 3)]
    seed, rate = jnp.int32(12345), 0.3

    eye = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(T)] * H, axis=1)[None], (B, T, H * D))
    wd = mhsa_short(q, k, eye, seed, H, rate)
    keep = wd.reshape(B, T, H, T).transpose(0, 2, 1, 3) > 0

    def split(x):
        return x.reshape(B, T, H, D).transpose(0, 2, 1, 3)

    def f_ref(q_, k_, v_):
        s = jnp.einsum("bhtd,bhsd->bhts", split(q_), split(k_)) / (D ** 0.5)
        w = jnp.where(keep, jax.nn.softmax(s, axis=-1) / (1 - rate), 0.0)
        out = jnp.einsum("bhts,bhsd->bhtd", w, split(v_))
        return (out.transpose(0, 2, 1, 3).reshape(B, T, H * D) ** 2).sum()

    def f_fused(q_, k_, v_):
        return (mhsa_short(q_, k_, v_, seed, H, rate) ** 2).sum()

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    g_fus = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    # Matched fwd/bwd block sizes are bitwise-exact (measured 0.0 on v5e).
    # Mismatched blocks recompute the softmax with different tile shapes in
    # the backward, leaving ~7e-4 f32 accumulation noise; the bug this
    # guards against (block-indexed dropout streams) produces max-abs
    # gradient errors ~11 at this shape — 4 orders of magnitude above tol.
    atol = 1e-6 if (B, T, H, D) == (2, 16, 4, 16) else 5e-3
    for a, b in zip(g_fus, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


def test_model_with_fused_vit_attention_matches_xla():
    from tests.helpers import TINY_CONFIG, synthetic_batch
    from videocad_tpu.models import create_model, init_model

    base = dict(TINY_CONFIG)
    m_xla = create_model(base)
    params = init_model(m_xla, jax.random.PRNGKey(0), batch=1, seq_len=2)
    m_fused = create_model(dict(base, vit_attention_impl="fused"))
    data = synthetic_batch(np.random.default_rng(0), 1, 6, image_size=32)
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    out_xla = m_xla.apply({"params": params}, batch, deterministic=True)
    out_fused = m_fused.apply({"params": params}, batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_xla[0]),
                               np.asarray(out_fused[0]),
                               atol=5e-5, rtol=1e-3)
