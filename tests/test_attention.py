"""Pallas flash attention vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocad_tpu.models.layers import banded_mask, causal_mask, xla_attention
from videocad_tpu.ops.attention import flash_attention


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("t,s,h,d,mask_kind", [
    (16, 16, 2, 32, None),
    (16, 16, 2, 32, "causal"),
    (24, 24, 2, 32, "banded"),
    (19, 13, 3, 16, "banded"),   # uneven lengths -> padding paths
    (50, 50, 4, 64, None),       # ViT-shaped
])
def test_flash_matches_xla(t, s, h, d, mask_kind):
    q = _rand((2, t, h, d), 0)
    k = _rand((2, s, h, d), 1)
    v = _rand((2, s, h, d), 2)
    if mask_kind == "causal":
        mask = causal_mask(t)
    elif mask_kind == "banded":
        mask = banded_mask(t, s, 3)
    else:
        mask = None
    expected = xla_attention(q, k, v, mask)
    got = flash_attention(q, k, v, mask)
    if mask is not None:
        # Rows with no attendable column are undefined (the model never
        # produces them; kernel emits zeros, XLA a uniform average) —
        # compare only defined rows.
        valid_rows = np.asarray(mask).any(axis=1)
        expected = np.asarray(expected)[:, valid_rows]
        got = np.asarray(got)[:, valid_rows]
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-5, rtol=1e-5)


def test_flash_bf16_io():
    q = _rand((1, 16, 2, 32), 0).astype(jnp.bfloat16)
    k = _rand((1, 16, 2, 32), 1).astype(jnp.bfloat16)
    v = _rand((1, 16, 2, 32), 2).astype(jnp.bfloat16)
    out = flash_attention(q, k, v, causal_mask(16))
    assert out.dtype == jnp.bfloat16
    expected = xla_attention(q, k, v, causal_mask(16))
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(expected, dtype=np.float32),
                               atol=2e-2)


def test_flash_gradients_match_xla():
    q = _rand((1, 12, 2, 16), 3)
    k = _rand((1, 12, 2, 16), 4)
    v = _rand((1, 12, 2, 16), 5)
    mask = banded_mask(12, 12, 4)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, mask) ** 2).sum()

    def loss_xla(q, k, v):
        return (xla_attention(q, k, v, mask) ** 2).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("t,s,h,d,window", [
    (12, 12, 2, 16, 4),
    (19, 13, 2, 16, 5),   # uneven cross-attention shape -> padding paths
    (48, 30, 3, 32, 10),  # decoder-like banded memory window
])
def test_flash_gradients_match_xla_shapes(t, s, h, d, window):
    """The Pallas backward kernels (dq + dkv) vs XLA autodiff."""
    q = _rand((2, t, h, d), 3)
    k = _rand((2, s, h, d), 4)
    v = _rand((2, s, h, d), 5)
    mask = banded_mask(t, s, window)
    # Rows with no attendable column are undefined (kernel: zeros, XLA:
    # uniform average; the model never produces them) — scope the loss to
    # defined rows so both paths see identical gradient signals.
    valid = mask.any(axis=1)[None, :, None, None]

    def loss_flash(q, k, v):
        return ((flash_attention(q, k, v, mask) * valid) ** 2).sum()

    def loss_xla(q, k, v):
        return ((xla_attention(q, k, v, mask) * valid) ** 2).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   atol=5e-5, rtol=1e-4)


def test_flash_gradients_bf16():
    q = _rand((1, 16, 2, 32), 6).astype(jnp.bfloat16)
    k = _rand((1, 16, 2, 32), 7).astype(jnp.bfloat16)
    v = _rand((1, 16, 2, 32), 8).astype(jnp.bfloat16)
    mask = causal_mask(16)

    def loss(fn):
        return lambda q, k, v: (fn(q, k, v, mask).astype(jnp.float32)
                                ** 2).sum()

    g_flash = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss(xla_attention), argnums=(0, 1, 2))(q, k, v)
    for gf, gx in zip(g_flash, g_xla):
        assert gf.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(gf, dtype=np.float32),
                                   np.asarray(gx, dtype=np.float32),
                                   atol=5e-2, rtol=5e-2)


@pytest.mark.slow
def test_model_gradients_with_pallas_attention_match_xla():
    """Full-model gradient parity: the decoder trains through the Pallas
    forward AND backward kernels (dropout off — the CPU interpret path)."""
    from tests.helpers import TINY_CONFIG, synthetic_batch
    from videocad_tpu.models import create_model, init_model

    base = dict(TINY_CONFIG)
    m_xla = create_model(base)
    m_pl = create_model(dict(base, attention_impl="pallas"))
    params = init_model(m_xla, jax.random.PRNGKey(0), batch=1, seq_len=2)
    data = synthetic_batch(np.random.default_rng(0), 1, 6, image_size=32)
    batch = {k: jnp.asarray(v) for k, v in data.items()}

    def loss(model):
        def f(p):
            cmd, par = model.apply({"params": p}, batch, deterministic=True)
            return (cmd.astype(jnp.float32) ** 2).mean() + (
                par.astype(jnp.float32) ** 2).mean()
        return f

    g_xla = jax.grad(loss(m_xla))(params)
    g_pl = jax.grad(loss(m_pl))(params)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(g_xla)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_pl)
    for (path, gx), (_, gp) in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), atol=5e-5, rtol=5e-4,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel dropout uses the TPU hardware PRNG")
@pytest.mark.parametrize("t,s,h", [(16, 16, 2), (40, 24, 3)])
def test_flash_dropout_gradients_exact_on_tpu(t, s, h):
    """Extract the hardware-PRNG keep mask (identity-V trick: with V = I
    the output IS the dropped weight matrix; requires D == S), rebuild the
    same function in pure JAX with that fixed mask, and require matching
    gradients — proves the forward and BOTH backward kernels regenerate
    the identical bit stream for any grid decomposition."""
    d = s  # identity-V trick needs D == S
    rate = 0.35
    seed = jnp.int32(1234)
    # HIGHEST on both sides: at default precision the MXU quantizes f32
    # inputs to bf16 passes, and kernel-vs-XLA comparisons drown in that
    # ~0.4% input rounding (the quantization point differs: p*drop in the
    # kernel vs w*keep in the reference). This test is about MASK
    # consistency across fwd/dq/dkv grids, so remove the rounding noise.
    hi = jax.lax.Precision.HIGHEST
    mask = banded_mask(t, s, 6)
    q = _rand((2, t, h, d), 0)
    k = _rand((2, s, h, d), 1)
    v = _rand((2, s, h, d), 2)

    def flash(q, k, v, r):
        return flash_attention(q, k, v, mask, seed, r, 128, 128, hi)

    # Rows with no attendable column are undefined (kernel: zeroed
    # weights, XLA: uniform average; the model never produces them —
    # causal self-attention always attends col == t) — scope everything
    # to defined rows so both sides see identical gradient signals.
    valid = mask.any(axis=1)[None, :, None, None]

    eye = jnp.broadcast_to(jnp.eye(s, d)[None, :, None, :], (2, s, h, d))
    dropped_w = flash(q, k, eye, rate) * valid  # (B,T,H,S)
    plain_w = flash(q, k, eye, 0.0) * valid
    keep = np.asarray(dropped_w) != 0.0
    # forward self-consistency: dropped == plain * keep / (1 - rate)
    np.testing.assert_allclose(
        np.asarray(dropped_w), np.asarray(plain_w) * keep / (1.0 - rate),
        atol=1e-5)
    # sanity: the empirical drop rate is in the right ballpark
    attendable = np.broadcast_to(np.asarray(mask)[None, :, None, :],
                                 keep.shape) & (np.asarray(plain_w) != 0)
    frac = 1.0 - keep[attendable].mean()
    assert 0.2 < frac < 0.5, frac

    keep_m = jnp.asarray(keep).transpose(0, 2, 1, 3)  # (B,H,T,S)

    def f_flash(q, k, v):
        out = flash(q, k, v, rate) * valid
        return (out.astype(jnp.float32) ** 2).sum()

    def f_ref(q, k, v):
        depth = q.shape[-1]
        scores = jnp.einsum("bthd,bshd->bhts", q, k,
                            precision=hi) / (depth ** 0.5)
        scores = jnp.where(mask[None, None], scores, -1e30)
        w = jax.nn.softmax(scores, axis=-1)
        w = jnp.where(keep_m, w / (1.0 - rate), 0.0)
        out = jnp.einsum("bhts,bshd->bthd", w, v, precision=hi) * valid
        return (out.astype(jnp.float32) ** 2).sum()

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    # A single fwd/bwd mask-bit divergence (the ADVICE r1 failure mode)
    # shifts gradients by O(w*g/(1-rate)) ~ 0.1-1; 5e-4 is residual exp
    # rounding, 3+ orders below that signal.
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-4, rtol=1e-3)


def test_model_with_pallas_attention_matches_xla():
    from tests.helpers import TINY_CONFIG, synthetic_batch
    from videocad_tpu.models import create_model, init_model

    base = dict(TINY_CONFIG)
    m_xla = create_model(base)
    params = init_model(m_xla, jax.random.PRNGKey(0), batch=1, seq_len=2)
    m_pl = create_model(dict(base, attention_impl="pallas"))
    data = synthetic_batch(np.random.default_rng(0), 1, 6, image_size=32)
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    out_xla = m_xla.apply({"params": params}, batch, deterministic=True)
    out_pl = m_pl.apply({"params": params}, batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_xla[0]), np.asarray(out_pl[0]),
                               atol=5e-5, rtol=1e-4)
