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
