"""Fused LayerNorm kernel vs flax nn.LayerNorm (interpret mode)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocad_tpu.ops.layernorm import layer_norm


def _ref(x, scale, bias, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps) * scale
            + bias).astype(x.dtype)


@pytest.mark.parametrize("shape", [(64, 128), (3, 50, 64), (100, 256)])
def test_layer_norm_matches_reference(shape):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.float32)
    scale = jax.random.normal(jax.random.PRNGKey(1), (shape[-1],)) + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (shape[-1],))
    got = layer_norm(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(
        _ref(x, scale, bias)), atol=1e-5, rtol=1e-5)


def test_layer_norm_gradients_match():
    x = jax.random.normal(jax.random.PRNGKey(3), (40, 96), jnp.float32)
    scale = jax.random.normal(jax.random.PRNGKey(4), (96,)) + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(5), (96,))

    def loss_fused(x, s, b):
        return (layer_norm(x, s, b) ** 2).sum()

    def loss_ref(x, s, b):
        return (_ref(x, s, b) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-3)


def test_layer_norm_uneven_rows_padding():
    # 3*17=51 rows -> padded to a block multiple; param grads must exclude
    # the padding
    x = jax.random.normal(jax.random.PRNGKey(6), (51, 32), jnp.float32)
    scale = jnp.ones((32,))
    bias = jnp.zeros((32,))
    g = jax.grad(lambda s: layer_norm(x, s, bias).sum())(scale)
    expected = jax.grad(lambda s: _ref(x, s, bias).sum())(scale)
    np.testing.assert_allclose(np.asarray(g), np.asarray(expected),
                               atol=1e-4, rtol=1e-4)


def test_model_with_pallas_ln_matches_xla():
    from tests.helpers import TINY_CONFIG, synthetic_batch
    from videocad_tpu.models import create_model, init_model

    base = dict(TINY_CONFIG)
    m_xla = create_model(base)
    params = init_model(m_xla, jax.random.PRNGKey(0), batch=1, seq_len=2)
    m_pl = create_model(dict(base, ln_impl="pallas"))
    data = synthetic_batch(np.random.default_rng(0), 1, 4, image_size=32)
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    out_xla = m_xla.apply({"params": params}, batch, deterministic=True)
    out_pl = m_pl.apply({"params": params}, batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_xla[0]), np.asarray(out_pl[0]),
                               atol=5e-5, rtol=1e-3)
