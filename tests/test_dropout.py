"""Dropout op: semantics of the XLA fallback; the hardware-PRNG Pallas path
runs only on TPU (validated by the benchmark/TPU runs)."""

import jax
import jax.numpy as jnp
import numpy as np

from videocad_tpu.ops.dropout import dropout


def test_deterministic_is_identity():
    x = jnp.ones((8, 8))
    out = dropout(x, jax.random.PRNGKey(0), 0.5, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_rate_zero_is_identity():
    x = jnp.ones((8, 8))
    out = dropout(x, jax.random.PRNGKey(0), 0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_drop_fraction_and_scaling():
    x = jnp.ones((256, 256))
    rate = 0.3
    # the XLA path quantizes the rate to u8-threshold granularity and
    # scales by the inverse of the EFFECTIVE keep probability (unbiased)
    eff_rate = round(rate * 256) / 256.0
    out = np.asarray(dropout(x, jax.random.PRNGKey(1), rate))
    kept = out != 0
    np.testing.assert_allclose(out[kept], 1.0 / (1.0 - eff_rate), rtol=1e-6)
    # drop fraction close to rate (quantization error <= 1/512 < slack)
    assert abs(1 - kept.mean() - rate) < 0.02
    # unbiased in expectation
    assert abs(out.mean() - 1.0) < 0.02


def test_gradient_is_mask_over_keep():
    x = jnp.ones((64, 64))
    rate = 0.25
    key = jax.random.PRNGKey(2)

    def f(x):
        return dropout(x, key, rate).sum()

    out = np.asarray(dropout(x, key, rate))
    grad = np.asarray(jax.grad(f)(x))
    np.testing.assert_allclose(grad, out)  # d(x*m/k)/dx = m/k, x==1
