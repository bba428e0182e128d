"""Int8 quantized matmul (ops/quant.py): value accuracy + gradient contract.

The quantization scheme is dynamic symmetric per-channel (per-row for
activations, per-column for weights); with 127 levels the per-element error
of each operand is <= scale/2, so the relative error of a well-conditioned
matmul stays at the ~1% level. The bf16-backward mode must produce EXACTLY
the straight-through gradients (the gradients of the unquantized matmul);
the int8-backward mode must stay close to them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocad_tpu.ops.quant import q8_matmul, quantized_dense


def _rand(shape, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0.0, scale, size=shape), dtype=jnp.float32)


class TestForward:
    def test_matches_exact_matmul_closely(self):
        x = _rand((64, 128), 0)
        w = _rand((128, 96), 1)
        exact = x @ w
        q = q8_matmul(x, w)
        # relative Frobenius error of dynamic per-channel int8
        rel = jnp.linalg.norm(q - exact) / jnp.linalg.norm(exact)
        assert rel < 0.02, float(rel)

    def test_3d_batch_shapes(self):
        x = _rand((4, 17, 32), 2)
        w = _rand((32, 48), 3)
        q = q8_matmul(x, w)
        assert q.shape == (4, 17, 48)
        exact = jnp.einsum("btk,kn->btn", x, w)
        rel = jnp.linalg.norm(q - exact) / jnp.linalg.norm(exact)
        assert rel < 0.05, float(rel)

    def test_per_channel_scales_handle_mixed_magnitudes(self):
        # One row 1000x larger than another: per-row scales keep BOTH
        # accurate (a per-tensor scheme would crush the small row).
        x = jnp.concatenate([_rand((1, 64), 4) * 1000.0, _rand((1, 64), 5)])
        w = _rand((64, 32), 6)
        q = q8_matmul(x, w)
        exact = x @ w
        for row in range(2):
            rel = (jnp.linalg.norm(q[row] - exact[row])
                   / jnp.linalg.norm(exact[row]))
            assert rel < 0.02, (row, float(rel))

    def test_preserves_dtype_bf16(self):
        x = _rand((8, 16), 7).astype(jnp.bfloat16)
        w = _rand((16, 8), 8).astype(jnp.bfloat16)
        assert q8_matmul(x, w).dtype == jnp.bfloat16

    def test_zero_rows_are_finite(self):
        x = jnp.zeros((4, 16))
        w = _rand((16, 8), 9)
        assert bool(jnp.all(jnp.isfinite(q8_matmul(x, w))))
        assert bool(jnp.all(q8_matmul(x, w) == 0.0))


class TestBackward:
    def test_bf16_backward_is_straight_through(self):
        # STE contract: grads equal the grads of the UNquantized matmul.
        x = _rand((12, 32), 10)
        w = _rand((32, 24), 11)
        dy = _rand((12, 24), 12)

        def loss_q(x, w):
            return jnp.sum(q8_matmul(x, w, "bf16") * dy)

        def loss_exact(x, w):
            return jnp.sum((x @ w) * dy)

        gxq, gwq = jax.grad(loss_q, argnums=(0, 1))(x, w)
        gx, gw = jax.grad(loss_exact, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gxq), np.asarray(gx),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gwq), np.asarray(gw),
                                   rtol=1e-5, atol=1e-5)

    def test_int8_backward_close_to_exact(self):
        x = _rand((32, 64), 13)
        w = _rand((64, 48), 14)
        dy = _rand((32, 48), 15)

        def loss_q(x, w):
            return jnp.sum(q8_matmul(x, w, "int8") * dy)

        def loss_exact(x, w):
            return jnp.sum((x @ w) * dy)

        gxq, gwq = jax.grad(loss_q, argnums=(0, 1))(x, w)
        gx, gw = jax.grad(loss_exact, argnums=(0, 1))(x, w)
        for got, want in ((gxq, gx), (gwq, gw)):
            rel = jnp.linalg.norm(got - want) / jnp.linalg.norm(want)
            assert rel < 0.03, float(rel)

    def test_3d_grad_shapes(self):
        x = _rand((2, 9, 16), 16)
        w = _rand((16, 8), 17)
        gx, gw = jax.grad(
            lambda x, w: jnp.sum(q8_matmul(x, w, "int8") ** 2),
            argnums=(0, 1))(x, w)
        assert gx.shape == x.shape and gw.shape == w.shape
        assert bool(jnp.all(jnp.isfinite(gx))) and bool(jnp.all(jnp.isfinite(gw)))

    def test_grad_dtypes_follow_inputs(self):
        x = _rand((4, 16), 18).astype(jnp.bfloat16)
        w = _rand((16, 8), 19)  # f32 master weight
        gx, gw = jax.grad(
            lambda x, w: jnp.sum(q8_matmul(x, w).astype(jnp.float32)),
            argnums=(0, 1))(x, w)
        assert gx.dtype == jnp.bfloat16
        assert gw.dtype == jnp.float32


class TestQuantizedDense:
    def test_bias_and_dtype(self):
        x = _rand((5, 16), 20)
        k = _rand((16, 8), 21)
        b = _rand((8,), 22)
        y = quantized_dense(x, k, b, jnp.bfloat16)
        assert y.dtype == jnp.bfloat16
        exact = x @ k + b
        rel = (jnp.linalg.norm(y.astype(jnp.float32) - exact)
               / jnp.linalg.norm(exact))
        assert rel < 0.05, float(rel)

    def test_no_bias(self):
        x = _rand((5, 16), 23)
        k = _rand((16, 8), 24)
        y = quantized_dense(x, k, None, jnp.float32)
        assert y.shape == (5, 8)


class TestTrainability:
    def test_sgd_on_q8_layer_converges(self):
        # A linear-regression fit through the quantized layer must still
        # drive the loss down (the STE gradients are descent directions).
        rng = np.random.default_rng(25)
        w_true = jnp.asarray(rng.normal(size=(16, 4)), dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=(256, 16)), dtype=jnp.float32)
        y = x @ w_true
        w = jnp.zeros((16, 4))

        def loss(w):
            return jnp.mean((q8_matmul(x, w) - y) ** 2)

        l0 = float(loss(w))
        g = jax.jit(jax.grad(loss))
        for _ in range(200):
            w = w - 0.05 * g(w)
        assert float(loss(w)) < 0.02 * l0

    @pytest.mark.parametrize("backward", ["bf16", "int8"])
    def test_jit_and_value_and_grad(self, backward):
        x = _rand((8, 32), 26)
        w = _rand((32, 16), 27)
        f = jax.jit(jax.value_and_grad(
            lambda w: jnp.sum(q8_matmul(x, w, backward))))
        v, g = f(w)
        assert np.isfinite(float(v)) and bool(jnp.all(jnp.isfinite(g)))
