"""Fused transformer sub-block kernels (ops/fused_block.py).

CPU runs the kernels in interpret mode (dropout off — the hardware PRNG
only exists on TPU); TPU-gated tests cover the in-kernel dropout path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videocad_tpu.ops.fused_block import attn_block, mlp_block


def _r(rng, shape, scale=0.3):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32) * scale


def _ref_ln(x, g, be, eps=1e-5):
    f32 = x.astype(jnp.float32)
    mu = f32.mean(-1, keepdims=True)
    var = ((f32 - mu) ** 2).mean(-1, keepdims=True)
    return (f32 - mu) * jax.lax.rsqrt(var + eps) * g + be


def _ref_mlp(x, w1, b1, w2, b2, g, be):
    h = _ref_ln(x, g, be)
    z = h @ w1 + b1
    a = 0.5 * z * (1 + jax.lax.erf(z / jnp.sqrt(2.0)))
    return x + a @ w2 + b2


def _ref_attn(x, wq, wk, wv, wo, bo, g, be, heads):
    b, t, d = x.shape
    h = _ref_ln(x, g, be)
    q = (h @ wq).reshape(b, t, heads, -1)
    k = (h @ wk).reshape(b, t, heads, -1)
    v = (h @ wv).reshape(b, t, heads, -1)
    s = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(1.0 * q.shape[-1])
    w = jax.nn.softmax(s, -1)
    a = jnp.einsum("bhts,bshd->bthd", w, v).reshape(b, t, -1)
    return x + a @ wo + bo


def _mlp_params(rng, d=64, f=48):
    return (_r(rng, (d, f)), _r(rng, (f,)), _r(rng, (f, d)), _r(rng, (d,)),
            jnp.ones(d) + _r(rng, (d,), 0.1), _r(rng, (d,)))


def _attn_params(rng, d=64, inner=64):
    return (_r(rng, (d, inner)), _r(rng, (d, inner)), _r(rng, (d, inner)),
            _r(rng, (inner, d)), _r(rng, (d,)),
            jnp.ones(d) + _r(rng, (d,), 0.1), _r(rng, (d,)))


@pytest.mark.parametrize("b,t", [(4, 10), (3, 7), (1, 5)])
def test_mlp_block_forward(b, t):
    rng = np.random.default_rng(0)
    x = _r(rng, (b, t, 64))
    p = _mlp_params(rng)
    np.testing.assert_allclose(np.asarray(mlp_block(x, *p, 0)),
                               np.asarray(_ref_mlp(x, *p)),
                               atol=2e-5, rtol=2e-5)


def test_mlp_block_gradients():
    rng = np.random.default_rng(1)
    x = _r(rng, (4, 10, 64))
    p = _mlp_params(rng)

    gk = jax.grad(lambda *a: (mlp_block(*a, 0) ** 2).sum(),
                  argnums=tuple(range(7)))(x, *p)
    gr = jax.grad(lambda *a: (_ref_mlp(*a) ** 2).sum(),
                  argnums=tuple(range(7)))(x, *p)
    for i, (a, b) in enumerate(zip(gk, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=2e-3, err_msg=f"grad {i}")


@pytest.mark.parametrize("b,t,heads", [(4, 10, 4), (2, 9, 2)])
def test_attn_block_forward(b, t, heads):
    rng = np.random.default_rng(2)
    x = _r(rng, (b, t, 64))
    p = _attn_params(rng)
    np.testing.assert_allclose(
        np.asarray(attn_block(x, *p, 0, heads)),
        np.asarray(_ref_attn(x, *p, heads)), atol=2e-5, rtol=2e-5)


def test_attn_block_gradients():
    rng = np.random.default_rng(3)
    x = _r(rng, (4, 10, 64))
    p = _attn_params(rng)

    gk = jax.grad(lambda *a: (attn_block(*a, 0, 4) ** 2).sum(),
                  argnums=tuple(range(8)))(x, *p)
    gr = jax.grad(lambda *a: (_ref_attn(*a, 4) ** 2).sum(),
                  argnums=tuple(range(8)))(x, *p)
    for i, (a, b) in enumerate(zip(gk, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=2e-3, err_msg=f"grad {i}")


def test_bf16_blocks_close_to_f32():
    rng = np.random.default_rng(4)
    x = _r(rng, (2, 8, 64))
    p = _attn_params(rng)
    y32 = attn_block(x, *p, 0, 4)
    y16 = attn_block(x.astype(jnp.bfloat16), *p, 0, 4)
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y16, dtype=np.float32),
                               np.asarray(y32), atol=0.25, rtol=0.1)


def test_model_block_impl_matches_xla():
    """Full model: vit_attention_impl='block' == 'xla' (params + logits +
    gradients). The param trees must be identical (ParamDense/LNParams
    mirror nn.Dense/nn.LayerNorm naming and init) so checkpoints are
    interchangeable across impls."""
    from tests.helpers import TINY_CONFIG, synthetic_batch
    from videocad_tpu.models import create_model, init_model

    base = dict(TINY_CONFIG)
    m_x = create_model(base)
    m_b = create_model(dict(base, vit_attention_impl="block"))
    p_x = init_model(m_x, jax.random.PRNGKey(0), batch=1, seq_len=2)
    p_b = init_model(m_b, jax.random.PRNGKey(0), batch=1, seq_len=2)
    assert (jax.tree_util.tree_structure(p_x)
            == jax.tree_util.tree_structure(p_b))
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(p_x)[0],
            jax.tree_util.tree_flatten_with_path(p_b)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(path))

    data = synthetic_batch(np.random.default_rng(0), 1, 6, image_size=32)
    batch = {k: jnp.asarray(v) for k, v in data.items()}

    def loss(model):
        def f(p):
            cmd, par = model.apply({"params": p}, batch, deterministic=True)
            return ((cmd.astype(jnp.float32) ** 2).mean()
                    + (par.astype(jnp.float32) ** 2).mean())
        return f

    np.testing.assert_allclose(float(loss(m_b)(p_x)), float(loss(m_x)(p_x)),
                               rtol=1e-4)
    g_x = jax.grad(loss(m_x))(p_x)
    g_b = jax.grad(loss(m_b))(p_x)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_x)[0],
            jax.tree_util.tree_flatten_with_path(g_b)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4,
                                   rtol=5e-3,
                                   err_msg=jax.tree_util.keystr(path))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel dropout uses the TPU hardware PRNG")
def test_block_dropout_on_tpu():
    """In-kernel dropout: deterministic per seed, distinct across seeds,
    empirical drop rate in the right ballpark, gradients finite."""
    rng = np.random.default_rng(5)
    x = _r(rng, (8, 16, 128))
    p = _attn_params(rng, d=128, inner=128)
    rate = 0.3

    y1 = attn_block(x, *p, jnp.int32(7), 4, rate)
    y2 = attn_block(x, *p, jnp.int32(7), 4, rate)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3 = attn_block(x, *p, jnp.int32(8), 4, rate)
    assert not np.allclose(np.asarray(y1), np.asarray(y3))

    mp = _mlp_params(rng, d=128, f=128)
    # The residual-branch mask is observable: y - x == drop(o), whose
    # zero fraction ~ rate.
    ym = mlp_block(x, *mp, jnp.int32(9), rate)
    o = np.asarray(ym) - np.asarray(x)
    frac = (np.abs(o) < 1e-12).mean()
    assert 0.15 < frac < 0.45, frac

    g = jax.grad(lambda xx: (attn_block(xx, *p, jnp.int32(7), 4, rate)
                             ** 2).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel dropout uses the TPU hardware PRNG")
@pytest.mark.parametrize("op", ["mlp", "attn"])
def test_block_dropout_fwd_bwd_masks_agree_on_tpu(op):
    """The forward and backward kernels regenerate the SAME dropout mask
    (ADVICE r2 medium): central finite differences of the forward — which
    bake the forward kernel's mask into the loss landscape — must match
    the custom-vjp analytic gradient, which re-draws the mask in the
    backward kernel. A fwd/bwd mask divergence zeroes/doubles whole rows
    of the gradient (O(1) error), far above FD noise. Run at t=50: a
    non-128-multiple token count, the layout-sensitive sub-128-lane case
    (attn_block's (t, t) score draws; docs r2 layout lessons).
    """
    rng = np.random.default_rng(6)
    b, t, d = 4, 50, 128
    x = _r(rng, (b, t, d))
    rate = 0.35
    seed = jnp.int32(1234)
    hi = jax.lax.Precision.HIGHEST
    # Fixed asymmetric cotangent so every gradient entry is exercised.
    w_loss = _r(rng, (b, t, d), scale=1.0)

    if op == "mlp":
        p = _mlp_params(rng, d=d, f=128)
        f = lambda xx: (mlp_block(xx, *p, seed, rate, 1e-5, None, hi)
                        * w_loss).sum()
    else:
        p = _attn_params(rng, d=d, inner=d)
        f = lambda xx: (attn_block(xx, *p, seed, 4, rate, 1e-5, None, hi)
                        * w_loss).sum()

    # Forward is deterministic per seed (precondition for FD).
    np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(f(x)))

    g = np.asarray(jax.grad(f)(x))
    probes = rng.choice(b * t * d, size=12, replace=False)
    eps = 3e-3
    for flat_idx in probes:
        idx = np.unravel_index(flat_idx, (b, t, d))
        e = jnp.zeros_like(x).at[idx].set(eps)
        fd = (float(f(x + e)) - float(f(x - e))) / (2 * eps)
        assert abs(fd - g[idx]) <= 2e-2 * max(1.0, abs(fd)), (
            op, idx, fd, g[idx])
