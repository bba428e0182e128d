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


def _extract_site_masks(b, t, d, f, num_heads, seed, rate):
    """Draw every dropout site's keep/(1-rate) mask with a minimal Pallas
    kernel using the SAME per-absolute-frame stream the block kernels use
    ((seed, frame * N_SITES + site), one program per frame — a different
    grid decomposition than the fused kernels' bb-frame blocks, which is
    the point: the streams must be block- and layout-invariant)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from videocad_tpu.ops.fused_block import (
        _SITE_ATTN_RES, _SITE_ATTN_W, _SITE_MLP_HID, _SITE_MLP_RES, _draw)
    from videocad_tpu.ops.prng import keep_scale, seed_arr

    def kernel(seed_ref, attn_w_ref, attn_res_ref, mlp_hid_ref,
               mlp_res_ref):
        frame = pl.program_id(0)
        attn_w = _draw(seed_ref, frame, _SITE_ATTN_W, (1, num_heads, t, t))
        attn_res = _draw(seed_ref, frame, _SITE_ATTN_RES, (t, d))
        mlp_hid = _draw(seed_ref, frame, _SITE_MLP_HID, (t, f))
        mlp_res = _draw(seed_ref, frame, _SITE_MLP_RES, (t, d))
        attn_w_ref[:] = keep_scale(attn_w, rate)
        attn_res_ref[:] = keep_scale(attn_res, rate)[None]
        mlp_hid_ref[:] = keep_scale(mlp_hid, rate)[None]
        mlp_res_ref[:] = keep_scale(mlp_res, rate)[None]

    f32 = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct((b, num_heads, t, t), f32),
        jax.ShapeDtypeStruct((b, t, d), f32),
        jax.ShapeDtypeStruct((b, t, f), f32),
        jax.ShapeDtypeStruct((b, t, d), f32),
    )
    spec = lambda *dims: pl.BlockSpec(  # noqa: E731
        dims, lambda i: (i,) + (0,) * (len(dims) - 1),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(spec(1, num_heads, t, t), spec(1, t, d), spec(1, t, f),
                   spec(1, t, d)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(seed_arr(seed))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel dropout uses the TPU hardware PRNG")
@pytest.mark.parametrize("op", ["mlp", "attn"])
def test_block_dropout_fwd_bwd_masks_agree_on_tpu(op):
    """Forward AND backward of the fused block kernels regenerate the
    exact dropout streams (ADVICE r2 medium): extract every site's mask
    with an independent single-frame-grid draw kernel, rebuild the block
    in pure JAX with those fixed masks, and require matching outputs and
    matching gradients for every input/parameter. A fwd/bwd or
    cross-kernel stream divergence (the sub-128-lane layout-sensitivity
    class, r2) zeroes/doubles mask-sized gradient regions — far above the
    tolerances here. Run at t=50: the model's real, non-multiple-of-8
    sublane token count.
    """
    from videocad_tpu.ops.fused_block import _gelu

    rng = np.random.default_rng(6)
    b, t, d = 4, 50, 128
    heads = 4
    x = _r(rng, (b, t, d))
    rate = 0.35
    seed = jnp.int32(1234)
    hi = jax.lax.Precision.HIGHEST
    w_loss = _r(rng, (b, t, d), scale=1.0)
    attn_w_m, attn_res_m, mlp_hid_m, mlp_res_m = _extract_site_masks(
        b, t, d, d, heads, seed, rate)
    # sanity: empirical drop rate near the nominal one
    assert 0.25 < float((attn_w_m == 0).mean()) < 0.45

    if op == "mlp":
        p = _mlp_params(rng, d=d, f=d)
        w1, b1, w2, b2, g, be = p

        def fused(xx):
            return (mlp_block(xx, *p, seed, rate, 1e-5, None, hi)
                    * w_loss).sum()

        def ref(xx):
            h = _ref_ln(xx, g, be)
            z = jnp.einsum("btd,df->btf", h, w1, precision=hi) + b1
            a = _gelu(z) * mlp_hid_m
            o = jnp.einsum("btf,fd->btd", a, w2, precision=hi) + b2
            return ((xx + o * mlp_res_m) * w_loss).sum()
    else:
        p = _attn_params(rng, d=d, inner=d)
        wq, wk, wv, wo, bo, g, be = p
        hd = d // heads

        def fused(xx):
            return (attn_block(xx, *p, seed, heads, rate, 1e-5, None, hi)
                    * w_loss).sum()

        def ref(xx):
            h = _ref_ln(xx, g, be)
            q = jnp.einsum("btd,di->bti", h, wq,
                           precision=hi).reshape(b, t, heads, hd)
            k = jnp.einsum("btd,di->bti", h, wk,
                           precision=hi).reshape(b, t, heads, hd)
            v = jnp.einsum("btd,di->bti", h, wv,
                           precision=hi).reshape(b, t, heads, hd)
            s = jnp.einsum("bthd,bshd->bhts", q, k,
                           precision=hi) / jnp.sqrt(1.0 * hd)
            w = jax.nn.softmax(s, -1) * attn_w_m
            a = jnp.einsum("bhts,bshd->bthd", w, v,
                           precision=hi).reshape(b, t, d)
            o = jnp.einsum("bti,id->btd", a, wo, precision=hi) + bo
            return ((xx + o * attn_res_m) * w_loss).sum()

    np.testing.assert_allclose(float(fused(x)), float(ref(x)), rtol=1e-4)
    g_fused = np.asarray(jax.grad(fused)(x))
    g_ref = np.asarray(jax.grad(ref)(x))
    np.testing.assert_allclose(g_fused, g_ref, atol=2e-3, rtol=2e-2)
