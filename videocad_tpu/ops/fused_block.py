"""Fused pre-LN transformer sub-block kernels (the whole ViT layer in Pallas).

Motivation (r2 trace, tools/analyze_trace.py): after the v4 fused-MHSA
kernel the remaining non-matmul step time was dominated by the *boundaries*
of the attention kernel and the ops between kernels — per layer: LayerNorm
stat/affine fusions (~2 ms), dropout mask generation (~1.3 ms), and layout
copies on every (B, T, H*D) kernel operand (~2 ms) because XLA lowers
Dense-on-3D to a convolution whose preferred layout is token-major {2,0,1}
while Pallas requires {2,1,0}.  Re-laying out the model (2D token streams)
only moved the copies (measured: 10,563 -> 9,089 frames/s).  The structural
fix is to absorb the projections into the kernel so the 1024-lane q/k/v
tensors never exist in HBM at all:

  ``attn_block``:  y = x + drop(W_o @ MHSA(LN(x) @ W_qkv) + b_o)
  ``mlp_block``:   y = x + drop(W_2 @ drop(gelu(W_1 @ LN(x) + b_1)) + b_2)

Per ViT layer the XLA graph then contains exactly two custom-calls with
(B, T, 512) operands produced/consumed by elementwise ops (which follow
the kernels' layout), eliminating the LN fusions, the dropout
mask/threefry work, the projection-boundary copies, and all attention
intermediates.

MEASURED OUTCOME (docs/PERF.md "Whole-layer fused block kernels"): at the
flagship operating point this is throughput-PARITY, not a win — the
eliminated ~30 ms/step of copies/LN/dropout comes back as in-kernel
matmuls at ~60% of XLA's efficiency (the f32 weight-gradient accumulators
plus weights cap the frame block at 2 of the 16 MB VMEM).  The kernels
are kept as a MEMORY mode: the custom_vjp retains only ``x`` per
sub-block (free rematerialization), so batch 16 fits where the default
path OOMs (fused+mlp_block: 10,350 f/s at B=16).  Flagship default stays
``vit_attention_impl="fused"``.

Design notes
  * Grid: 1D over frame blocks; one program handles ``bb`` frames
    (all T tokens, all heads).
  * Weights ride in ``pl.ANY`` (HBM) and are DMA'd into PERSISTENT VMEM
    scratch once, at program 0 — pipelined BlockSpecs double-buffer even
    constant-index blocks, which blew the 16 MB VMEM budget for the
    backward (observed: 23.45M requested).  Scratch buffers survive
    across the sequential grid, so later programs reuse the copies.
  * Backward: full recompute from x (flash-style trade).  Weight/bias/LN
    gradients accumulate in f32 VMEM scratch across the grid and are
    DMA'd to HBM outputs at the last program.  The attention backward's
    three (D, H*hd) qkv weight gradients do NOT fit alongside the rest:
    the kernel instead emits the (h, dqkv) activations and the wrapper
    computes dWqkv as one big XLA dot (see ``_attn_bwd_kernel``).  The
    grid is forced sequential (dimension_semantics 'arbitrary') so
    read-modify-write accumulation is race-free on megacore parts.
  * Dropout runs on the TPU hardware PRNG with a per-ABSOLUTE-frame
    stream (seed, frame * n_sites + site), so the forward and backward
    kernels regenerate identical masks for any frame-block size (the
    block-invariance lesson of ADVICE r1); all seed/draw pairs execute
    back-to-back before any compute (the compiler groups stateful pairs —
    interleaving draws with compute made later chunks read the last
    seed's bits, observed on v5e in ops/attention.py).  Off-TPU there is
    no hardware PRNG: models/vit.py falls back to the XLA path for
    dropout training off-TPU (same contract as ops/fused_attention.py).
  * dtype flow mirrors the XLA modules: LN statistics in f32, matmul
    inputs cast to the compute dtype (bf16 on the flagship), f32
    accumulation (preferred_element_type), f32 softmax, erf GELU (A&S
    rational approximation — Mosaic has no erf lowering).

Reference semantics: vit_pytorch Transformer block
(/root/reference/model/trajectory_model.py:53-67 selects the ViT whose
blocks are PreNorm(Attention) + PreNorm(FeedForward)); LayerNorm eps 1e-5
(torch default).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videocad_tpu.ops.prng import keep_scale as _keep_scale
from videocad_tpu.ops.prng import require_seed as _require_seed
from videocad_tpu.ops.prng import seed_arr as _seed_arr

_VMEM_BUDGET = 13 * 1024 * 1024

# Dropout stream sites per frame (fwd and bwd must agree: the stream index
# is (frame * _N_SITES + site)).
_SITE_ATTN_W = 0    # attention-weight dropout, draw (1, H, T, T)
_SITE_ATTN_RES = 1  # attention residual-branch dropout, draw (T, D)
_SITE_MLP_HID = 2   # post-GELU dropout, draw (T, F)
_SITE_MLP_RES = 3   # MLP residual-branch dropout, draw (T, D)
_N_SITES = 4


def _draw(seed_ref, frame, site, shape):
    pltpu.prng_seed(seed_ref[0], frame * _N_SITES + site)
    return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)


def _load_once(hbm_refs, vmem_refs, sem):
    """DMA full tensors HBM -> persistent VMEM scratch, at program 0."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        for h, v in zip(hbm_refs, vmem_refs):
            cp = pltpu.make_async_copy(h, v, sem)
            cp.start()
            cp.wait()


def _flush_last(vmem_refs, hbm_refs, sem):
    """DMA accumulators VMEM scratch -> HBM outputs, at the last program."""

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        for v, h in zip(vmem_refs, hbm_refs):
            cp = pltpu.make_async_copy(v, h, sem)
            cp.start()
            cp.wait()


def _zero_at_start(refs):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in refs:
            r[:] = jnp.zeros_like(r)


def _layer_norm_f32(flat, g, b, eps):
    """(N, D) f32 -> normalized f32, plus (xhat, rstd) for the backward."""
    mu = jnp.mean(flat, axis=-1, keepdims=True)
    xc = flat - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    return xhat * g + b, xhat, rstd


def _ln_bwd_rows(dh, xhat, rstd, g):
    """dx of LayerNorm given upstream dh; also returns (dg, db) summands."""
    dg = jnp.sum(dh * xhat, axis=0, keepdims=True)
    db = jnp.sum(dh, axis=0, keepdims=True)
    dxhat = dh * g
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return rstd * (dxhat - m1 - xhat * m2), dg, db


def _dot(a, b, precision=None, trans_a=False, trans_b=False):
    """2D dot with f32 accumulation; contraction picked by trans flags."""
    ca = 0 if trans_a else 1
    cb = 1 if trans_b else 0
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


def _bdot(a, b, contract_a, contract_b, precision=None):
    """Batched (N, ..) x (N, ..) dot, f32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)


def _split_heads(x3, num_heads, head_dim, bb):
    """(bb, T, H*D) f32 -> head-major (H*bb, T, D) (static lane slices;
    the direct lane-split reshape is an unsupported Mosaic shape cast)."""
    return jnp.concatenate(
        [x3[:, :, h * head_dim:(h + 1) * head_dim]
         for h in range(num_heads)], axis=0)


def _merge_heads(a, num_heads, head_dim, bb):
    """head-major (H*bb, T, D) -> (bb, T, H*D) via static lane concat."""
    return jnp.concatenate(
        [a[h * bb:(h + 1) * bb] for h in range(num_heads)], axis=2)


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7).

    Mosaic has no erf lowering; this rational-polynomial form uses only
    VPU-native ops. The 1.5e-7 absolute error is far below the bf16
    resolution of the flagship compute path and the f32 parity-test
    tolerances (the XLA path uses exact erf GELU).
    """
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu(z):
    return 0.5 * z * (1.0 + _erf(z * (2.0 ** -0.5)))


def _dgelu(z):
    cdf = 0.5 * (1.0 + _erf(z * (2.0 ** -0.5)))
    pdf = jnp.exp(-0.5 * z * z) * 0.3989422804014327  # 1/sqrt(2*pi)
    return cdf + z * pdf


def _choose_bb(b, per_frame_bytes, fixed_bytes):
    for cand in (8, 4, 2, 1):
        if b % cand != 0:
            continue
        if fixed_bytes + cand * per_frame_bytes <= _VMEM_BUDGET:
            return cand
    return 1


def _row(v):
    """(D,) param -> (1, D) f32 operand (TPU wants >=2D vectors)."""
    return jnp.reshape(v, (1, -1)).astype(jnp.float32)


def _block_spec(bb, t, d):
    return pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _any_spec():
    return pl.BlockSpec(memory_space=pl.ANY)


def _interpret(flag):
    return jax.default_backend() != "tpu" if flag is None else flag


def _seq_params():
    return pltpu.CompilerParams(dimension_semantics=("arbitrary",))


# ---------------------------------------------------------------------------
# MLP sub-block
# ---------------------------------------------------------------------------


def _mlp_recompute(seed_ref, x_ref, w1, b1, w2, b2, g, be, *, rate, eps,
                   precision):
    """Forward math from loaded weight values; returns intermediates."""
    bb, t, d = x_ref.shape
    f = w1.shape[1]
    dtype = x_ref.dtype
    xb = x_ref[:].astype(jnp.float32)
    flat = xb.reshape(bb * t, d)

    if rate > 0.0:
        # All seed/draw pairs back-to-back before any compute (see module
        # docstring); streams are per absolute frame -> block-invariant.
        base = pl.program_id(0) * bb
        hid_bits = [_draw(seed_ref, base + j, _SITE_MLP_HID, (t, f))
                    for j in range(bb)]
        res_bits = [_draw(seed_ref, base + j, _SITE_MLP_RES, (t, d))
                    for j in range(bb)]
        drop_hid = _keep_scale(jnp.concatenate(hid_bits, axis=0)
                               if bb > 1 else hid_bits[0], rate)
        drop_res = _keep_scale(jnp.concatenate(res_bits, axis=0)
                               if bb > 1 else res_bits[0], rate)
    else:
        drop_hid = drop_res = None

    h, xhat, rstd = _layer_norm_f32(flat, g, be, eps)
    hb = h.astype(dtype)
    z = _dot(hb, w1, precision) + b1
    a = _gelu(z)
    if rate > 0.0:
        a = a * drop_hid
    ab = a.astype(dtype)
    o = _dot(ab, w2, precision) + b2
    if rate > 0.0:
        o = o * drop_res
    return flat, xhat, rstd, hb, z, ab, o, drop_hid, drop_res


def _mlp_fwd_kernel(seed_ref, x_ref, w1_hbm, b1_ref, w2_hbm, b2_ref, g_ref,
                    be_ref, y_ref, w1_v, w2_v, sem, *, rate, eps, precision):
    bb, t, d = x_ref.shape
    _load_once((w1_hbm, w2_hbm), (w1_v, w2_v), sem)
    flat, _, _, _, _, _, o, _, _ = _mlp_recompute(
        seed_ref, x_ref, w1_v[:], b1_ref[0].astype(jnp.float32), w2_v[:],
        b2_ref[0].astype(jnp.float32), g_ref[0].astype(jnp.float32),
        be_ref[0].astype(jnp.float32), rate=rate, eps=eps,
        precision=precision)
    y_ref[:] = (flat + o).reshape(bb, t, d).astype(y_ref.dtype)


def _mlp_bwd_kernel(seed_ref, x_ref, w1_hbm, b1_ref, w2_hbm, b2_ref, g_ref,
                    be_ref, gy_ref, dx_ref, dw1_hbm, db1_hbm, dw2_hbm,
                    db2_hbm, dg_hbm, dbe_hbm, w1_v, w2_v, dw1_a, db1_a,
                    dw2_a, db2_a, dg_a, dbe_a, sem, *, rate, eps, precision):
    bb, t, d = x_ref.shape
    dtype = x_ref.dtype
    _load_once((w1_hbm, w2_hbm), (w1_v, w2_v), sem)
    accs = (dw1_a, db1_a, dw2_a, db2_a, dg_a, dbe_a)
    _zero_at_start(accs)
    g32 = g_ref[0].astype(jnp.float32)
    flat, xhat, rstd, hb, z, ab, _o, drop_hid, drop_res = _mlp_recompute(
        seed_ref, x_ref, w1_v[:], b1_ref[0].astype(jnp.float32), w2_v[:],
        b2_ref[0].astype(jnp.float32), g32,
        be_ref[0].astype(jnp.float32), rate=rate, eps=eps,
        precision=precision)
    gy = gy_ref[:].astype(jnp.float32).reshape(bb * t, d)

    do = gy * drop_res if rate > 0.0 else gy
    dob = do.astype(dtype)
    dw2_a[:] += _dot(ab, dob, precision, trans_a=True)          # (F, D)
    db2_a[:] += jnp.sum(do, axis=0, keepdims=True)
    dad = _dot(dob, w2_v[:], precision, trans_b=True)           # (N, F)
    da = dad * drop_hid if rate > 0.0 else dad
    dz = da * _dgelu(z)
    dzb = dz.astype(dtype)
    dw1_a[:] += _dot(hb, dzb, precision, trans_a=True)          # (D, F)
    db1_a[:] += jnp.sum(dz, axis=0, keepdims=True)
    dh = _dot(dzb, w1_v[:], precision, trans_b=True)            # (N, D)
    dx_ln, dg, dbe = _ln_bwd_rows(dh, xhat, rstd, g32)
    dg_a[:] += dg
    dbe_a[:] += dbe
    dx_ref[:] = (gy + dx_ln).reshape(bb, t, d).astype(dx_ref.dtype)

    _flush_last(accs, (dw1_hbm, db1_hbm, dw2_hbm, db2_hbm, dg_hbm,
                       dbe_hbm), sem)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def mlp_block(x, w1, b1, w2, b2, g, be, seed, dropout_rate: float = 0.0,
              eps: float = 1e-5, interpret: Optional[bool] = None,
              precision=None):
    """y = x + drop(gelu(LN(x) @ w1 + b1) [drop] @ w2 + b2).

    x: (B, T, D); w1 (D, F); w2 (F, D); b1/b2/g/be 1D params (f32).
    seed: scalar int32 (ignored when dropout_rate == 0).
    """
    y, _ = _mlp_fwd(x, w1, b1, w2, b2, g, be, seed, dropout_rate, eps,
                    interpret, precision)
    return y


def _mlp_fwd(x, w1, b1, w2, b2, g, be, seed, rate, eps, interpret,
             precision):
    _require_seed(seed, rate, "mlp_block")
    b, t, d = x.shape
    f = w1.shape[1]
    itemsize = x.dtype.itemsize
    fixed = d * f * 2 * itemsize + 8 * d * 4
    per_frame = t * (2 * d + 3 * f) * 4 + 3 * t * d * itemsize
    bb = _choose_bb(b, per_frame, fixed)
    row_spec = functools.partial(pl.BlockSpec, index_map=lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        functools.partial(_mlp_fwd_kernel, rate=rate, eps=eps,
                          precision=precision),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _block_spec(bb, t, d),
            _any_spec(), row_spec((1, f)),
            _any_spec(), row_spec((1, d)),
            row_spec((1, d)), row_spec((1, d)),
        ],
        out_specs=_block_spec(bb, t, d),
        scratch_shapes=[
            pltpu.VMEM((d, f), x.dtype), pltpu.VMEM((f, d), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_seq_params(),
        interpret=_interpret(interpret),
    )(_seed_arr(seed), x, w1.astype(x.dtype), _row(b1), w2.astype(x.dtype),
      _row(b2), _row(g), _row(be))
    return y, (x, w1, b1, w2, b2, g, be, seed)


def _mlp_fwd_vjp(x, w1, b1, w2, b2, g, be, seed, rate, eps, interpret,
                 precision):
    return _mlp_fwd(x, w1, b1, w2, b2, g, be, seed, rate, eps, interpret,
                    precision)


def _mlp_bwd_vjp(rate, eps, interpret, precision, res, gy):
    x, w1, b1, w2, b2, g, be, seed = res
    b, t, d = x.shape
    f = w1.shape[1]
    itemsize = x.dtype.itemsize
    fixed = d * f * 2 * itemsize + 2 * d * f * 4 + 16 * d * 4
    per_frame = t * (2 * d + 3 * f) * 4 * 2 + 4 * t * d * itemsize
    bb = _choose_bb(b, per_frame, fixed)
    f32 = jnp.float32
    row_spec = functools.partial(pl.BlockSpec, index_map=lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((b, t, d), x.dtype),
        jax.ShapeDtypeStruct((d, f), f32), jax.ShapeDtypeStruct((1, f), f32),
        jax.ShapeDtypeStruct((f, d), f32), jax.ShapeDtypeStruct((1, d), f32),
        jax.ShapeDtypeStruct((1, d), f32), jax.ShapeDtypeStruct((1, d), f32),
    )
    dx, dw1, db1, dw2, db2, dg, dbe = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, rate=rate, eps=eps,
                          precision=precision),
        out_shape=out_shape,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _block_spec(bb, t, d),
            _any_spec(), row_spec((1, f)),
            _any_spec(), row_spec((1, d)),
            row_spec((1, d)), row_spec((1, d)),
            _block_spec(bb, t, d),
        ],
        out_specs=(
            _block_spec(bb, t, d),
            _any_spec(), _any_spec(), _any_spec(), _any_spec(),
            _any_spec(), _any_spec(),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, f), x.dtype), pltpu.VMEM((f, d), x.dtype),
            pltpu.VMEM((d, f), f32), pltpu.VMEM((1, f), f32),
            pltpu.VMEM((f, d), f32), pltpu.VMEM((1, d), f32),
            pltpu.VMEM((1, d), f32), pltpu.VMEM((1, d), f32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_seq_params(),
        interpret=_interpret(interpret),
    )(_seed_arr(seed), x, w1.astype(x.dtype), _row(b1), w2.astype(x.dtype),
      _row(b2), _row(g), _row(be), gy)
    return (dx, dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype),
            dg[0].astype(g.dtype), dbe[0].astype(be.dtype), None)


mlp_block.defvjp(_mlp_fwd_vjp, _mlp_bwd_vjp)


# ---------------------------------------------------------------------------
# Attention sub-block
# ---------------------------------------------------------------------------


def _attn_recompute(seed_ref, x_ref, wq, wk, wv, *, num_heads, rate, eps,
                    precision, g, be):
    """Forward recompute through the attention weights (pre out-proj)."""
    bb, t, d = x_ref.shape
    inner = wq.shape[1]
    head_dim = inner // num_heads
    dtype = x_ref.dtype
    sm_scale = 1.0 / (head_dim ** 0.5)

    if rate > 0.0:
        base = pl.program_id(0) * bb
        w_bits = [_draw(seed_ref, base + j, _SITE_ATTN_W,
                        (1, num_heads, t, t)) for j in range(bb)]
        r_bits = [_draw(seed_ref, base + j, _SITE_ATTN_RES, (t, d))
                  for j in range(bb)]
        stack = (jnp.concatenate(w_bits, axis=0)
                 if bb > 1 else w_bits[0])  # (bb, H, t, t)
        # head-major to match the (H*bb, t, t) weights slab
        drop_w = _keep_scale(
            stack.transpose(1, 0, 2, 3).reshape(num_heads * bb, t, t), rate)
        drop_res = _keep_scale(jnp.concatenate(r_bits, axis=0)
                               if bb > 1 else r_bits[0], rate)
    else:
        drop_w = drop_res = None

    xb = x_ref[:].astype(jnp.float32)
    flat = xb.reshape(bb * t, d)
    h, xhat, rstd = _layer_norm_f32(flat, g, be, eps)
    hb = h.astype(dtype)
    q = _dot(hb, wq, precision).reshape(bb, t, inner)
    k = _dot(hb, wk, precision).reshape(bb, t, inner)
    v = _dot(hb, wv, precision).reshape(bb, t, inner)
    qh = _split_heads(q, num_heads, head_dim, bb)   # (H*bb, t, hd) f32
    kh = _split_heads(k, num_heads, head_dim, bb)
    vh = _split_heads(v, num_heads, head_dim, bb)
    scores = _bdot(qh.astype(dtype), kh.astype(dtype), 2, 2,
                   precision) * sm_scale
    weights = jax.nn.softmax(scores, axis=-1)       # (H*bb, t, t) f32
    dropped = weights * drop_w if rate > 0.0 else weights
    ah = _bdot(dropped.astype(dtype), vh.astype(dtype), 2, 1, precision)
    a = _merge_heads(ah, num_heads, head_dim, bb)   # (bb, t, inner)
    a2 = a.reshape(bb * t, inner).astype(dtype)
    return (flat, xhat, rstd, hb, qh, kh, vh, weights, dropped, a2,
            drop_w, drop_res, sm_scale, head_dim)


def _attn_fwd_kernel(seed_ref, x_ref, wq_hbm, wk_hbm, wv_hbm, wo_hbm,
                     bo_ref, g_ref, be_ref, y_ref, wq_v, wk_v, wv_v, wo_v,
                     sem, *, num_heads, rate, eps, precision):
    bb, t, d = x_ref.shape
    _load_once((wq_hbm, wk_hbm, wv_hbm, wo_hbm),
               (wq_v, wk_v, wv_v, wo_v), sem)
    out = _attn_recompute(seed_ref, x_ref, wq_v[:], wk_v[:], wv_v[:],
                          num_heads=num_heads, rate=rate, eps=eps,
                          precision=precision,
                          g=g_ref[0].astype(jnp.float32),
                          be=be_ref[0].astype(jnp.float32))
    flat, a2, drop_res = out[0], out[9], out[11]
    o = _dot(a2, wo_v[:], precision) + bo_ref[0].astype(jnp.float32)
    if rate > 0.0:
        o = o * drop_res
    y_ref[:] = (flat + o).reshape(bb, t, d).astype(y_ref.dtype)


def _attn_bwd_kernel(seed_ref, x_ref, wq_hbm, wk_hbm, wv_hbm, wo_hbm,
                     bo_ref, g_ref, be_ref, gy_ref, dx_ref, h_ref,
                     dqkv_ref, dwo_hbm, dbo_hbm, dg_hbm, dbe_hbm, wq_v,
                     wk_v, wv_v, wo_v, dwo_a, dbo_a, dg_a, dbe_a, sem, *,
                     num_heads, rate, eps, precision):
    """dx + dWo/dbo/dLN accumulators + the (h, dqkv) activations.

    The three (D, inner) qkv weight gradients are NOT accumulated here:
    together with dWo they exceed the 16 MB VMEM budget, and a second
    recompute kernel measured ~8 ms/layer (r2). Instead this kernel
    emits h = LN(x) and dqkv = d(q|k|v) (lane-concatenated, bf16) and
    the wrapper computes dWqkv = h^T @ dqkv as ONE big XLA dot — the
    MXU-efficient shape (contraction over all B*T tokens) that XLA
    already runs at >60% peak.
    """
    bb, t, d = x_ref.shape
    dtype = x_ref.dtype
    _load_once((wq_hbm, wk_hbm, wv_hbm, wo_hbm),
               (wq_v, wk_v, wv_v, wo_v), sem)
    accs = (dwo_a, dbo_a, dg_a, dbe_a)
    _zero_at_start(accs)
    g32 = g_ref[0].astype(jnp.float32)
    (flat, xhat, rstd, hb, qh, kh, vh, weights, dropped, a2,
     drop_w, drop_res, sm_scale, head_dim) = _attn_recompute(
        seed_ref, x_ref, wq_v[:], wk_v[:], wv_v[:], num_heads=num_heads,
        rate=rate, eps=eps, precision=precision, g=g32,
        be=be_ref[0].astype(jnp.float32))
    inner = num_heads * head_dim
    gy = gy_ref[:].astype(jnp.float32).reshape(bb * t, d)

    do = gy * drop_res if rate > 0.0 else gy
    dob = do.astype(dtype)
    dwo_a[:] += _dot(a2, dob, precision, trans_a=True)        # (inner, D)
    dbo_a[:] += jnp.sum(do, axis=0, keepdims=True)
    da2 = _dot(dob, wo_v[:], precision, trans_b=True)         # (N, inner)
    dah = _split_heads(da2.reshape(bb, t, inner), num_heads, head_dim, bb)
    dab = dah.astype(dtype)
    ddropped = _bdot(dab, vh.astype(dtype), 2, 2, precision)  # (H*bb,t,t)
    dw = ddropped * drop_w if rate > 0.0 else ddropped
    ds = weights * (dw - jnp.sum(dw * weights, axis=-1, keepdims=True))
    ds = (ds * sm_scale).astype(dtype)
    dqh = _bdot(ds, kh.astype(dtype), 2, 1, precision)
    dkh = _bdot(ds, qh.astype(dtype), 1, 1, precision)
    dvh = _bdot(dropped.astype(dtype), dab, 1, 1, precision)
    dq2 = _merge_heads(dqh, num_heads, head_dim, bb).reshape(bb * t, inner)
    dk2 = _merge_heads(dkh, num_heads, head_dim, bb).reshape(bb * t, inner)
    dv2 = _merge_heads(dvh, num_heads, head_dim, bb).reshape(bb * t, inner)
    dq2, dk2, dv2 = (z.astype(dtype) for z in (dq2, dk2, dv2))
    dh = (_dot(dq2, wq_v[:], precision, trans_b=True)
          + _dot(dk2, wk_v[:], precision, trans_b=True)
          + _dot(dv2, wv_v[:], precision, trans_b=True))
    dx_ln, dg, dbe = _ln_bwd_rows(dh, xhat, rstd, g32)
    dg_a[:] += dg
    dbe_a[:] += dbe
    dx_ref[:] = (gy + dx_ln).reshape(bb, t, d).astype(dx_ref.dtype)
    h_ref[:] = hb.reshape(bb, t, d)
    dqkv_ref[:] = jnp.concatenate([dq2, dk2, dv2], axis=1).reshape(
        bb, t, 3 * inner)

    _flush_last(accs, (dwo_hbm, dbo_hbm, dg_hbm, dbe_hbm), sem)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def attn_block(x, wq, wk, wv, wo, bo, g, be, seed, num_heads: int,
               dropout_rate: float = 0.0, eps: float = 1e-5,
               interpret: Optional[bool] = None, precision=None):
    """y = x + drop(W_o @ MHSA_drop(LN(x) @ W_{q,k,v}) + b_o).

    x: (B, T, D); wq/wk/wv (D, H*hd) (no qkv bias — vit_pytorch);
    wo (H*hd, D); bo/g/be 1D params (f32); seed scalar int32.
    """
    y, _ = _attn_fwd(x, wq, wk, wv, wo, bo, g, be, seed, num_heads,
                     dropout_rate, eps, interpret, precision)
    return y


def _attn_per_frame(t, d, inner, itemsize, n_scores, n_qkv):
    """Crude f32 working-set estimate per frame in a block."""
    t_pad = ((t + 127) // 128) * 128
    heads_slabs = (inner // 64) if inner >= 64 else 1
    return (t * (2 * d + n_qkv * inner) * 4
            + heads_slabs * t * t_pad * 4 * n_scores // 16
            + 3 * t * d * itemsize)


def _attn_in_specs(bb, t, d):
    row_spec = functools.partial(pl.BlockSpec, index_map=lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        _block_spec(bb, t, d),
        _any_spec(), _any_spec(), _any_spec(), _any_spec(),
        row_spec((1, d)), row_spec((1, d)), row_spec((1, d)),
    ]


def _attn_args(x, wq, wk, wv, wo, bo, g, be, seed):
    cast = lambda w: w.astype(x.dtype)  # noqa: E731
    return (_seed_arr(seed), x, cast(wq), cast(wk), cast(wv), cast(wo),
            _row(bo), _row(g), _row(be))


def _attn_fwd(x, wq, wk, wv, wo, bo, g, be, seed, num_heads, rate, eps,
              interpret, precision):
    _require_seed(seed, rate, "attn_block")
    b, t, d = x.shape
    inner = wq.shape[1]
    itemsize = x.dtype.itemsize
    fixed = 4 * d * inner * itemsize + 12 * d * 4
    bb = _choose_bb(b, _attn_per_frame(t, d, inner, itemsize, 3, 5), fixed)
    y = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, num_heads=num_heads, rate=rate,
                          eps=eps, precision=precision),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        grid=(b // bb,),
        in_specs=_attn_in_specs(bb, t, d),
        out_specs=_block_spec(bb, t, d),
        scratch_shapes=[
            pltpu.VMEM((d, inner), x.dtype), pltpu.VMEM((d, inner), x.dtype),
            pltpu.VMEM((d, inner), x.dtype), pltpu.VMEM((inner, d), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_seq_params(),
        interpret=_interpret(interpret),
    )(*_attn_args(x, wq, wk, wv, wo, bo, g, be, seed))
    return y, (x, wq, wk, wv, wo, bo, g, be, seed)


def _attn_fwd_vjp(x, wq, wk, wv, wo, bo, g, be, seed, num_heads, rate, eps,
                  interpret, precision):
    return _attn_fwd(x, wq, wk, wv, wo, bo, g, be, seed, num_heads, rate,
                     eps, interpret, precision)


def _attn_bwd_vjp(num_heads, rate, eps, interpret, precision, res, gy):
    x, wq, wk, wv, wo, bo, g, be, seed = res
    b, t, d = x.shape
    inner = wq.shape[1]
    itemsize = x.dtype.itemsize
    f32 = jnp.float32
    args = _attn_args(x, wq, wk, wv, wo, bo, g, be, seed) + (gy,)
    interp = _interpret(interpret)
    wscratch = [
        pltpu.VMEM((d, inner), x.dtype), pltpu.VMEM((d, inner), x.dtype),
        pltpu.VMEM((d, inner), x.dtype), pltpu.VMEM((inner, d), x.dtype),
    ]

    fixed = 4 * d * inner * itemsize + (inner * d + 3 * d) * 4 + 12 * d * 4
    per_frame = (_attn_per_frame(t, d, inner, itemsize, 5, 8)
                 + 2 * t * (d + 3 * inner) * itemsize)  # h/dqkv out blocks
    bb = _choose_bb(b, per_frame, fixed)
    specs = _attn_in_specs(bb, t, d)
    dx, h, dqkv, dwo, dbo, dg, dbe = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, num_heads=num_heads,
                          rate=rate, eps=eps, precision=precision),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, d), x.dtype),
            jax.ShapeDtypeStruct((b, t, d), x.dtype),
            jax.ShapeDtypeStruct((b, t, 3 * inner), x.dtype),
            jax.ShapeDtypeStruct((inner, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
        ),
        grid=(b // bb,),
        in_specs=specs + [_block_spec(bb, t, d)],
        out_specs=(_block_spec(bb, t, d), _block_spec(bb, t, d),
                   _block_spec(bb, t, 3 * inner), _any_spec(), _any_spec(),
                   _any_spec(), _any_spec()),
        scratch_shapes=wscratch + [
            pltpu.VMEM((inner, d), f32), pltpu.VMEM((1, d), f32),
            pltpu.VMEM((1, d), f32), pltpu.VMEM((1, d), f32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_seq_params(),
        interpret=interp,
    )(*args)

    # dWqkv = h^T @ dqkv: one MXU-shaped XLA dot (contraction over B*T),
    # then static column slices -> the three per-projection gradients.
    dwqkv = jax.lax.dot_general(
        h.reshape(b * t, d), dqkv.reshape(b * t, 3 * inner),
        (((0,), (0,)), ((), ())), preferred_element_type=f32,
        precision=precision)
    dwq, dwk, dwv = (dwqkv[:, :inner], dwqkv[:, inner:2 * inner],
                     dwqkv[:, 2 * inner:])
    return (dx, dwq.astype(wq.dtype), dwk.astype(wk.dtype),
            dwv.astype(wv.dtype), dwo.astype(wo.dtype),
            dbo[0].astype(bo.dtype), dg[0].astype(g.dtype),
            dbe[0].astype(be.dtype), None)


attn_block.defvjp(_attn_fwd_vjp, _attn_bwd_vjp)
