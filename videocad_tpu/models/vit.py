"""Vision Transformer encoder for UI frames and CAD images.

Architecturally matches the reference's vit_pytorch ViT configuration
(/root/reference/model/trajectory_model.py:53-67): image 224, patch 32,
dim 512, depth 6, heads 16 (head dim 64), mlp 512, single channel, dropout
0.1, CLS pooling with the classification head stripped -> a 512-d embedding.

Pre-LN blocks with a final LayerNorm; patch embedding is
LayerNorm -> Dense -> LayerNorm over flattened NHWC patches. Patch
extraction is a reshape/transpose (no conv), which XLA lowers to a single
layout change feeding one big MXU matmul.
"""

from __future__ import annotations

import dataclasses
import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

from videocad_tpu.models.layers import LNParams, MultiHeadAttention, ParamDense


class FusedLayerNorm(nn.Module):
    """nn.LayerNorm-compatible module backed by the Pallas fused kernel
    (ops/layernorm.py). Same param names ('scale', 'bias'), f32 statistics,
    eps 1e-5 (torch nn.LayerNorm default, for converted-checkpoint parity)."""

    dtype: jnp.dtype = jnp.float32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        from videocad_tpu.ops.layernorm import layer_norm
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return layer_norm(x.astype(self.dtype), scale, bias, self.epsilon)


def _ln_ctor(ln_impl: str):
    # epsilon 1e-5 = torch nn.LayerNorm default (the reference vit_pytorch
    # encoder); flax's 1e-6 default adds small drift when loading converted
    # torch checkpoints (ADVICE r1 low). The decoder already uses 1e-5.
    ctor = FusedLayerNorm if ln_impl == "pallas" else nn.LayerNorm
    return functools.partial(ctor, epsilon=1e-5)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 32
    dim: int = 512
    depth: int = 6
    heads: int = 16
    head_dim: int = 64
    mlp_dim: int = 512
    channels: int = 1
    dropout: float = 0.1
    emb_dropout: float = 0.1
    # Structure flags for vit_pytorch checkpoint generations: the legacy
    # (PreNorm-era) ViT has no LayerNorms around the patch projection and
    # no final transformer norm (it lived in the stripped mlp_head).
    patch_norm: bool = True
    final_norm: bool = True


class ViTBlock(nn.Module):
    """One pre-LN transformer block.

    ``attention_impl="block"`` runs the whole layer as two fused Pallas
    kernels (ops/fused_block.py: attn_block + mlp_block) — LayerNorms,
    projections, softmax, GELU, dropout and residual adds never leave
    VMEM, and the XLA graph holds only (B, T, dim) tensors between
    custom-calls (no layout-copy battles at kernel boundaries). The
    parameter tree is identical across impls (ParamDense/LNParams mirror
    nn.Dense/nn.LayerNorm naming and init), so checkpoints are
    interchangeable.
    """

    config: ViTConfig
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"
    mlp_impl: str = "xla"  # 'xla' | 'block' (fused mlp_block kernel)
    dropout_impl: str = "xla"
    ln_impl: str = "xla"
    quant: str = "none"  # int8 MXU dense layers (ops/quant.py)
    sow_attention: bool = False

    def setup(self):
        cfg = self.config
        if self.attention_impl == "block":
            self.attn_norm = LNParams(cfg.dim, epsilon=1e-5,
                                      dtype=self.dtype)
        else:
            self.attn_norm = _ln_ctor(self.ln_impl)(dtype=self.dtype)
        if self.mlp_impl == "block" or self.attention_impl == "block":
            self.mlp_norm = LNParams(cfg.dim, epsilon=1e-5, dtype=self.dtype)
        else:
            self.mlp_norm = _ln_ctor(self.ln_impl)(dtype=self.dtype)
        self.attn = MultiHeadAttention(
            model_dim=cfg.dim, num_heads=cfg.heads, head_dim=cfg.head_dim,
            dropout_rate=cfg.dropout, qkv_bias=False, dtype=self.dtype,
            attention_impl=self.attention_impl,
            dropout_impl=self.dropout_impl, quant=self.quant,
            sow_weights=self.sow_attention)
        self.mlp_in = ParamDense(cfg.mlp_dim, in_features=cfg.dim,
                                 dtype=self.dtype, quant=self.quant)
        self.mlp_out = ParamDense(cfg.dim, in_features=cfg.mlp_dim,
                                  dtype=self.dtype, quant=self.quant)

    def _drop(self, x, deterministic):
        if deterministic or self.config.dropout == 0.0:
            return x
        from videocad_tpu.ops.dropout import dropout
        return dropout(x, self.make_rng("dropout"), self.config.dropout,
                       impl=self.dropout_impl)

    def _seed(self, use_dropout):
        if not use_dropout:
            return jnp.int32(0)
        from videocad_tpu.ops.prng import derive_seed
        return derive_seed(self.make_rng("dropout"))

    def __call__(self, x, deterministic=True):
        cfg = self.config
        use_dropout = cfg.dropout > 0.0 and not deterministic
        # In-kernel dropout needs the TPU hardware PRNG; off-TPU dropout
        # training falls back to the XLA path (same contract as the other
        # Pallas kernels). sow_attention needs the score tensor -> XLA.
        kernels_ok = not use_dropout or jax.default_backend() == "tpu"
        if (self.attention_impl == "block" and not self.sow_attention
                and kernels_ok):
            from videocad_tpu.ops.fused_block import attn_block
            rate = cfg.dropout if use_dropout else 0.0
            x = attn_block(
                x, self.attn.query.kernel, self.attn.key.kernel,
                self.attn.value.kernel, self.attn.out.kernel,
                self.attn.out.bias, self.attn_norm.scale,
                self.attn_norm.bias, self._seed(use_dropout), cfg.heads,
                rate)
        else:
            h = self.attn_norm(x)
            h = self.attn(h, h, deterministic=deterministic)
            x = x + self._drop(h, deterministic)

        if ((self.mlp_impl == "block" or self.attention_impl == "block")
                and kernels_ok):
            from videocad_tpu.ops.fused_block import mlp_block
            rate = cfg.dropout if use_dropout else 0.0
            return mlp_block(
                x, self.mlp_in.kernel, self.mlp_in.bias,
                self.mlp_out.kernel, self.mlp_out.bias,
                self.mlp_norm.scale, self.mlp_norm.bias,
                self._seed(use_dropout), rate)

        h = self.mlp_norm(x)
        h = self.mlp_in(h)
        # exact erf GELU (torch nn.GELU default) — flax's tanh approximation
        # adds ~1e-3 drift against converted vit_pytorch checkpoints
        h = nn.gelu(h, approximate=False)
        h = self._drop(h, deterministic)
        h = self.mlp_out(h)
        h = self._drop(h, deterministic)
        return x + h


class ViT(nn.Module):
    """ViT encoder: (B, H, W, C) image -> (B, dim) CLS embedding."""

    config: ViTConfig = ViTConfig()
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"
    mlp_impl: str = "xla"
    dropout_impl: str = "xla"
    ln_impl: str = "xla"
    quant: str = "none"
    sow_attention: bool = False

    @nn.compact
    def __call__(self, images, deterministic=True):
        cfg = self.config
        ln = _ln_ctor(self.ln_impl)
        b, h, w, c = images.shape
        p = cfg.patch_size
        gh, gw = h // p, w // p
        # (B, gh, p, gw, p, C) -> (B, gh*gw, p*p*C)
        x = images.astype(self.dtype)
        if images.dtype != self.dtype:
            # Pin the compute-dtype boundary. Without the barrier XLA's
            # simplifier hoists patch_norm_in's f32 stat promotion back
            # through the patchify reshapes and runs the whole chain —
            # three materialized layout copies of the full (B*T, H, W)
            # frame tensor — at f32 instead of the declared bf16, doubling
            # ~6 ms/step of pure copy traffic on the flagship (r3 trace:
            # f32[8,191,224,224] copies behind a bf16 jaxpr). Values are
            # bit-identical either way; only the copy width changes.
            x = jax.lax.optimization_barrier(x)
        x = x.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
        if images.dtype != self.dtype:
            # Second pin, after the patchify transpose. The r3 barrier
            # above keeps the upstream preprocess chain bf16, but XLA then
            # hoists patch_norm_in's f32 stat promotion to just after it —
            # an r4 trace showed a materialized full-frame bf16->f32
            # convert plus both patchify layout copies running at f32
            # (~2.6 ms/step vs ~1.0 at half width). Pinning here forces
            # the convert after the copies, where it fuses into the LN
            # stat reduction instead of materializing.
            x = jax.lax.optimization_barrier(x)

        if cfg.patch_norm:
            x = ln(dtype=self.dtype, name="patch_norm_in")(x)
        x = ParamDense(cfg.dim, in_features=p * p * c, dtype=self.dtype,
                       quant=self.quant, name="patch_embed")(x)
        if cfg.patch_norm:
            x = ln(dtype=self.dtype, name="patch_norm_out")(x)

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, cfg.dim), jnp.float32)
        x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (b, 1, 1)), x], axis=1)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, gh * gw + 1, cfg.dim), jnp.float32)
        x = x + pos.astype(self.dtype)
        if not deterministic and cfg.emb_dropout > 0.0:
            # ops.dropout's u8-threshold masks, same as the block sites
            # (nn.Dropout's bernoulli costs a u32 bit stream + f32
            # uniform conversion on the full token tensor)
            from videocad_tpu.ops.dropout import dropout as _dropout
            x = _dropout(x, self.make_rng("dropout"), cfg.emb_dropout,
                         impl=self.dropout_impl)

        for i in range(cfg.depth):
            x = ViTBlock(cfg, dtype=self.dtype,
                         attention_impl=self.attention_impl,
                         mlp_impl=self.mlp_impl,
                         dropout_impl=self.dropout_impl,
                         ln_impl=self.ln_impl,
                         quant=self.quant,
                         sow_attention=self.sow_attention,
                         name=f"block_{i}")(x, deterministic)
        if cfg.final_norm:
            x = ln(dtype=self.dtype, name="final_norm")(x)
        return x[:, 0]
