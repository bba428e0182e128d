"""Shared neural layers: multi-head attention and torch-style decoder blocks.

The attention core is pluggable (``impl='xla' | 'pallas'``): XLA fuses the
softmax chain well at small sizes, while the Pallas path provides a
flash-attention kernel with the causal/banded masks computed in-kernel
(videocad_tpu.ops.attention).

Decoder blocks follow torch.nn.TransformerDecoderLayer semantics (post-LN,
ReLU feed-forward, dropout on attention weights and residual branches) for
parity with the reference model (/root/reference/model/
autoregressive_transformer.py:54-62).

Modules are setup-style so the autoregressive rollout engine can drive the
same parameters through incremental KV-cached decode methods
(videocad_tpu.infer.rollout) instead of full-sequence ``__call__``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ParamDense(nn.Module):
    """nn.Dense-compatible layer whose kernel/bias are setup attributes.

    Identical parameter names ("kernel"/"bias"), shapes, initializers
    (lecun_normal / zeros) and dtype flow to nn.Dense — checkpoints and
    RNG streams are interchangeable — but the weights are directly
    readable (``layer.kernel``) so fused Pallas block kernels
    (ops/fused_block.py) can consume them without materializing the
    projection outputs in HBM. Requires the input width statically.
    """

    features: int
    in_features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    # 'none' | 'int8' (q8 forward, straight-through bf16 backward) |
    # 'int8_bwd' (q8 forward AND backward matmuls) — ops/quant.py.
    quant: str = "none"

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_features, self.features),
                                 jnp.float32)
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros,
                                   (self.features,), jnp.float32)

    def __call__(self, x):
        if self.quant != "none":
            from videocad_tpu.ops.quant import quantized_dense
            return quantized_dense(
                x, self.kernel, self.bias if self.use_bias else None,
                self.dtype,
                backward="int8" if self.quant == "int8_bwd" else "bf16")
        y = x.astype(self.dtype) @ self.kernel.astype(self.dtype)
        if self.use_bias:
            y = y + self.bias.astype(self.dtype)
        return y


class LNParams(nn.Module):
    """nn.LayerNorm-compatible module with directly readable scale/bias.

    Matches flax nn.LayerNorm semantics (f32 statistics, affine in the
    compute dtype) and parameter names/init, for the fused-block path.
    """

    dim: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.dim,),
                                jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                               jnp.float32)

    def __call__(self, x):
        f32 = x.astype(jnp.float32)
        mu = jnp.mean(f32, axis=-1, keepdims=True)
        xc = f32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + self.epsilon)
        y = y * self.scale + self.bias
        return y.astype(self.dtype)


def causal_mask(seq_len: int) -> jnp.ndarray:
    """(T, T) bool, True = may attend: col <= row."""
    rows = jnp.arange(seq_len)[:, None]
    cols = jnp.arange(seq_len)[None, :]
    return cols <= rows


def banded_mask(q_len: int, kv_len: int, window: int) -> jnp.ndarray:
    """(q_len, kv_len) bool banded window: row t attends cols (t-window, t].

    This is the reference's windowed memory mask
    (autoregressive_transformer.py:182-188): causal + limited lookback, the
    algorithmic trick that keeps 186-step horizons cheap.
    """
    rows = jnp.arange(q_len)[:, None]
    cols = jnp.arange(kv_len)[None, :]
    return (cols > rows - window) & (cols <= rows)


def xla_attention(q, k, v, mask=None, dropout_rate=0.0, deterministic=True,
                  dropout_rng=None, dropout_impl="xla"):
    """softmax(q k^T / sqrt(d) + mask) v with f32 softmax.

    q: (B, T, H, D); k, v: (B, S, H, D); mask broadcastable to (B, H, T, S)
    bool (True = attend).
    """
    from videocad_tpu.ops.dropout import dropout as apply_dropout

    dtype = q.dtype
    depth = q.shape[-1]
    scores = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(
        jnp.asarray(depth, dtype=dtype))
    if mask is not None:
        while mask.ndim < 4:
            mask = mask[None]
        scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
    weights = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
    if dropout_rate > 0.0 and not deterministic:
        weights = apply_dropout(weights, dropout_rng, dropout_rate,
                                impl=dropout_impl)
    return jnp.einsum("bhts,bshd->bthd", weights, v)


class MultiHeadAttention(nn.Module):
    """MHA with separate q/kv inputs, a pluggable core, and decode hooks."""

    model_dim: int
    num_heads: int
    head_dim: Optional[int] = None  # default: model_dim // num_heads
    dropout_rate: float = 0.0
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"
    dropout_impl: str = "xla"  # 'pallas' = hardware-PRNG fused dropout
    quant: str = "none"  # int8 MXU projections (ops/quant.py)
    # Record softmax weights into the 'intermediates' collection (used by
    # attention-rollout interpretability; forces the XLA path).
    sow_weights: bool = False

    def setup(self):
        hd = self.head_dim or self.model_dim // self.num_heads
        inner = self.num_heads * hd
        self._head_dim = hd
        # ParamDense == nn.Dense (names/shapes/init/dtype flow) but with
        # directly readable weights for the fused-block kernel path.
        kw = dict(in_features=self.model_dim, dtype=self.dtype,
                  quant=self.quant)
        self.query = ParamDense(inner, use_bias=self.qkv_bias, **kw)
        self.key = ParamDense(inner, use_bias=self.qkv_bias, **kw)
        self.value = ParamDense(inner, use_bias=self.qkv_bias, **kw)
        self.out = ParamDense(self.model_dim, in_features=inner,
                              use_bias=True, dtype=self.dtype,
                              quant=self.quant)

    def _split(self, x):
        b, t, _ = x.shape
        return x.reshape(b, t, self.num_heads, self._head_dim)

    def project_q(self, q_in):
        return self._split(self.query(q_in))

    def project_kv(self, kv_in) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self._split(self.key(kv_in)), self._split(self.value(kv_in))

    def attend(self, q, k, v, mask=None, deterministic=True):
        """Core attention over already-projected heads; returns merged output."""
        dropout_rng = None
        use_dropout = self.dropout_rate > 0.0 and not deterministic
        if use_dropout:
            dropout_rng = self.make_rng("dropout")
        if self.sow_weights:
            depth = q.shape[-1]
            scores = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(
                jnp.asarray(depth, q.dtype))
            if mask is not None:
                m = mask
                while m.ndim < 4:
                    m = m[None]
                scores = jnp.where(m, scores, jnp.finfo(scores.dtype).min)
            weights = nn.softmax(scores.astype(jnp.float32), axis=-1)
            self.sow("intermediates", "attention_weights", weights)
            out = jnp.einsum("bhts,bshd->bthd", weights.astype(q.dtype), v)
        elif (self.attention_impl == "fused" and mask is None
              and (not use_dropout or jax.default_backend() == "tpu")):
            # Short-sequence fused MHSA: no layout transposes, in-kernel
            # softmax + hardware-PRNG dropout (ops/fused_attention.py).
            # Off-TPU the kernel runs interpreted, where the hardware PRNG
            # doesn't exist — dropout training falls back to XLA there.
            from videocad_tpu.ops.fused_attention import mhsa_short
            b, t = q.shape[:2]
            if use_dropout:
                from videocad_tpu.ops.prng import derive_seed
                seed = derive_seed(dropout_rng)
                rate = self.dropout_rate
            else:
                seed = jnp.int32(0)
                rate = 0.0
            fused = mhsa_short(q.reshape(b, t, -1), k.reshape(b, t, -1),
                               v.reshape(b, t, -1), seed, self.num_heads,
                               rate)
            return self.out(fused)
        elif (self.attention_impl == "pallas"
              and (not use_dropout or jax.default_backend() == "tpu")):
            # Flash attention with Pallas forward AND backward; dropout
            # runs in-kernel on the hardware PRNG (TPU only — interpreted
            # mode has no PRNG, so dropout training falls back to XLA
            # off-TPU, same contract as the fused ViT kernel above).
            from videocad_tpu.ops.attention import flash_attention
            if use_dropout:
                from videocad_tpu.ops.prng import derive_seed
                out = flash_attention(q, k, v, mask=mask,
                                      seed=derive_seed(dropout_rng),
                                      dropout_rate=self.dropout_rate)
            else:
                out = flash_attention(q, k, v, mask=mask)
        else:
            out = xla_attention(q, k, v, mask, self.dropout_rate,
                                deterministic, dropout_rng,
                                self.dropout_impl)
        b, t = q.shape[0], q.shape[1]
        return self.out(out.reshape(b, t, self.num_heads * self._head_dim))

    def __call__(self, q_in, kv_in, mask=None, deterministic=True):
        q = self.project_q(q_in)
        k, v = self.project_kv(kv_in)
        return self.attend(q, k, v, mask, deterministic)


class TransformerDecoderLayer(nn.Module):
    """Post-LN decoder block: self-attn -> cross-attn -> ReLU MLP.

    Matches torch.nn.TransformerDecoderLayer defaults (norm_first=False,
    activation=relu, LayerNorm eps 1e-5).
    """

    model_dim: int
    num_heads: int
    ffn_dim: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"
    dropout_impl: str = "xla"
    quant: str = "none"

    def setup(self):
        kw = dict(model_dim=self.model_dim, num_heads=self.num_heads,
                  dropout_rate=self.dropout_rate, dtype=self.dtype,
                  attention_impl=self.attention_impl,
                  dropout_impl=self.dropout_impl, quant=self.quant)
        self.self_attn = MultiHeadAttention(**kw)
        self.cross_attn = MultiHeadAttention(**kw)
        # ParamDense == nn.Dense param flow (kernel/bias names, lecun/zeros
        # init) + the int8 path; checkpoints are interchangeable.
        self.linear1 = ParamDense(self.ffn_dim, in_features=self.model_dim,
                                  dtype=self.dtype, quant=self.quant)
        self.linear2 = ParamDense(self.model_dim, in_features=self.ffn_dim,
                                  dtype=self.dtype, quant=self.quant)
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm3 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

    def _drop(self, x, deterministic):
        if deterministic or self.dropout_rate == 0.0:
            return x
        from videocad_tpu.ops.dropout import dropout
        return dropout(x, self.make_rng("dropout"), self.dropout_rate,
                       impl=self.dropout_impl)

    def _ffn(self, x, deterministic):
        h = self._drop(nn.relu(self.linear1(x)), deterministic)
        return self.linear2(h)

    def __call__(self, x, memory, tgt_mask=None, memory_mask=None,
                 deterministic=True):
        drop = lambda y: self._drop(y, deterministic)  # noqa: E731
        x = self.norm1(x + drop(self.self_attn(x, x, tgt_mask, deterministic)))
        x = self.norm2(x + drop(self.cross_attn(x, memory, memory_mask,
                                                deterministic)))
        return self.norm3(x + drop(self._ffn(x, deterministic)))

    # ---- incremental decode (used by infer.rollout via apply-method) ----

    def project_memory(self, memory):
        """Precompute cross-attention K/V for a fixed memory sequence."""
        return self.cross_attn.project_kv(memory)

    def decode_step(self, x_t, self_k, self_v, mem_k, mem_v,
                    self_mask, mem_mask):
        """One-token decode with externally managed KV caches.

        x_t: (B, 1, D); self_k/v: (B, T_max, H, hd) caches already containing
        this step's K/V; mem_k/v: full memory projections; masks select the
        valid cache region / banded memory window.
        """
        x = x_t
        x = self.norm1(x + self.self_attn.attend(
            self.self_attn.project_q(x), self_k, self_v, self_mask))
        x = self.norm2(x + self.cross_attn.attend(
            self.cross_attn.project_q(x), mem_k, mem_v, mem_mask))
        return self.norm3(x + self._ffn(x, True))


class TransformerDecoder(nn.Module):
    """A stack of decoder layers (no final norm, like torch's default)."""

    model_dim: int
    num_layers: int
    num_heads: int
    ffn_dim: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"
    dropout_impl: str = "xla"
    quant: str = "none"

    def setup(self):
        self.layers = [
            TransformerDecoderLayer(
                model_dim=self.model_dim, num_heads=self.num_heads,
                ffn_dim=self.ffn_dim, dropout_rate=self.dropout_rate,
                dtype=self.dtype, attention_impl=self.attention_impl,
                dropout_impl=self.dropout_impl, quant=self.quant,
                name=f"layers_{i}")
            for i in range(self.num_layers)
        ]

    def __call__(self, x, memory, tgt_mask=None, memory_mask=None,
                 deterministic=True):
        for layer in self.layers:
            x = layer(x, memory, tgt_mask, memory_mask, deterministic)
        return x
