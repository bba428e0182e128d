"""Decision-transformer model family (GPT-2 backbone over state/action pairs).

The reference's BaseTransformer (/root/reference/model/base_transformer.py)
wraps a HF GPT2Model over an interleaved token stream
``[CAD, s_0, a_0, s_1, a_1, ...]`` with timestep embeddings added to both
streams, a LayerNorm on the stacked embeddings, and a tanh action head —
the scaffold behind the vid_pretrained.json configs. (The reference factory
never actually instantiates it — quirk 1 — but the capability exists, so it
does here too, as a working model.)

TPU-native: a pre-LN GPT-2-style causal encoder (GELU MLP, learned
embeddings only — positions come from the timestep embedding exactly like
the reference, which zeroes GPT-2's own position embeddings by feeding
inputs_embeds), sharing the vision encoders and attention layers of the
rest of the framework.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from videocad_tpu.models.layers import MultiHeadAttention, causal_mask
from videocad_tpu.models.videocadformer import (
    VideoCADFormerConfig,
    _make_encoder,
)
from videocad_tpu.ops.preprocess import maybe_preprocess


class GPT2Block(nn.Module):
    """Pre-LN transformer block (GPT-2 style: LN->attn->res, LN->GELU MLP->res)."""

    model_dim: int
    num_heads: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        h = MultiHeadAttention(
            model_dim=self.model_dim, num_heads=self.num_heads,
            dropout_rate=self.dropout_rate, dtype=self.dtype,
            name="attn")(h, h, mask, deterministic)
        x = x + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * self.model_dim, dtype=self.dtype, name="mlp_in")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.model_dim, dtype=self.dtype, name="mlp_out")(h)
        return x + nn.Dropout(self.dropout_rate)(h,
                                                 deterministic=deterministic)


class DecisionTransformer(nn.Module):
    """Interleaved state/action GPT with CAD conditioning.

    forward(inputs) -> (cmd_logits (B,T,5), param_logits (B,T,6,1000)) from
    the state-token positions (the "what action follows this state" slots),
    plus a continuous tanh action head available via ``continuous=True``
    (the reference scaffold's predict_action — base_transformer.py:58-60).
    """

    config: VideoCADFormerConfig
    n_layer: int = 6
    n_head: int = 8
    enable_image_conditioning: bool = True

    def setup(self):
        cfg = self.config
        dtype = cfg.compute_dtype
        self.state_encoder = _make_encoder(cfg, "state_encoder",
                                           remat=cfg.remat_encoder)
        self.cad_encoder = _make_encoder(cfg, "cad_encoder")
        self.embed_state = nn.Dense(cfg.hidden_size, dtype=dtype)
        self.embed_image = nn.Dense(cfg.hidden_size, dtype=dtype)
        self.embed_action = nn.Dense(cfg.hidden_size, dtype=dtype)
        self.embed_timestep = nn.Embed(cfg.max_ep_len, cfg.hidden_size,
                                       dtype=dtype)
        self.embed_ln = nn.LayerNorm(epsilon=1e-5, dtype=dtype)
        self.blocks = [
            GPT2Block(model_dim=cfg.hidden_size, num_heads=self.n_head,
                      dropout_rate=cfg.dropout, dtype=dtype,
                      name=f"h_{i}")
            for i in range(self.n_layer)
        ]
        self.ln_f = nn.LayerNorm(epsilon=1e-5, dtype=dtype)
        self.predict_cmd = nn.Dense(cfg.num_classes, dtype=jnp.float32)
        self.predict_params = nn.Dense(
            cfg.num_params * cfg.num_params_values, dtype=jnp.float32)
        self.predict_action = nn.Dense(cfg.act_dim, dtype=jnp.float32)

    def _stack_tokens(self, cad_emb, state_emb, action_emb):
        """[CAD?, s_0, a_0, s_1, a_1, ...] (base_transformer.py:134-143)."""
        b, t, d = state_emb.shape
        pairs = jnp.stack([state_emb, action_emb], axis=2).reshape(b, 2 * t, d)
        if self.enable_image_conditioning:
            return jnp.concatenate([cad_emb[:, None, :], pairs], axis=1)
        return pairs

    def __call__(self, inputs: Dict[str, jnp.ndarray], deterministic=True,
                 continuous: bool = False):
        cfg = self.config
        frames = maybe_preprocess(inputs["frames"],
                                  bgr_as_rgb=cfg.bgr_frames_as_rgb)
        actions = inputs["actions"].astype(cfg.compute_dtype)
        cad = maybe_preprocess(inputs["cad_image"])
        b, t = actions.shape[:2]

        flat = frames.reshape((b * t,) + frames.shape[2:])
        state_emb = self.state_encoder(flat, deterministic).reshape(b, t, -1)
        state_emb = self.embed_state(state_emb)
        action_emb = self.embed_action(actions)
        ts_emb = self.embed_timestep(jnp.arange(t))[None]
        state_emb = state_emb + ts_emb
        action_emb = action_emb + ts_emb
        cad_emb = self.embed_image(self.cad_encoder(cad, deterministic))

        x = self.embed_ln(self._stack_tokens(cad_emb, state_emb, action_emb))
        mask = causal_mask(x.shape[1])
        for block in self.blocks:
            x = block(x, mask, deterministic)
        x = self.ln_f(x)

        offset = 1 if self.enable_image_conditioning else 0
        # state-token positions predict the next action
        state_hidden = x[:, offset::2][:, :t].astype(jnp.float32)
        # Always touch the continuous head so init creates its params.
        continuous_actions = jnp.tanh(self.predict_action(state_hidden))
        if continuous:
            return continuous_actions
        cmds = self.predict_cmd(state_hidden)
        params = self.predict_params(state_hidden).reshape(
            b, t, cfg.num_params, cfg.num_params_values)
        return cmds, params
