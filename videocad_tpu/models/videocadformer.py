"""VideoCADFormer: the autoregressive action-prediction model.

TPU-native re-design of the reference AutoRegressiveTransformer
(/root/reference/model/autoregressive_transformer.py) + its TrajectoryModel /
BaseTransformer scaffolding (trajectory_model.py, base_transformer.py):

  inputs:  UI frame history (B,T,H,W,C), past actions (B,T,7) normalized,
           target CAD image (B,H,W,C), optional multiview images (B,V,H,W,C)
  outputs: command logits (B,T,5) and parameter logits (B,T,6,1000)

Structure (parity with the reference forward, :121-220):
  * per-frame vision encoding (ViT or ResNet18-GN) -> Dense(512->hidden)
    -> +timestep embedding -> tanh
  * CAD image encoded once, broadcast over T; multiview embeddings appended;
    concatenated streams projected back to hidden and tanh'd
  * action embeddings Dense(7->hidden) -> +timestep embedding -> tanh
  * 8-layer post-LN transformer decoder; wiring depends on flags:
      - past actions on:  tgt=actions (causal), memory=images (banded window)
      - past states only: tgt=frames, memory=CAD context (both banded)
      - neither:          tgt=memory=CAD context (banded)
  * heads: Dense(hidden->5) and Dense(hidden->6*1000)

TPU-first details: frames are NHWC; the B*T frame batch is encoded in one
big MXU-friendly batch (optionally rematerialized / chunked via
``frame_chunk`` to bound activation memory at long T); timesteps are always
arange(T) (the reference regenerates them too — quirk 6); masks are boolean
and computed statically per padded bucket length.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from videocad_tpu.actions.vocab import ACT_DIM, NUM_BINS, NUM_COMMANDS, NUM_PARAMS
from videocad_tpu.models.layers import TransformerDecoder, banded_mask, causal_mask
from videocad_tpu.ops.preprocess import maybe_preprocess
from videocad_tpu.models.resnet import ResNet18GN
from videocad_tpu.models.vit import ViT, ViTConfig

@dataclasses.dataclass(frozen=True)
class VideoCADFormerConfig:
    act_dim: int = ACT_DIM
    hidden_size: int = 1024
    num_classes: int = NUM_COMMANDS
    num_params: int = NUM_PARAMS
    num_params_values: int = NUM_BINS
    num_decoder_layers: int = 8
    dim_feedforward: int = 1024
    nhead: int = 4
    dropout: float = 0.1
    encoder: str = "vit"            # 'vit' | 'resnet'
    enable_past_actions: bool = False
    enable_past_states: bool = False
    enable_timestep_embedding: bool = False
    num_views: int = 0
    window_size: int = 1
    max_ep_len: int = 1000
    use_pretrained_cad_model: bool = False  # freezes the CAD encoder
    image_channels: int = 1
    # Vision-encoder dims (defaults = the reference's fixed ViT —
    # trajectory_model.py:53-67; overridable for small test configs)
    image_size: int = 224
    vit_patch: int = 32
    vit_dim: int = 512
    vit_depth: int = 6
    vit_heads: int = 16
    vit_head_dim: int = 64
    vit_mlp_dim: int = 512
    # vit_pytorch generation flags (legacy PreNorm-era checkpoints have no
    # patch-projection LayerNorms and no final transformer norm); see
    # tools/convert_torch_checkpoint.detect_config_overrides
    vit_patch_norm: bool = True
    vit_final_norm: bool = True
    # TPU knobs
    dtype: str = "float32"           # compute dtype: 'float32' | 'bfloat16'
    attention_impl: str = "xla"      # 'xla' | 'pallas' (decoder)
    # 'xla' | 'fused' (fused MHSA kernel) | 'block' (fused LN+qkv+MHSA+
    # out-proj+residual attn_block kernel, ops/fused_block.py)
    vit_attention_impl: str = "xla"
    # 'xla' | 'block' (fused LN+fc1+gelu+drop+fc2+residual mlp_block
    # kernel); forced on when vit_attention_impl == 'block'
    vit_mlp_impl: str = "xla"
    ln_impl: str = "xla"             # 'xla' | 'pallas' (ViT LayerNorms)
    dropout_impl: str = "xla"        # 'xla' | 'pallas' (hardware-PRNG fused)
    # 'none' | 'int8' (q8 MXU forward, straight-through backward) |
    # 'int8_bwd' (q8 forward + backward) for ViT + decoder dense layers;
    # heads/embeddings stay full-precision (ops/quant.py)
    quant: str = "none"
    preprocess_impl: str = "xla"     # 'xla' | 'pallas' (uint8 image inputs)
    frame_chunk: int = 0             # >0: scan frame encoding in chunks
    remat_encoder: bool = False      # rematerialize per-frame encoding
    # Reference quirk: frames are stored BGR but grayscaled as if RGB
    # (ops/preprocess.py docstring); CAD images use correct weights.
    bgr_frames_as_rgb: bool = True

    @staticmethod
    def from_json(config: Dict[str, Any]) -> "VideoCADFormerConfig":
        """Build from a reference model_configs/*.json entry.

        Unknown reference keys are tolerated; sizing comes from the same
        fields the reference actually uses.
        """
        fields = {f.name for f in dataclasses.fields(VideoCADFormerConfig)}
        kwargs = {k: v for k, v in config.items() if k in fields}
        assert config.get("window_size", 1) > 0, "Window size must be > 0"
        return VideoCADFormerConfig(**kwargs)

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def num_inputs(self) -> int:
        n = 1  # CAD
        if self.enable_past_states:
            n += 1
        if self.num_views > 0:
            n += 1
        return n


def _make_encoder(cfg: VideoCADFormerConfig, name: str, remat: bool = False,
                  image_size: int = None, channels: int = None):
    if cfg.encoder == "vit":
        cls = nn.remat(ViT, static_argnums=(2,)) if remat else ViT
        vit_cfg = ViTConfig(
            image_size=image_size or cfg.image_size, patch_size=cfg.vit_patch,
            dim=cfg.vit_dim, depth=cfg.vit_depth, heads=cfg.vit_heads,
            head_dim=cfg.vit_head_dim, mlp_dim=cfg.vit_mlp_dim,
            channels=channels or cfg.image_channels, dropout=cfg.dropout,
            emb_dropout=cfg.dropout, patch_norm=cfg.vit_patch_norm,
            final_norm=cfg.vit_final_norm)
        return cls(vit_cfg, dtype=cfg.compute_dtype,
                   attention_impl=cfg.vit_attention_impl,
                   mlp_impl=cfg.vit_mlp_impl,
                   dropout_impl=cfg.dropout_impl, ln_impl=cfg.ln_impl,
                   quant=cfg.quant, name=name)
    if cfg.encoder == "resnet":
        cls = nn.remat(ResNet18GN, static_argnums=(2,)) if remat else ResNet18GN
        return cls(dtype=cfg.compute_dtype, name=name)
    raise ValueError(f"Model type {cfg.encoder} not supported")


def encoder_embed_dim(cfg: VideoCADFormerConfig) -> int:
    """Width of the vision embedding (512 for both reference encoders —
    trajectory_model.py:67-72; follows vit_dim for small test configs)."""
    return cfg.vit_dim if cfg.encoder == "vit" else 512


class VideoCADFormer(nn.Module):
    config: VideoCADFormerConfig

    def setup(self):
        cfg = self.config
        dtype = cfg.compute_dtype
        if cfg.enable_past_states:
            self.state_encoder = _make_encoder(
                cfg, "state_encoder", remat=cfg.remat_encoder)
        if cfg.use_pretrained_cad_model:
            if cfg.num_views > 0:
                # Multiview images are grayscale frame-sized and would be
                # fed to the GenCAD-shaped (256x256x3 edge-image) encoder
                # below — the shapes can never match. The reference cannot
                # express this combination either (its gencad factory path
                # raises unconditionally, quirk 7).
                raise ValueError(
                    "use_pretrained_cad_model (GenCAD) and num_views > 0 "
                    "cannot be combined: the GenCAD CAD encoder expects "
                    "256x256x3 Canny edge images, not frame-sized "
                    "multiview renders")
            # GenCAD branch: the CAD input is the 3-channel 256x256 Canny
            # edge image (data/dataset.py gencad_cad_image). The reference
            # intended a pretrained "gencad" encoder here but its factory
            # raises ValueError (quirk 7, trajectory_model.py:40, 73-74);
            # we instead build the configured encoder shaped for that
            # input, frozen via the zero-LR optimizer group (train/state).
            self.cad_encoder = _make_encoder(cfg, "cad_encoder",
                                             image_size=256, channels=3)
        else:
            self.cad_encoder = _make_encoder(cfg, "cad_encoder")
        self.embed_state = nn.Dense(cfg.hidden_size, dtype=dtype)
        self.embed_image = nn.Dense(cfg.hidden_size, dtype=dtype)
        self.embed_action = nn.Dense(cfg.hidden_size, dtype=dtype)
        if cfg.num_views > 0:
            self.embed_multiview = nn.Dense(cfg.hidden_size, dtype=dtype)
        if cfg.num_inputs > 1:
            self.image_projection = nn.Dense(cfg.hidden_size, dtype=dtype)
        if cfg.enable_timestep_embedding:
            self.timestep_embedding = nn.Embed(
                cfg.max_ep_len, cfg.hidden_size, dtype=dtype)
        self.decoder = TransformerDecoder(
            model_dim=cfg.hidden_size, num_layers=cfg.num_decoder_layers,
            num_heads=cfg.nhead, ffn_dim=cfg.dim_feedforward,
            dropout_rate=cfg.dropout, dtype=dtype,
            attention_impl=cfg.attention_impl,
            dropout_impl=cfg.dropout_impl, quant=cfg.quant)
        self.predict_cmd = nn.Dense(cfg.num_classes, dtype=jnp.float32)
        self.predict_params = nn.Dense(
            cfg.num_params * cfg.num_params_values, dtype=jnp.float32)

    # ---- embedding stages (shared by training forward + rollout) ----

    def _timestep_embeddings(self, seq_length: int) -> jnp.ndarray:
        cfg = self.config
        if cfg.enable_timestep_embedding:
            return self.timestep_embedding(jnp.arange(seq_length))
        return jnp.zeros((seq_length, cfg.hidden_size), dtype=cfg.compute_dtype)

    def encode_frames(self, frames: jnp.ndarray, deterministic=True) -> jnp.ndarray:
        """(B, T, H, W, C) -> (B, T, EMBED_DIM) via the state encoder.

        Frames fold into one (B*T) batch for MXU efficiency; ``frame_chunk``
        scans fixed-size chunks (with remat) to bound activation memory.
        """
        cfg = self.config
        frames = maybe_preprocess(frames, bgr_as_rgb=cfg.bgr_frames_as_rgb,
                                  impl=cfg.preprocess_impl,
                                  target_size=(cfg.image_size,) * 2)
        b, t = frames.shape[:2]
        flat = frames.reshape((b * t,) + frames.shape[2:])

        chunk = cfg.frame_chunk
        # Chunked scan bounds activation memory at inference; training relies
        # on remat_encoder (lifted nn.remat handles dropout RNGs).
        if (chunk and deterministic and not self.is_initializing()
                and (b * t) % chunk == 0 and (b * t) > chunk):
            chunks = flat.reshape((b * t // chunk, chunk) + flat.shape[1:])
            emb = jax.lax.map(lambda x: self.state_encoder(x, True), chunks)
            emb = emb.reshape(b * t, -1)
        else:
            emb = self.state_encoder(flat, deterministic)
        return emb.reshape(b, t, -1)

    def encode_context(self, cad_image, frames=None, multiview_images=None,
                       seq_length: Optional[int] = None, deterministic=True):
        """Build (combined image memory (B,T,hidden), ui embeddings or None).

        Mirrors reference forward :150-175 — including the quirk that UI
        frame embeddings join the memory stream only when past actions are
        also enabled (:158-159).
        """
        cfg = self.config
        t = seq_length if seq_length is not None else frames.shape[1]
        ts_emb = self._timestep_embeddings(t)

        ui_emb = None
        streams = []
        if cfg.enable_past_states:
            state_emb = self.encode_frames(frames, deterministic)
            ui_emb = jnp.tanh(self.embed_state(state_emb) + ts_emb[None])
            if cfg.enable_past_actions:
                streams.append(ui_emb)

        if cfg.use_pretrained_cad_model:
            # GenCAD edge image: normalize all 3 channels, no grayscale
            # (reference Normalize(0.5 x3), data_loader.py:455-469).
            cad_image = maybe_preprocess(cad_image, impl=cfg.preprocess_impl,
                                         mode="normalize_only")
        else:
            cad_image = maybe_preprocess(cad_image, impl=cfg.preprocess_impl,
                                         target_size=(cfg.image_size,) * 2)
        cad_emb = self.cad_encoder(cad_image, deterministic=deterministic)
        cad_emb = self.embed_image(cad_emb)[:, None, :]
        streams.append(jnp.tile(cad_emb, (1, t, 1)))

        if multiview_images is not None and cfg.num_views > 0:
            multiview_images = maybe_preprocess(
                multiview_images, impl=cfg.preprocess_impl,
                target_size=(cfg.image_size,) * 2)
            b, v = multiview_images.shape[:2]
            flat = multiview_images.reshape((b * v,) + multiview_images.shape[2:])
            mv = self.cad_encoder(flat, deterministic=deterministic)
            mv = mv.reshape(b, 1, v * encoder_embed_dim(self.config))
            streams.append(self.embed_multiview(jnp.tile(mv, (1, t, 1))))

        combined = jnp.concatenate(streams, axis=-1)
        if len(streams) > 1:
            combined = self.image_projection(combined)
        return jnp.tanh(combined), ui_emb

    def encode_cad_stream(self, cad_image, multiview_images=None,
                          deterministic=True) -> jnp.ndarray:
        """The position-independent tail of the memory concat, pre-tile.

        Returns (B, hidden) — or (B, 2*hidden) with multiview — the
        [cad_emb, mv_emb] features that ``encode_context`` tiles over T.
        Computed once per serving session by the incremental decoder
        (infer/incremental.py); matches encode_context's stream order.
        """
        cfg = self.config
        if cfg.use_pretrained_cad_model:
            cad_image = maybe_preprocess(cad_image, impl=cfg.preprocess_impl,
                                         mode="normalize_only")
        else:
            cad_image = maybe_preprocess(cad_image, impl=cfg.preprocess_impl,
                                         target_size=(cfg.image_size,) * 2)
        cad_emb = self.cad_encoder(cad_image, deterministic=deterministic)
        streams = [self.embed_image(cad_emb)]
        if multiview_images is not None and cfg.num_views > 0:
            multiview_images = maybe_preprocess(
                multiview_images, impl=cfg.preprocess_impl,
                target_size=(cfg.image_size,) * 2)
            b, v = multiview_images.shape[:2]
            flat = multiview_images.reshape(
                (b * v,) + multiview_images.shape[2:])
            mv = self.cad_encoder(flat, deterministic=deterministic)
            mv = mv.reshape(b, v * encoder_embed_dim(self.config))
            streams.append(self.embed_multiview(mv))
        return jnp.concatenate(streams, axis=-1)

    def encode_memory_step(self, frame, t, cad_stream,
                           deterministic=True) -> jnp.ndarray:
        """One memory position for incremental decode: (B, hidden).

        ``frame``: (B, H, W, C) the newly observed UI frame; ``t``: scalar
        position; ``cad_stream``: ``encode_cad_stream``'s output. Replays
        encode_context's per-position math (ui stream first when past
        actions+states are on, then the constant cad/mv features, one
        projection, tanh) for a single t.
        """
        cfg = self.config
        streams = []
        if cfg.enable_past_states and cfg.enable_past_actions:
            emb = self.encode_frames(frame[:, None], deterministic)[:, 0]
            if cfg.enable_timestep_embedding:
                ts = self.timestep_embedding(t)
            else:
                ts = jnp.zeros((cfg.hidden_size,), cfg.compute_dtype)
            streams.append(jnp.tanh(self.embed_state(emb) + ts))
        streams.append(cad_stream)
        combined = jnp.concatenate(streams, axis=-1)
        if cfg.num_inputs > 1:
            combined = self.image_projection(combined)
        return jnp.tanh(combined)

    def embed_actions(self, actions: jnp.ndarray) -> jnp.ndarray:
        """(B, T, 7) normalized float actions -> (B, T, hidden)."""
        t = actions.shape[1]
        ts_emb = self._timestep_embeddings(t)
        return jnp.tanh(self.embed_action(
            actions.astype(self.config.compute_dtype)) + ts_emb[None])

    def heads(self, hidden: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, t = hidden.shape[:2]
        cmds = self.predict_cmd(hidden.astype(jnp.float32))
        params = self.predict_params(hidden.astype(jnp.float32))
        return cmds, params.reshape(
            b, t, self.config.num_params, self.config.num_params_values)

    # ---- full-sequence (teacher-forced) forward ----

    def __call__(self, inputs: Dict[str, jnp.ndarray], deterministic=True):
        cfg = self.config
        frames = inputs.get("frames")
        actions = inputs["actions"]
        cad_image = inputs["cad_image"]
        multiview = inputs.get("multiview_images")
        seq_length = actions.shape[1]

        combined, ui_emb = self.encode_context(
            cad_image, frames, multiview, seq_length, deterministic)

        band = banded_mask(seq_length, seq_length, cfg.window_size)
        if cfg.enable_past_actions:
            tgt = self.embed_actions(actions)
            hidden = self.decoder(tgt, combined,
                                  tgt_mask=causal_mask(seq_length),
                                  memory_mask=band,
                                  deterministic=deterministic)
        elif cfg.enable_past_states:
            hidden = self.decoder(ui_emb, combined, tgt_mask=band,
                                  memory_mask=band,
                                  deterministic=deterministic)
        else:
            hidden = self.decoder(combined, combined, tgt_mask=band,
                                  memory_mask=band,
                                  deterministic=deterministic)
        return self.heads(hidden)
