"""Interpretability: CAD-image saliency + ViT attention rollout.

Functional equivalents of the reference's hook-based implementations
(/root/reference/trainer.py:604-709): saliency is one `jax.grad` of the
selected command logit w.r.t. the CAD image (no retain_graph dance), and
attention rollout reads the softmax weights recorded by the ViT into flax's
'intermediates' collection (no forward hooks on dropout modules).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from videocad_tpu.actions.ops import normalize_actions
from videocad_tpu.models.videocadformer import VideoCADFormer
from videocad_tpu.models.vit import ViT, ViTConfig


def cad_saliency(model: VideoCADFormer, params: Dict, batch: Dict,
                 target_class: Optional[int] = None):
    """|d logit / d cad_image|, max over channels -> (B, H, W) heatmaps.

    Uses the first timestep's command logits (reference trainer.py:604-648):
    frames[:, :1], normalized actions[:, :1].
    """
    from videocad_tpu.ops.preprocess import maybe_preprocess

    cad = maybe_preprocess(batch["cad_image"]).astype(jnp.float32)
    inputs = {
        "frames": batch["frames"][:, :1],
        "actions": normalize_actions(batch["actions"])[:, :1],
    }
    if batch.get("multiview_images") is not None:
        # Views have no time axis — pass all of them. (The reference slices
        # [:, :1] here too, which breaks embed_multiview for num_views > 1;
        # a bug, not a parity surface.)
        inputs["multiview_images"] = batch["multiview_images"]

    def selected_logit_sum(cad_image):
        cmd_logits, _ = model.apply(
            {"params": params}, dict(inputs, cad_image=cad_image),
            deterministic=True)
        first = cmd_logits[:, 0]  # (B, num_classes)
        if target_class is None:
            idx = jnp.argmax(first, axis=1)
        else:
            idx = jnp.full((first.shape[0],), target_class)
        return jnp.take_along_axis(first, idx[:, None], axis=1).sum()

    grads = jax.grad(selected_logit_sum)(cad)
    saliency = jnp.abs(grads).max(axis=-1)  # max over channels (NHWC)
    return cad, saliency


def attention_rollout(model: VideoCADFormer, params: Dict,
                      cad_image: jnp.ndarray, discard_ratio: float = 0.0,
                      output_size: Optional[int] = None) -> jnp.ndarray:
    """Attention rollout over the CAD ViT encoder -> (B, H, W) heatmaps.

    joint attention = prod over layers of row-normalized (A_mean_heads + I);
    the CLS row's patch attention reshapes to the patch grid and upsamples
    bilinearly (reference trainer.py:650-709).
    """
    cfg = model.config
    if cfg.encoder != "vit":
        raise ValueError("attention rollout requires the ViT encoder")
    from videocad_tpu.ops.preprocess import maybe_preprocess

    cad = maybe_preprocess(cad_image)
    vit_cfg = ViTConfig(
        image_size=cfg.image_size, patch_size=cfg.vit_patch, dim=cfg.vit_dim,
        depth=cfg.vit_depth, heads=cfg.vit_heads, head_dim=cfg.vit_head_dim,
        mlp_dim=cfg.vit_mlp_dim, channels=cfg.image_channels,
        dropout=cfg.dropout, emb_dropout=cfg.dropout)
    vit = ViT(vit_cfg, sow_attention=True)
    _, state = vit.apply({"params": params["cad_encoder"]}, cad,
                         True, mutable=["intermediates"])

    # collect per-block weights in layer order: (L, B, H, N, N)
    inter = state["intermediates"]
    layers = []
    for i in range(vit_cfg.depth):
        layers.append(inter[f"block_{i}"]["attn"]["attention_weights"][0])
    attn = jnp.stack(layers)  # (L, B, H, N, N)
    attn = attn.mean(axis=2)  # average heads -> (L, B, N, N)

    if discard_ratio > 0:
        flat = attn.reshape(attn.shape[:2] + (-1,))
        k = int(flat.shape[-1] * discard_ratio)
        if k > 0:
            thresh = jnp.sort(flat, axis=-1)[..., k][..., None]
            attn = jnp.where(flat < thresh, 0.0, flat).reshape(attn.shape)

    n = attn.shape[-1]
    eye = jnp.eye(n)[None, None]
    attn = attn + eye
    attn = attn / attn.sum(axis=-1, keepdims=True)

    joint = attn[0]
    for i in range(1, attn.shape[0]):
        joint = jnp.einsum("bij,bjk->bik", attn[i], joint)

    mask = joint[:, 0, 1:]  # CLS -> patches
    grid = cfg.image_size // cfg.vit_patch
    mask = mask.reshape(-1, grid, grid)
    size = output_size or cfg.image_size
    return jax.image.resize(mask, (mask.shape[0], size, size), "bilinear")
