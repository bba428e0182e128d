"""Model factory: named JSON configs -> model + initialized params.

Preserves the reference's public config surface (model_configs/*.json —
SURVEY.md §2 config table): every named experiment config instantiates
VideoCADFormer regardless of its ``model_name`` field, matching the
reference factory's behavior (/root/reference/model/model_factory.py:22,
quirk 1).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from videocad_tpu.models.videocadformer import (
    VideoCADFormer,
    VideoCADFormerConfig,
)


def create_model(model_config: Dict[str, Any]):
    """Build the model from a config dict (reference JSON schema accepted).

    Like the reference factory, the ``model_name`` field does NOT select an
    architecture — every named config builds VideoCADFormer (quirk 1). The
    decision-transformer family (vid_pretrained scaffold) is an explicit
    opt-in via ``model_family: "decision_transformer"``.
    """
    cfg = VideoCADFormerConfig.from_json(model_config)
    if model_config.get("model_family") == "decision_transformer":
        from videocad_tpu.models.decision_transformer import DecisionTransformer
        return DecisionTransformer(
            cfg,
            n_layer=model_config.get("n_layer", 6),
            n_head=model_config.get("n_head", 8),
            enable_image_conditioning=model_config.get(
                "enable_image_conditioning", True))
    return VideoCADFormer(cfg)


def load_named_config(config_path: str, name: str) -> Dict[str, Any]:
    with open(config_path) as f:
        configs = json.load(f)
    if name not in configs:
        raise KeyError(f"Config '{name}' not in {config_path}; "
                       f"available: {sorted(configs)}")
    return configs[name]


# The flagship experiment (reference model_configs/
# transformer_experiments.json) — the config bench.py measures and
# __graft_entry__ compile-checks. Both load it through flagship_config()
# so the bench provably measures the named config, not a convention-synced
# copy of it.
FLAGSHIP_NAME = "cad_past_10_actions_and_states_timestep_embedding"


def flagship_config() -> Dict[str, Any]:
    """The flagship named config, loaded from the repo's config file."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, os.pardir, "model_configs",
                        "transformer_experiments.json")
    return load_named_config(os.path.normpath(path), FLAGSHIP_NAME)


def example_inputs(cfg: VideoCADFormerConfig, batch: int = 1,
                   seq_len: int = 4) -> Dict[str, jnp.ndarray]:
    """A zero batch with the model's input contract (NHWC frames)."""
    h = w = cfg.image_size
    c = cfg.image_channels
    if cfg.use_pretrained_cad_model:
        # GenCAD branch: the CAD input is the 3-channel 256x256 edge image
        # (data/dataset.py gencad_cad_image).
        cad = jnp.zeros((batch, 256, 256, 3), jnp.float32)
    else:
        cad = jnp.zeros((batch, h, w, c), jnp.float32)
    inputs = {
        "frames": jnp.zeros((batch, seq_len, h, w, c), jnp.float32),
        "actions": jnp.zeros((batch, seq_len, cfg.act_dim), jnp.float32),
        "cad_image": cad,
        "timesteps": jnp.tile(jnp.arange(seq_len)[None], (batch, 1)),
    }
    if cfg.num_views > 0:
        inputs["multiview_images"] = jnp.zeros(
            (batch, cfg.num_views, h, w, c), jnp.float32)
    return inputs


def init_model(model: VideoCADFormer, rng: jax.Array,
               batch: int = 1, seq_len: int = 4):
    """Initialize parameters with a dummy batch."""
    inputs = example_inputs(model.config, batch, seq_len)
    return model.init({"params": rng}, inputs, deterministic=True)["params"]
