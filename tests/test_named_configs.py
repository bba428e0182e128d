"""Every reference named config builds, initializes, trains and evals.

The reference's public experiment surface is the union of names in its
model_configs/*.json (SURVEY.md §2 config table; BASELINE "public API
surface preserved"). This suite enforces two properties:

  1. name coverage — every name in every reference config file exists in
     the same-named repo config file;
  2. buildability — for every name, ``create_model`` + init + one train
     step + one eval step succeed (tiny vision-encoder override for speed;
     the decoder/backbone keeps the config's real width/depth/heads).

Configs that resolve to the same model are built once (module-level cache)
so the 27-name matrix costs ~10 unique builds.
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import synthetic_batch
from videocad_tpu.models import create_model, init_model
from videocad_tpu.models.videocadformer import VideoCADFormerConfig
from videocad_tpu.train import (
    LossConfig,
    create_train_state,
    make_eval_step,
    make_train_step,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_CONFIG_DIR = "/root/reference/model_configs"
REPO_CONFIG_DIR = os.path.join(REPO_ROOT, "model_configs")

# Tiny vision encoder: the smoke test proves each named config's decoder /
# backbone builds at its real size; only the (fixed-size, config-independent)
# vision tower is shrunk. Pallas impls are reset to xla for CPU.
TINY_VISION = dict(
    image_size=32, vit_patch=16, vit_dim=32, vit_depth=1, vit_heads=2,
    vit_head_dim=16, vit_mlp_dim=32, dtype="float32",
    vit_attention_impl="xla", vit_mlp_impl="xla", attention_impl="xla",
    ln_impl="xla", dropout_impl="xla", preprocess_impl="xla",
    remat_encoder=False,
)

LOSS_CFG = LossConfig(cmd_weights=(0.043, 0.029, 0.268, 0.6, 0.059),
                      use_mse=True)


def _load(path):
    with open(path) as f:
        return json.load(f)


def _ref_names():
    cases = []
    for fname in sorted(os.listdir(REF_CONFIG_DIR)):
        if fname.endswith(".json"):
            for name in _load(os.path.join(REF_CONFIG_DIR, fname)):
                cases.append((fname, name))
    return cases


REF_CASES = _ref_names()


def test_reference_name_set_is_subset_of_repo():
    """Every reference config file + name exists in the repo's configs."""
    missing = []
    for fname, name in REF_CASES:
        repo_path = os.path.join(REPO_CONFIG_DIR, fname)
        if not os.path.exists(repo_path) or name not in _load(repo_path):
            missing.append(f"{fname}:{name}")
    assert not missing, f"repo config surface missing: {missing}"


def _cache_key(cfg_dict):
    """Names resolving to the same model share one build."""
    model_cfg = VideoCADFormerConfig.from_json(cfg_dict)
    extras = tuple(sorted(
        (k, str(v)) for k, v in cfg_dict.items()
        if k in ("model_family", "n_layer", "n_head",
                 "enable_image_conditioning")))
    return dataclasses.astuple(model_cfg) + extras


_BUILD_CACHE = {}


def _smoke(cfg_dict):
    key = _cache_key(cfg_dict)
    if key in _BUILD_CACHE:
        return _BUILD_CACHE[key]

    model = create_model(cfg_dict)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    state, tx = create_train_state(params, {"lr": 1e-3})

    cfg = VideoCADFormerConfig.from_json(cfg_dict)
    data = synthetic_batch(np.random.default_rng(1), batch=1, seq_len=3,
                           image_size=cfg.image_size,
                           num_views=cfg.num_views)
    if cfg.use_pretrained_cad_model:
        data["cad_image"] = np.random.default_rng(2).random(
            (1, 256, 256, 3), dtype=np.float32)
    batch = {k: jnp.asarray(v) for k, v in data.items()}

    # Eager (unjitted) steps: op-level compile caches are shared across
    # the configs, so the matrix stays fast on CPU.
    train_step = make_train_step(model, tx, LOSS_CFG,
                                 dropout_rng_impl="threefry")
    new_state, loss, metrics = train_step(state, batch, jax.random.PRNGKey(3))
    eval_loss, eval_metrics = make_eval_step(model, LOSS_CFG)(
        new_state.params, batch)

    result = (float(loss), float(eval_loss),
              float(metrics["total_predictions"]),
              int(new_state.step))
    _BUILD_CACHE[key] = result
    return result


@pytest.mark.parametrize("fname,name", REF_CASES,
                         ids=[f"{f.removesuffix('.json')}:{n}"
                              for f, n in REF_CASES])
@pytest.mark.slow
def test_named_config_builds_and_trains(fname, name):
    cfg_dict = dict(_load(os.path.join(REPO_CONFIG_DIR, fname))[name],
                    **TINY_VISION)
    loss, eval_loss, total_preds, step = _smoke(cfg_dict)
    assert np.isfinite(loss) and np.isfinite(eval_loss), (loss, eval_loss)
    assert total_preds > 0
    assert step == 1
