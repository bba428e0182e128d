"""Train-to-accuracy proof (SURVEY.md §7 build-order item 5, BASELINE
config 1): overfit a single synthetic video THROUGH THE CLI — not just
``make_train_step`` — until command accuracy reaches ~100%.

The reference's "minimum slice" promise is that the full stack (loader ->
collate -> train step -> early stopping -> checkpoint -> final test
evaluation) can drive the loss to zero on one video; this is the
end-to-end learning signal test the reference never had.
"""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from tests.helpers import TINY_CONFIG
from videocad_tpu.data.synthetic import synthetic_sequence
from videocad_tpu.etl.dataset_gen import shard_path


@pytest.mark.slow
@pytest.mark.parametrize("quant", ["none", "int8_bwd"])
def test_cli_overfits_single_video(tmp_path, quant):
    # quant='int8_bwd' is the aggressive mode (int8 forward AND backward
    # matmuls, ops/quant.py): overfitting to ~100% through it proves the
    # quantized gradients still carry a usable learning signal end-to-end.
    root = str(tmp_path)
    store = os.path.join(root, "store")
    rng = np.random.default_rng(7)
    video = synthetic_sequence(rng, length=8, image_size=32)

    # The SAME video registered under three ids, one per split: train
    # overfits it, val drives early stopping on it, test reports accuracy
    # on it — "overfit one video" with the reference split plumbing intact.
    split_map = {}
    for i, split in enumerate(("train", "val", "test")):
        fid = f"{i:08d}"
        with open(shard_path(store, fid, "pkl", "data"), "wb") as f:
            pickle.dump(video, f)
        png = shard_path(store, fid, "png", "0")
        os.makedirs(os.path.dirname(png), exist_ok=True)
        Image.fromarray(video["frames"][0]).save(png)
        split_map[fid] = split
    split_path = os.path.join(store, "dataset_split.json")
    with open(split_path, "w") as f:
        json.dump(split_map, f)

    config_path = os.path.join(root, "model_configs.json")
    with open(config_path, "w") as f:
        json.dump({"overfit": dict(TINY_CONFIG)}, f)

    from videocad_tpu.cli.train import main
    main([
        "--dataset_path", store,
        "--config_path", split_path,
        "--model_config", config_path,
        "--model_name", "overfit",
        "--batch_size", "1",
        "--epochs", "400",
        "--lr", "3e-3",
        "--data_parallel", "1",
        "--buckets", "8",
        "--checkpoint_dir", os.path.join(root, "ckpt"),
        "--log_dir", os.path.join(root, "logs"),
        "--quant", quant,
    ])

    exp = [d for d in os.listdir(os.path.join(root, "logs"))
           if d.startswith("overfit_")][0]
    with open(os.path.join(root, "logs", exp, "results.json")) as f:
        results = json.load(f)
    # cmd accuracy is a percentage; 8 timesteps -> 7 predictions, so ~100%
    # means every command is right.
    assert results["cmd_accuracy"] >= 99.0, results
    assert results["params_accuracy"] >= 99.0, results
    # the epoch logs record the climb, not just the endpoint
    # (reference layout: logs/<experiment>/epoch_N.json)
    with open(os.path.join(root, "logs", exp, "epoch_1.json")) as f:
        first = json.load(f)
    assert first["cmd_accuracy"] < results["cmd_accuracy"]
