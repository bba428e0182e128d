"""Experiment runner: named configs, grid sweep, artifact layout."""

import json
import os

import pytest

from tests.helpers import TINY_CONFIG
from videocad_tpu.data import DataPipeline, VideoCADDataset, load_split_ids
from videocad_tpu.data.synthetic import write_synthetic_dataset
from videocad_tpu.experiment import Experiment


@pytest.fixture(scope="module")
def pipes(tmp_path_factory):
    root = tmp_path_factory.mktemp("exp_env")
    store = os.path.join(root, "store")
    split = os.path.join(store, "dataset_split.json")
    write_synthetic_dataset(store, num_sequences=6, min_len=5, max_len=8,
                            image_size=32, split_path=split)
    splits = load_split_ids(split)
    out = {}
    for name in ("train", "val", "test"):
        ids = splits.get(name) or splits["train"]
        ds = VideoCADDataset(store, ids=ids)
        out[name] = DataPipeline(ds, batch_size=2, buckets=(8,),
                                 shuffle=name == "train", seed=0)
    return root, out


def _experiment(root, pipes, log_dir):
    training_config = {
        "lr": 1e-3, "epochs": 1, "save_frequency": 10, "val_frequency": 10,
        "early_stopping_enabled": False,
        "checkpoint_dir": os.path.join(root, log_dir, "ckpt"),
    }
    return Experiment(pipes["train"], pipes["val"], pipes["test"],
                      training_config,
                      log_dir=os.path.join(root, log_dir),
                      class_weights_path=None)


@pytest.mark.slow
def test_grid_sweep_expands_list_params(pipes):
    root, p = pipes
    exp = _experiment(root, p, "grid")
    params = dict(TINY_CONFIG, window_size=[2, 3])
    results = exp.run_grid(params)
    assert len(results) == 2  # two window sizes
    runs = [r for r in os.listdir(os.path.join(root, "grid"))
            if r != "ckpt"]
    assert len(runs) == 2
    # each run saved the expanded (scalar) param value
    run_dir = sorted(runs)[0]
    with open(os.path.join(root, "grid", run_dir, "params.json")) as f:
        saved = json.load(f)
    assert saved["window_size"] in (2, 3)


@pytest.mark.slow
def test_named_config_run_writes_results(pipes):
    root, p = pipes
    exp = _experiment(root, p, "named")
    results = exp.run_with_config({"tiny": dict(TINY_CONFIG)}, "tiny")
    assert results["total_predictions"] > 0
    run = [d for d in os.listdir(os.path.join(root, "named"))
           if d.startswith("tiny_")][0]
    assert os.path.exists(os.path.join(root, "named", run, "results.json"))


def test_warm_start_from_torch_pt(pipes, tmp_path):
    """experiment_params['state_dict'] accepting a reference .pt checkpoint
    (reference experiment.py:61-71), converted on the fly."""
    import torch
    from tests.test_full_model_parity import MODEL_CONFIG, TorchRefModel

    root, p = pipes
    torch.manual_seed(0)
    oracle = TorchRefModel(modern_vit=True).eval()
    ckpt_path = os.path.join(tmp_path, "best_model.pt")
    torch.save({"model_state_dict": {
        "module." + k: v for k, v in oracle.state_dict().items()},
        "epoch": 3}, ckpt_path)

    exp = _experiment(root, p, "warm")
    exp.training_config["epochs"] = 0  # load + evaluate only
    results = exp.run_with_params(
        dict(MODEL_CONFIG, state_dict=ckpt_path), "warm")
    assert results["total_predictions"] > 0

    # A checkpoint that doesn't match the config must fail loudly, proving
    # the conversion path actually runs.
    bad_path = os.path.join(tmp_path, "bad.pt")
    torch.save({"model_state_dict": {"embed_state.weight":
                                     torch.zeros(2, 2)}}, bad_path)
    with pytest.raises(KeyError):
        exp.run_with_params(dict(MODEL_CONFIG, state_dict=bad_path), "warm2")
