"""End-to-end CLI smoke: train on a synthetic store, then evaluate the
checkpoint with the full plot suite."""

import json
import os

import pytest

from tests.helpers import TINY_CONFIG
from videocad_tpu.data.synthetic import write_synthetic_dataset


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_ws")
    store = os.path.join(root, "store")
    split = os.path.join(store, "dataset_split.json")
    write_synthetic_dataset(store, num_sequences=8, min_len=5, max_len=8,
                            image_size=32, split_path=split)
    config_path = os.path.join(root, "model_configs.json")
    with open(config_path, "w") as f:
        json.dump({"tiny": dict(TINY_CONFIG)}, f)
    return root, store, split, config_path


@pytest.mark.slow
def test_train_cli_end_to_end(workspace, monkeypatch):
    root, store, split, config_path = workspace
    monkeypatch.chdir(root)
    from videocad_tpu.cli.train import main
    main([
        "--dataset_path", store,
        "--config_path", split,
        "--model_config", config_path,
        "--model_name", "tiny",
        "--batch_size", "2",
        "--epochs", "1",
        "--lr", "1e-3",
        "--data_parallel", "2",
        "--buckets", "8",
        "--checkpoint_dir", os.path.join(root, "ckpt"),
        "--log_dir", os.path.join(root, "logs"),
    ])
    # experiment artifacts in the reference layout
    exp_dirs = os.listdir(os.path.join(root, "logs"))
    assert any(d.startswith("tiny_") for d in exp_dirs)
    exp = [d for d in exp_dirs if d.startswith("tiny_")][0]
    exp_dir = os.path.join(root, "logs", exp)
    assert os.path.exists(os.path.join(exp_dir, "params.json"))
    assert os.path.exists(os.path.join(exp_dir, "training_config.json"))
    assert os.path.exists(os.path.join(exp_dir, "results.json"))
    with open(os.path.join(exp_dir, "results.json")) as f:
        results = json.load(f)
    assert results["total_predictions"] > 0
    # best_model checkpoint exists (early stopping saves on improvement)
    assert os.path.exists(os.path.join(root, "ckpt", exp, "best_model"))


@pytest.mark.slow
def test_evaluate_cli_end_to_end(workspace, monkeypatch):
    root, store, split, config_path = workspace
    monkeypatch.chdir(root)
    exp = [d for d in os.listdir(os.path.join(root, "logs"))
           if d.startswith("tiny_")][0]
    from videocad_tpu.cli.evaluate import main
    main([
        "--dataset_path", store,
        "--config_path", split,
        "--model_config", config_path,
        "--model_name", "tiny",
        "--checkpoint_folder", exp,
        "--checkpoint_dir", os.path.join(root, "ckpt"),
        "--output_root_dir", os.path.join(root, "test_out"),
        "--batch_size", "2",
        "--buckets", "8",
        "--tol", "2",
    ])
    plots = os.listdir(os.path.join(root, "test_out", exp, "plots"))
    assert any("confusion_matrix" in p for p in plots)
    assert any("accuracy_vs_tolerance" in p for p in plots)
    assert any("perfect_sequence_vs_given" in p for p in plots)
    samples = os.listdir(os.path.join(root, "test_out", exp, "samples"))
    assert any(s.startswith("pred_actions_") for s in samples)
