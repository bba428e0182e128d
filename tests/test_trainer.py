"""Trainer orchestration: end-to-end loop on a synthetic store, checkpoints,
resume, eval modes, first-mistake analysis."""

import json
import os

import numpy as np
import pytest

from tests.helpers import TINY_CONFIG
from videocad_tpu.data import DataPipeline, VideoCADDataset, load_split_ids
from videocad_tpu.data.synthetic import write_synthetic_dataset
from videocad_tpu.models import create_model
from videocad_tpu.train import LossConfig
from videocad_tpu.train.trainer import Trainer

CMD_WEIGHTS = (0.043, 0.029, 0.268, 0.6, 0.059)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainer_env")
    store = os.path.join(root, "store")
    split_path = os.path.join(store, "dataset_split.json")
    write_synthetic_dataset(store, num_sequences=8, min_len=5, max_len=8,
                            image_size=32, split_path=split_path)
    splits = load_split_ids(split_path)
    pipes = {}
    for split in ("train", "val", "test"):
        ids = splits.get(split) or splits["train"]
        ds = VideoCADDataset(store, ids=ids)
        pipes[split] = DataPipeline(ds, batch_size=2, buckets=(8,),
                                    shuffle=split == "train", seed=0)
    return root, pipes


def _make_trainer(env, tmpdir_name, **config):
    root, pipes = env
    model = create_model(dict(TINY_CONFIG))
    training_config = {
        "lr": 1e-3,
        "save_frequency": 2,
        "val_frequency": 1,
        "experiment_name": "exp",
        "checkpoint_dir": os.path.join(root, tmpdir_name, "ckpt"),
        "early_stopping_enabled": False,
        **config,
    }
    loss_cfg = LossConfig(cmd_weights=CMD_WEIGHTS, use_mse=True)
    return Trainer(model, pipes["train"], pipes["val"], pipes["test"],
                   training_config, loss_cfg,
                   log_dir=os.path.join(root, tmpdir_name, "logs"))


@pytest.mark.slow
def test_train_loop_and_metrics_logging(env):
    trainer = _make_trainer(env, "run1")
    params = trainer.train(epochs=2)
    assert params is not None
    log_dir = trainer.logger.dir
    assert os.path.exists(os.path.join(log_dir, "epoch_1.json"))
    assert os.path.exists(os.path.join(log_dir, "val_epoch_1.json"))
    with open(os.path.join(log_dir, "val_epoch_1.json")) as f:
        metrics = json.load(f)
    assert "cmd_accuracy" in metrics and "param_accuracy_3" in metrics


def test_latest_epoch_ignores_orbax_tmp_litter(tmp_path):
    """A preempted run leaves 'epoch_N.orbax-checkpoint-tmp-*' dirs next
    to finalized checkpoints; resume must neither crash on the int parse
    nor pick the incomplete dir over a finalized one."""
    from videocad_tpu.train.checkpoint import CheckpointHandler

    handler = CheckpointHandler("exp", str(tmp_path))
    for d in ("epoch_1", "epoch_2",
              "epoch_5.orbax-checkpoint-tmp-171234", "epoch_final"):
        os.makedirs(os.path.join(handler.base, d))
    assert handler.latest_epoch() == "epoch_2"


@pytest.mark.slow
def test_checkpoint_save_and_resume(env):
    trainer = _make_trainer(env, "run2")
    trainer.train(epochs=2)  # save_frequency=2 -> epoch_2 checkpoint
    assert trainer.checkpoints.latest_epoch() == "epoch_2"

    fresh = _make_trainer(env, "run2")
    assert fresh.resume()
    assert fresh.start_epoch == 2
    # resumed params match trained params exactly (incl. optimizer restore)
    import jax
    a = jax.device_get(trainer.state.params["predict_cmd"]["kernel"])
    b = jax.device_get(fresh.state.params["predict_cmd"]["kernel"])
    np.testing.assert_array_equal(a, b)
    mu_a = jax.tree_util.tree_leaves(trainer.state.opt_state)[1]
    mu_b = jax.tree_util.tree_leaves(fresh.state.opt_state)[1]
    np.testing.assert_array_equal(np.asarray(mu_a), np.asarray(mu_b))


@pytest.mark.slow
def test_evaluate_and_sequential_evaluate(env):
    trainer = _make_trainer(env, "run3")
    metrics = trainer.evaluate(mode="val")
    assert metrics["total_predictions"] > 0
    seq_metrics = trainer.sequential_evaluate(mode="val")
    assert seq_metrics["total_predictions"] > 0
    # teacher-forced and rollout see the same label set
    assert seq_metrics["total_predictions"] == metrics["total_predictions"]


def test_sample_writes_csvs(env, tmp_path):
    trainer = _make_trainer(env, "run4")
    out = str(tmp_path / "samples")
    trainer.sample(n=2, folder=out, mode="val")
    files = os.listdir(out)
    assert any(f.startswith("pred_actions_") for f in files)
    assert any(f.startswith("actions_") for f in files)
    pred_file = sorted(f for f in files if f.startswith("pred_actions_"))[0]
    rows = open(os.path.join(out, pred_file)).read().strip().splitlines()
    assert len(rows[0].split(",")) == 7


def test_find_first_mistake_structure(env):
    trainer = _make_trainer(env, "run5")
    data = trainer.find_first_mistake(mode="val", tol=2)
    assert len(data) == 2
    bucket = data[0]
    assert set(bucket) == {"First Mistakes", "Memory", "Sequence Lengths",
                           "Number of Mistakes"}
    assert len(bucket["Sequence Lengths"]) > 0
    first, total = bucket["Sequence Lengths"][0]
    assert 0 <= first <= total
    # memory records (gt, pred) pairs for every valid step
    assert all(len(m) == 2 for m in bucket["Memory"]["cmd"])


@pytest.mark.slow
def test_early_stopping_accuracy_metric_not_poisoned_by_loss(env):
    """With metric='accuracy' (max mode), non-validation epochs must not
    feed the loss value into the best-metric tracking (regression: the
    loss fallback froze best at epoch 0 and stopped training)."""
    trainer = _make_trainer(env, "run7",
                            val_frequency=2,  # epoch 1 has no validation
                            early_stopping_enabled=True,
                            early_stopping_patience=3,
                            early_stopping_metric="accuracy",
                            early_stopping_mode="max")
    trainer.train(epochs=4)
    # training ran all epochs: accuracy (a fraction) was only compared
    # against accuracy, never against the large loss value
    assert os.path.exists(os.path.join(trainer.logger.dir, "epoch_4.json"))


def test_pipeline_early_break_does_not_hang(env):
    """Abandoning an epoch mid-iteration must terminate the prefetch
    worker (regression: q.put blocked forever on the full queue)."""
    import threading
    import time
    _, pipes = env
    pipe = pipes["train"]
    before = threading.active_count()
    for _ in range(5):
        for batch in pipe.epoch(0):
            break  # consume one batch, abandon the generator
    # In-flight assemblies finish and their workers exit; give them a
    # bounded moment (the instantaneous count is racy on a loaded host —
    # a genuine q.put hang never converges and still fails here).
    deadline = time.time() + 10.0
    while threading.active_count() > before + 1 and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before + 1


@pytest.mark.slow
def test_early_stopping_triggers(env):
    trainer = _make_trainer(env, "run6",
                            early_stopping_enabled=True,
                            early_stopping_patience=1,
                            early_stopping_metric="loss",
                            early_stopping_mode="min",
                            early_stopping_min_delta=1e9)  # never improves twice
    trainer.train(epochs=5)
    # stopped early: no epoch_4 checkpoint/log
    assert not os.path.exists(os.path.join(trainer.logger.dir, "epoch_5.json"))
