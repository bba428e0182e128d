"""Preemption-safe training: SIGTERM -> consensus -> checkpoint -> resume.

The reference has no failure story (SURVEY.md §5). These tests deliver a
REAL signal mid-epoch and assert the trainer stops at the next
log-frequency boundary, saves a checkpoint whose meta restarts the
interrupted epoch, restores the previous signal disposition, and resumes.
"""

import os
import signal

import pytest

from tests.helpers import TINY_CONFIG
from videocad_tpu.data import DataPipeline, VideoCADDataset, load_split_ids
from videocad_tpu.data.synthetic import write_synthetic_dataset
from videocad_tpu.models import create_model
from videocad_tpu.train import LossConfig
from videocad_tpu.train.preempt import PreemptionGuard
from videocad_tpu.train.trainer import Trainer

CMD_WEIGHTS = (0.043, 0.029, 0.268, 0.6, 0.059)


class _SignalingPipeline:
    """Wraps a DataPipeline; sends SIGTERM to this process after yielding
    ``kill_after`` batches of epoch ``kill_epoch`` — a deterministic stand-in
    for a fleet maintenance notice landing mid-epoch."""

    def __init__(self, inner, kill_epoch: int, kill_after: int):
        self.inner = inner
        self.kill_epoch = kill_epoch
        self.kill_after = kill_after

    def __len__(self):
        return len(self.inner)

    def epoch(self, epoch):
        for i, batch in enumerate(self.inner.epoch(epoch)):
            yield batch
            if epoch == self.kill_epoch and i + 1 == self.kill_after:
                os.kill(os.getpid(), signal.SIGTERM)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("preempt_env")
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


def _make_trainer(env, run, train_pipe=None, **config):
    root, pipes = env
    model = create_model(dict(TINY_CONFIG))
    training_config = {
        "lr": 1e-3,
        "save_frequency": 100,  # preemption must not rely on it
        "val_frequency": 100,
        "log_frequency": 1,     # poll the guard at every batch
        "experiment_name": "exp",
        "checkpoint_dir": os.path.join(root, run, "ckpt"),
        "early_stopping_enabled": False,
        **config,
    }
    loss_cfg = LossConfig(cmd_weights=CMD_WEIGHTS, use_mse=True)
    return Trainer(model, train_pipe or pipes["train"], pipes["val"],
                   pipes["test"], training_config, loss_cfg,
                   log_dir=os.path.join(root, run, "logs"))


@pytest.mark.slow
def test_sigterm_mid_epoch_saves_and_resumes(env):
    _root, pipes = env
    prev = signal.getsignal(signal.SIGTERM)
    pipe = _SignalingPipeline(pipes["train"], kill_epoch=1, kill_after=1)
    trainer = _make_trainer(env, "preempt1", train_pipe=pipe)
    trainer.train(epochs=50)

    # Stopped during epoch 1 (the second epoch), far short of 50.
    assert trainer.checkpoints.latest_epoch() == "epoch_1"
    # The previous SIGTERM disposition is back after train().
    assert signal.getsignal(signal.SIGTERM) == prev

    # Resume restarts the INTERRUPTED epoch (meta epoch == 1) and runs to
    # completion now that no signal arrives.
    resumed = _make_trainer(env, "preempt1")
    assert resumed.resume() is True
    assert resumed.start_epoch == 1
    resumed.train(epochs=3)
    assert os.path.exists(os.path.join(resumed.logger.dir, "epoch_3.json"))


def test_preemption_safe_off_leaves_signals_alone(env):
    """With preemption_safe=False the trainer never touches SIGTERM."""
    calls = []
    prev = signal.signal(signal.SIGTERM, lambda *a: calls.append(a))
    try:
        trainer = _make_trainer(env, "preempt2", preemption_safe=False)
        trainer.train(epochs=1)
        assert signal.getsignal(signal.SIGTERM) is not signal.SIG_DFL
        os.kill(os.getpid(), signal.SIGTERM)
        assert len(calls) == 1  # our handler stayed installed throughout
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_guard_single_process_consensus():
    guard = PreemptionGuard().install()
    try:
        assert guard.consensus() is False
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.signaled is True
        assert guard.consensus() is True
    finally:
        guard.uninstall()
