"""Native C++ loader: build, write/read round-trip, batch parity with the
Python pipeline."""

import os

import numpy as np
import pytest

from videocad_tpu.data.native import (
    NativePipeline,
    build_library,
    convert_store_to_vcb,
    scan_vcb,
    write_vcb,
)
from videocad_tpu.data import DataPipeline, VideoCADDataset
from videocad_tpu.data.synthetic import write_synthetic_dataset


@pytest.fixture(scope="module")
def vcb_store(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    store = os.path.join(root, "pickles")
    write_synthetic_dataset(store, num_sequences=6, min_len=4, max_len=8,
                            image_size=16, seed=3,
                            split_path=os.path.join(store,
                                                    "dataset_split.json"))
    vcb_dir = os.path.join(root, "vcb")
    n = convert_store_to_vcb(store, vcb_dir)
    assert n == 6
    return store, vcb_dir


def test_build_library():
    assert os.path.exists(build_library())


def test_vcb_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(5, 8, 8, 3), dtype=np.uint8)
    cad = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    actions = rng.integers(-1, 1000, size=(5, 7)).astype(np.int32)
    path = str(tmp_path / "seq.vcb")
    write_vcb(path, cad, frames, actions)

    pipe = NativePipeline([path], batch_size=1, bucket_len=8,
                          image_shape=(8, 8, 3), shuffle=False)
    batch = next(iter(pipe.epoch(0)))
    np.testing.assert_array_equal(batch["frames"][0, :5], frames)
    np.testing.assert_array_equal(batch["cad_image"][0], cad)
    np.testing.assert_array_equal(batch["actions"][0, :5],
                                  actions.astype(np.float32))
    # padding semantics: frames 0, actions -1
    assert (batch["frames"][0, 5:] == 0).all()
    assert (batch["actions"][0, 5:] == -1).all()


def test_native_pipeline_matches_python_pipeline(vcb_store):
    store, vcb_dir = vcb_store
    py_ds = VideoCADDataset(store)
    py_pipe = DataPipeline(py_ds, batch_size=2, buckets=(8,), shuffle=False,
                           seed=0)
    native = NativePipeline(scan_vcb(vcb_dir), batch_size=2, bucket_len=8,
                            image_shape=(16, 16, 3), shuffle=False)
    assert len(native) == len(py_pipe) == 3
    for py_batch, nat_batch in zip(py_pipe.epoch(0), native.epoch(0)):
        np.testing.assert_array_equal(py_batch["frames"], nat_batch["frames"])
        np.testing.assert_array_equal(py_batch["actions"],
                                      nat_batch["actions"])
        np.testing.assert_array_equal(py_batch["cad_image"],
                                      nat_batch["cad_image"])
        assert py_batch["ids"] == nat_batch["ids"]


@pytest.mark.slow
def test_train_cli_with_native_loader(vcb_store, tmp_path, monkeypatch):
    """End to end: the C++ loader drives a full training run via the CLI."""
    import json
    from tests.helpers import TINY_CONFIG

    store, _ = vcb_store
    split_path = os.path.join(store, "dataset_split.json")
    config_path = str(tmp_path / "cfg.json")
    with open(config_path, "w") as f:
        json.dump({"tiny": dict(TINY_CONFIG, image_size=16, vit_patch=8,
                                image_channels=1)}, f)
    monkeypatch.chdir(tmp_path)
    from videocad_tpu.cli.train import main
    main([
        "--dataset_path", store,
        "--config_path", split_path,
        "--model_config", config_path,
        "--model_name", "tiny",
        "--batch_size", "2",
        "--epochs", "1",
        "--data_parallel", "2",
        "--buckets", "8",
        "--native_loader",
        "--vcb_dir", str(tmp_path / "vcb"),
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--log_dir", str(tmp_path / "logs"),
    ])
    runs = [d for d in os.listdir(tmp_path / "logs") if d.startswith("tiny_")]
    assert runs
    with open(tmp_path / "logs" / runs[0] / "results.json") as f:
        assert json.load(f)["total_predictions"] > 0


def test_native_shuffle_reshuffles_by_epoch(vcb_store):
    _, vcb_dir = vcb_store
    native = NativePipeline(scan_vcb(vcb_dir), batch_size=2, bucket_len=8,
                            image_shape=(16, 16, 3), shuffle=True, seed=7)
    ids0 = [b["ids"] for b in native.epoch(0)]
    ids0_again = [b["ids"] for b in native.epoch(0)]
    ids1 = [b["ids"] for b in native.epoch(1)]
    assert ids0 == ids0_again  # deterministic per epoch
    assert ids0 != ids1        # reshuffled across epochs


def test_host_sharding_disjoint_and_complete(vcb_store):
    """Two hosts consume disjoint slices of the globally shuffled order
    that together cover the dataset (DistributedSampler semantics,
    reference data_loader.py:177-183)."""
    _, vcb_dir = vcb_store
    paths = scan_vcb(vcb_dir)
    seen = {}
    for host in (0, 1):
        pipe = NativePipeline(paths, batch_size=1, bucket_len=8,
                              image_shape=(16, 16, 3), shuffle=True, seed=7,
                              host_id=host, num_hosts=2)
        assert len(pipe) == len(paths) // 2
        seen[host] = {sid for b in pipe.epoch(0) for sid in b["ids"]}
    assert seen[0].isdisjoint(seen[1])
    all_ids = {os.path.basename(p).split("_")[0] for p in paths}
    assert seen[0] | seen[1] == all_ids


def test_corrupt_vcb_rows_counted_and_raise(vcb_store, tmp_path):
    _, vcb_dir = vcb_store
    import shutil
    bad_dir = str(tmp_path / "bad")
    shutil.copytree(vcb_dir, bad_dir)
    paths = scan_vcb(bad_dir)
    # Truncate one file mid-frames: unreadable row.
    with open(paths[0], "r+b") as f:
        f.truncate(64)

    pipe = NativePipeline(paths, batch_size=1, bucket_len=8,
                          image_shape=(16, 16, 3), shuffle=False)
    with pytest.raises(RuntimeError, match="skipped 1 corrupt"):
        for _ in pipe.epoch(0):
            pass
    assert pipe.skipped_rows() == 1

    # With an explicit allowance the epoch completes and reports the count.
    pipe2 = NativePipeline(paths, batch_size=1, bucket_len=8,
                           image_shape=(16, 16, 3), shuffle=False,
                           max_skipped_rows=1)
    n = sum(1 for _ in pipe2.epoch(0))
    assert n == len(paths)
    assert pipe2.skipped_rows() == 1
