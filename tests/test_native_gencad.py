"""Native loader v3: CAD images with their own shape (GenCAD edge images).

Closes the last native-loader capability gap (VERDICT r2 "what's missing"
#2): `use_pretrained_cad_model` configs train off the C++ loader. The Canny
preprocessing (reference data_loader.py:455-469) runs ONCE at .vcb
conversion; version-3 files carry the 256x256x3 edge image at its own shape
next to the frame-shaped payloads, and every mismatch (gencad config over a
non-gencad store and vice versa) fails with one clear sentence.
"""

import json
import os
import struct

import numpy as np
import pytest

from videocad_tpu.data.native import (
    NativePipeline,
    convert_store_to_vcb,
    scan_vcb,
    write_vcb,
)
from videocad_tpu.data.synthetic import write_synthetic_dataset


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_gencad")
    path = os.path.join(root, "pickles")
    write_synthetic_dataset(path, num_sequences=6, min_len=4, max_len=6,
                            image_size=16, seed=7,
                            split_path=os.path.join(path,
                                                    "dataset_split.json"))
    return path


def test_vcb_v3_roundtrip(tmp_path):
    """A CAD image with its own shape round-trips through a version-3 file."""
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(5, 8, 8, 3), dtype=np.uint8)
    cad = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
    actions = rng.integers(-1, 1000, size=(5, 7)).astype(np.int32)
    path = str(tmp_path / "seq.vcb")
    write_vcb(path, cad, frames, actions)
    with open(path, "rb") as f:
        header = struct.unpack("<7I", f.read(28))
    assert header[1] == 3

    pipe = NativePipeline([path], batch_size=1, bucket_len=8,
                          image_shape=(8, 8, 3), cad_shape=(12, 10, 3),
                          shuffle=False)
    batch = next(iter(pipe.epoch(0)))
    assert batch["cad_image"].shape == (1, 12, 10, 3)
    np.testing.assert_array_equal(batch["cad_image"][0], cad)
    np.testing.assert_array_equal(batch["frames"][0, :5], frames)
    np.testing.assert_array_equal(batch["actions"][0, :5],
                                  actions.astype(np.float32))


def test_vcb_v3_with_views_roundtrip(tmp_path):
    """Own-shape CAD composes with the v2 multiview payload."""
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(4, 8, 8, 3), dtype=np.uint8)
    cad = rng.integers(0, 256, size=(12, 12, 3), dtype=np.uint8)
    views = rng.integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    actions = rng.integers(-1, 1000, size=(4, 7)).astype(np.int32)
    path = str(tmp_path / "seq.vcb")
    write_vcb(path, cad, frames, actions, views=views)

    pipe = NativePipeline([path], batch_size=1, bucket_len=8,
                          image_shape=(8, 8, 3), cad_shape=(12, 12, 3),
                          num_views=2, shuffle=False)
    batch = next(iter(pipe.epoch(0)))
    np.testing.assert_array_equal(batch["cad_image"][0], cad)
    np.testing.assert_array_equal(batch["multiview_images"][0], views)


def test_cad_shape_mismatch_counted_corrupt(tmp_path):
    """A v1 file read by an own-cad-shape loader (and a v3 file read by a
    frame-shaped loader) is a counted corrupt row, not a mis-parse."""
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, size=(4, 8, 8, 3), dtype=np.uint8)
    actions = rng.integers(-1, 1000, size=(4, 7)).astype(np.int32)
    v1 = str(tmp_path / "v1.vcb")
    write_vcb(v1, rng.integers(0, 256, (8, 8, 3), dtype=np.uint8),
              frames, actions)
    v3 = str(tmp_path / "v3.vcb")
    write_vcb(v3, rng.integers(0, 256, (12, 12, 3), dtype=np.uint8),
              frames, actions)

    for path, cad_shape in ((v1, (12, 12, 3)), (v3, None)):
        pipe = NativePipeline([path], batch_size=1, bucket_len=8,
                              image_shape=(8, 8, 3), cad_shape=cad_shape,
                              shuffle=False, max_skipped_rows=1)
        batches = list(pipe.epoch(0))
        assert pipe.skipped_rows() == 1, (path, cad_shape)
        assert (batches[0]["actions"] == -1).all()


def test_convert_store_gencad_packs_edge_image(store, tmp_path):
    """Conversion with gencad=True runs the Canny preprocessing once and the
    native pipeline yields exactly the Python gencad dataset's CAD image."""
    from videocad_tpu.data.dataset import VideoCADDataset

    vcb_dir = str(tmp_path / "vcb")
    n = convert_store_to_vcb(store, vcb_dir, gencad=True)
    assert n == 6
    paths = scan_vcb(vcb_dir)
    pipe = NativePipeline(paths, batch_size=2, bucket_len=8,
                          image_shape=(16, 16, 3), cad_shape=(256, 256, 3),
                          shuffle=False)
    ds = VideoCADDataset(store, gencad=True)
    by_id = {ds.sequence_id(i): ds[i]["cad_image"] for i in range(len(ds))}
    seen = 0
    for batch in pipe.epoch(0):
        assert batch["cad_image"].shape[1:] == (256, 256, 3)
        for row, file_id in enumerate(batch["ids"]):
            np.testing.assert_array_equal(batch["cad_image"][row],
                                          by_id[file_id])
            seen += 1
    assert seen == 6


def _stage_train_shards(store, vcb_dir, **convert_kwargs):
    convert_store_to_vcb(store, vcb_dir, **convert_kwargs)
    train_dir = os.path.join(vcb_dir, "train")
    os.makedirs(train_dir, exist_ok=True)
    for p in scan_vcb(vcb_dir):
        if os.path.dirname(p) != train_dir:
            os.rename(p, os.path.join(train_dir, os.path.basename(p)))


def test_cli_guard_gencad_over_plain_store(store, tmp_path):
    """--native_loader + a gencad config over shards converted without
    gencad fails with one sentence naming the fix."""
    import argparse

    from videocad_tpu.cli.train import _build_native_pipelines

    vcb_dir = str(tmp_path / "vcb_plain")
    _stage_train_shards(store, vcb_dir)
    args = argparse.Namespace(
        dataset_path=store, vcb_dir=vcb_dir, batch_size=2, buckets=[8],
        multiview_dir=None)
    with pytest.raises(ValueError, match="re-convert"):
        _build_native_pipelines(args, {"train": None}, gencad=True)


def test_cli_guard_plain_over_gencad_store(store, tmp_path):
    """The reverse mismatch — a non-gencad config over gencad shards —
    fails loudly too (it would otherwise feed edge images as renders)."""
    import argparse

    from videocad_tpu.cli.train import _build_native_pipelines

    vcb_dir = str(tmp_path / "vcb_gencad")
    _stage_train_shards(store, vcb_dir, gencad=True)
    args = argparse.Namespace(
        dataset_path=store, vcb_dir=vcb_dir, batch_size=2, buckets=[8],
        multiview_dir=None)
    with pytest.raises(ValueError, match="use_pretrained_cad_model"):
        _build_native_pipelines(args, {"train": None})


@pytest.mark.slow
def test_train_cli_native_loader_gencad_end_to_end(store, tmp_path,
                                                   monkeypatch):
    """The C++ loader drives a full use_pretrained_cad_model training run
    via the CLI (v3 conversion with Canny preprocessing on first use)."""
    from tests.helpers import TINY_CONFIG

    split_path = os.path.join(store, "dataset_split.json")
    config_path = str(tmp_path / "cfg.json")
    with open(config_path, "w") as f:
        json.dump({"tiny_gencad": dict(TINY_CONFIG, image_size=16,
                                       vit_patch=8, image_channels=1,
                                       use_pretrained_cad_model=True)}, f)
    monkeypatch.chdir(tmp_path)
    from videocad_tpu.cli.train import main
    main([
        "--dataset_path", store,
        "--config_path", split_path,
        "--model_config", config_path,
        "--model_name", "tiny_gencad",
        "--batch_size", "2",
        "--epochs", "1",
        "--data_parallel", "2",
        "--buckets", "8",
        "--native_loader",
        "--vcb_dir", str(tmp_path / "vcb"),
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--log_dir", str(tmp_path / "logs"),
    ])
    runs = [d for d in os.listdir(tmp_path / "logs")
            if d.startswith("tiny_gencad_")]
    assert runs
    with open(tmp_path / "logs" / runs[0] / "results.json") as f:
        assert json.load(f)["total_predictions"] > 0
