"""Synthetic dataset fixtures: benchmark feeds and on-disk test datasets.

The reference smoke-tested its ETL on an absent fixture tree (SURVEY.md §4);
we generate equivalents deterministically: random-but-valid action
sequences (correct per-command param validity, end sentinel) and uint8
frames, either in memory (benchmarks) or written through the real sharded
store (end-to-end tests).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import numpy as np

from videocad_tpu.actions.vocab import (
    ACTION_PARAM_MASK,
    END_SENTINEL,
    NUM_COMMANDS,
)
from videocad_tpu.etl.dataset_gen import shard_path


def random_action_sequence(rng: np.random.Generator, length: int,
                           end_sentinel: bool = True) -> np.ndarray:
    """(length, 7) valid action vectors (zero seed row first)."""
    actions = np.full((length, 7), -1, dtype=np.int64)
    actions[0] = 0
    cmds = rng.integers(0, NUM_COMMANDS, size=length - 1)
    for t, cmd in enumerate(cmds, start=1):
        actions[t, 0] = cmd
        for p in range(6):
            if ACTION_PARAM_MASK[cmd][p]:
                actions[t, 1 + p] = rng.integers(0, 1000)
        if cmd == 1:  # repeat count only valid in the key window
            if not (200 <= actions[t, 3] < 250):
                actions[t, 4] = -1
    if end_sentinel:
        actions[-1] = [1, -1, -1, END_SENTINEL, -1, -1, -1]
    return actions


def synthetic_sequence(rng: np.random.Generator, length: int,
                       image_size: int = 224, channels: int = 3
                       ) -> Dict[str, np.ndarray]:
    return {
        "frames": rng.integers(0, 256, size=(length, image_size, image_size,
                                             channels), dtype=np.uint8),
        "actions": random_action_sequence(rng, length),
        "timesteps": np.arange(length, dtype=np.int64),
    }


def write_synthetic_dataset(out_dir: str, num_sequences: int = 8,
                            min_len: int = 6, max_len: int = 12,
                            image_size: int = 32, seed: int = 0,
                            split_path: Optional[str] = None,
                            val_fraction: float = 0.25) -> Dict[str, str]:
    """Write a tiny sharded dataset + split json; returns {id: split}."""
    rng = np.random.default_rng(seed)
    split_map = {}
    for i in range(num_sequences):
        file_id = f"{i:08d}"
        length = int(rng.integers(min_len, max_len + 1))
        data = synthetic_sequence(rng, length, image_size)
        with open(shard_path(out_dir, file_id, "pkl", "data"), "wb") as f:
            pickle.dump(data, f)
        # CAD target image (+ two extra views for random-view augmentation)
        for view in range(2):
            png = data["frames"][0] if view == 0 else data["frames"][-1]
            _write_png(shard_path(out_dir, file_id, "png", str(view)), png)
        n_train = int(num_sequences * (1 - 2 * val_fraction)) or 1
        n_val = int(num_sequences * val_fraction) or 1
        split = ("train" if i < n_train else
                 "val" if i < n_train + n_val else "test")
        split_map[file_id] = split
    if split_path:
        import json
        with open(split_path, "w") as f:
            json.dump(split_map, f)
    return split_map


def _write_png(path: str, array: np.ndarray):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(array).save(path)


def synthetic_batch_feed(batch_size: int, seq_len: int, image_size: int = 224,
                         channels: int = 3, seed: int = 0) -> Dict[str, np.ndarray]:
    """One in-memory uint8 batch shaped like the real pipeline's output."""
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(batch_size, seq_len, image_size,
                                        image_size, channels), dtype=np.uint8)
    actions = np.stack([random_action_sequence(rng, seq_len)
                        for _ in range(batch_size)])
    return {
        "frames": frames,
        "actions": actions.astype(np.float32),
        "cad_image": rng.integers(0, 256, size=(batch_size, image_size,
                                                image_size, channels),
                                  dtype=np.uint8),
        "timesteps": np.tile(np.arange(seq_len)[None], (batch_size, 1)),
    }
