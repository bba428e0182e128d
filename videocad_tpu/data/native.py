"""ctypes bindings for the native C++ batch loader (native/loader.cpp).

The native loader replaces the reference's DataLoader worker processes
(SURVEY.md §2.2): a C++ thread pool streams packed .vcb sequence files and
assembles padded uint8 batches directly into numpy buffers — no pickle, no
per-frame Python loop, no PIL. ``NativePipeline`` mirrors the
``DataPipeline.epoch()`` API so the Trainer consumes either interchangeably.

The shared library builds on demand with g++ -O3 (no pip/pybind needed).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "loader.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libvcb_loader.so")

_lib = None


def build_library(force: bool = False) -> str:
    """Compile native/loader.cpp into a shared library (cached by mtime).

    The compile lands in a per-PID temp file then renames into place:
    on a multi-host pod every process races to build the same .so on a
    shared filesystem, and a third process must never dlopen a
    half-written file (rename is atomic on POSIX)."""
    if (not force and os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", tmp]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"native loader compile failed ({' '.join(cmd)}):\n"
            f"{proc.stderr}")
    os.replace(tmp, _LIB)
    return _LIB


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(build_library())
    lib.vcb_loader_create.restype = ctypes.c_void_p
    lib.vcb_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.vcb_loader_num_batches.restype = ctypes.c_int
    lib.vcb_loader_num_batches.argtypes = [ctypes.c_void_p]
    lib.vcb_loader_skipped_rows.restype = ctypes.c_longlong
    lib.vcb_loader_skipped_rows.argtypes = [ctypes.c_void_p]
    lib.vcb_loader_start_epoch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint64, ctypes.c_int]
    lib.vcb_loader_next.restype = ctypes.c_int
    lib.vcb_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32)]
    lib.vcb_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.vcb_write.restype = ctypes.c_int
    lib.vcb_write.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return lib


def write_vcb(path: str, cad: np.ndarray, frames: np.ndarray,
              actions: np.ndarray, views: Optional[np.ndarray] = None):
    """Write one sequence as a .vcb file (via the native writer).

    ``views``: optional (V, H, W, C) uint8 multiview renders — written as a
    version-2 file; without views the file is the original version-1 format.
    ``cad`` may have its own (CH, CW, CC) shape distinct from the frames'
    (the GenCAD Canny edge image, 256x256x3 — reference
    data_loader.py:455-469); that writes a version-3 file.
    """
    lib = load_library()
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    cad = np.ascontiguousarray(cad, dtype=np.uint8)
    actions = np.ascontiguousarray(actions, dtype=np.int32)
    t, h, w, c = frames.shape
    if cad.ndim != 3:
        raise ValueError(f"cad must be (H, W, C) uint8; got {cad.shape}")
    if actions.ndim != 2 or actions.shape[0] != t:
        # The native writer fwrites t*act_dim int32s from this pointer —
        # a shorter array would be a heap over-read.
        raise ValueError(f"actions must be (T={t}, act_dim); "
                         f"got {actions.shape}")
    num_views = 0
    views_ptr = ctypes.POINTER(ctypes.c_uint8)()
    if views is not None:
        views = np.ascontiguousarray(views, dtype=np.uint8)
        assert views.shape[1:] == (h, w, c), (views.shape, frames.shape)
        num_views = views.shape[0]
        views_ptr = views.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    ok = lib.vcb_write(
        path.encode(), t, h, w, c, actions.shape[1], num_views,
        cad.shape[0], cad.shape[1], cad.shape[2],
        cad.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        views_ptr,
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        actions.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if not ok:
        raise IOError(f"failed to write {path}")


def convert_store_to_vcb(store_dir: str, out_dir: str,
                         ids: Optional[Sequence[str]] = None,
                         view_ids: Optional[Sequence[str]] = None,
                         multiview_dir: Optional[str] = None,
                         gencad: bool = False,
                         image_size: Optional[int] = None) -> int:
    """Convert a reference pickle store into .vcb shards (one-time ETL).

    With ``view_ids`` the multiview render PNGs (reference
    data_loader.py:417-429) are packed into version-2 files so the native
    loader can serve multiview configs. With ``gencad`` the CAD image is
    preprocessed ONCE here — Canny edges, 3-channel, 256x256 (reference
    data_loader.py:455-469) — and packed at its own shape (version-3
    files), so use_pretrained_cad_model configs train off the C++ loader
    with zero per-batch host Python.
    """
    from videocad_tpu.data.dataset import VideoCADDataset
    from videocad_tpu.etl.dataset_gen import shard_path

    dataset = VideoCADDataset(store_dir, ids=ids, view_ids=view_ids,
                              multiview_dir=multiview_dir, gencad=gencad,
                              image_size=image_size)
    count = 0
    for i in range(len(dataset)):
        item = dataset[i]
        file_id = dataset.sequence_id(i)
        frames = item["frames"]
        h, w, c = frames.shape[1:]
        cad = (item["cad_image"] if gencad
               else _match_channels(item["cad_image"], h, w, c))
        views = item.get("multiview_images")
        if views is not None:
            views = np.stack([_match_channels(v, h, w, c) for v in views])
        path = shard_path(out_dir, file_id, "vcb", "data")
        write_vcb(path, cad, frames, item["actions"].astype(np.int32),
                  views=views)
        count += 1
    return count


def _match_channels(img: np.ndarray, h: int, w: int, c: int) -> np.ndarray:
    """Resize/reshape an image to the frames' (H, W, C) packing shape."""
    from PIL import Image

    if img.shape[:2] != (h, w):
        img = np.asarray(Image.fromarray(img).resize((w, h)))
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] != c:
        img = img[..., :c] if img.shape[-1] > c else np.repeat(img, c, -1)
    return img


def scan_vcb(root: str) -> list:
    files = []
    for dirpath, _dirs, names in os.walk(root):
        files.extend(os.path.join(dirpath, n) for n in names
                     if n.endswith(".vcb"))
    files.sort()
    return files


class NativePipeline:
    """Iterator over padded batches assembled by the C++ loader."""

    def __init__(self, paths: Sequence[str], batch_size: int, bucket_len: int,
                 image_shape=(224, 224, 3), act_dim: int = 7,
                 num_views: int = 0, cad_shape=None, shuffle: bool = True,
                 seed: int = 42, prefetch: int = 2, num_threads: int = 2,
                 host_id: int = 0, num_hosts: int = 1,
                 max_skipped_rows: int = 0):
        """``host_id``/``num_hosts``: per-host sharding of the globally
        shuffled order (the reference DistributedSampler semantics,
        data_loader.py:177-183) — on a pod each process consumes a
        disjoint 1/num_hosts slice, reshuffled every epoch.
        ``num_views``: > 0 reads version-2 .vcb files and yields
        ``multiview_images`` (B, V, H, W, C) uint8.
        ``cad_shape``: the CAD image's own (H, W, C) when it differs from
        the frames' (version-3 stores carrying preprocessed GenCAD edge
        images); None = frame-shaped (v1/v2).
        ``max_skipped_rows``: corrupt/mismatched .vcb rows are padded out
        and counted; more than this many per epoch raises."""
        if not paths:
            raise ValueError("no .vcb files given")
        if batch_size < 1 or bucket_len < 1:
            # batch_size=0 would SIGFPE in the C++ num_batches() division;
            # fail with a traceback instead of killing the process.
            raise ValueError(f"batch_size and bucket_len must be >= 1, got "
                             f"{batch_size}, {bucket_len}")
        if not 0 <= host_id < num_hosts:
            raise ValueError(
                f"host_id {host_id} out of range [0, {num_hosts}): a "
                "misconfigured multi-host launch would duplicate shards")
        self.lib = load_library()
        self.paths = list(paths)
        self.batch_size = batch_size
        self.bucket_len = bucket_len
        self.h, self.w, self.c = image_shape
        self.cad_shape = tuple(cad_shape) if cad_shape else image_shape
        self.act_dim = act_dim
        self.num_views = num_views
        self.shuffle = shuffle
        self.seed = seed
        self.max_skipped_rows = max_skipped_rows
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        self._handle = self.lib.vcb_loader_create(
            arr, len(self.paths), batch_size, bucket_len,
            self.h, self.w, self.c, act_dim, num_views,
            self.cad_shape[0], self.cad_shape[1], self.cad_shape[2],
            prefetch, num_threads, host_id, num_hosts)
        if not self._handle:
            raise ValueError("vcb_loader_create failed (see stderr)")

    def __len__(self) -> int:
        return self.lib.vcb_loader_num_batches(self._handle)

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        self.lib.vcb_loader_start_epoch(self._handle, epoch, self.seed,
                                        int(self.shuffle))
        b, l, v = self.batch_size, self.bucket_len, self.num_views
        if v == 0 and not hasattr(self, "_dummy_views"):
            # next() never writes the views pointer when num_views == 0;
            # one persistent dummy avoids ~MBs of np.empty churn per batch.
            self._dummy_views = np.empty((b, 1, self.h, self.w, self.c),
                                         np.uint8)
        while True:
            frames = np.empty((b, l, self.h, self.w, self.c), np.uint8)
            actions = np.empty((b, l, self.act_dim), np.float32)
            cad = np.empty((b,) + self.cad_shape, np.uint8)
            views = (np.empty((b, v, self.h, self.w, self.c), np.uint8)
                     if v > 0 else self._dummy_views)
            indices = np.empty((b,), np.int32)
            ok = self.lib.vcb_loader_next(
                self._handle,
                frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                actions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                cad.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                views.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            if not ok:
                skipped = self.skipped_rows()
                if skipped > self.max_skipped_rows:
                    raise RuntimeError(
                        f"native loader skipped {skipped} corrupt/"
                        f"shape-mismatched .vcb rows this epoch "
                        f"(max_skipped_rows={self.max_skipped_rows}); "
                        f"see stderr for the offending paths")
                return
            batch = {
                "frames": frames,
                "actions": actions,
                "cad_image": cad,
                "timesteps": np.tile(np.arange(l)[None], (b, 1)),
                "ids": [os.path.basename(self.paths[i]).split("_")[0]
                        for i in indices],
            }
            if v > 0:
                batch["multiview_images"] = views
            yield batch

    def skipped_rows(self) -> int:
        """Corrupt/mismatched rows padded out so far this epoch."""
        return int(self.lib.vcb_loader_skipped_rows(self._handle))

    def __del__(self):
        if getattr(self, "_handle", None):
            self.lib.vcb_loader_destroy(self._handle)
            self._handle = None
