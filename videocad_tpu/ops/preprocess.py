"""On-device image preprocessing: uint8 RGB/BGR -> normalized grayscale,
with an optional fused bilinear-resize stage.

The reference preprocesses on the host per frame (PIL Resize(224) +
Grayscale + ToTensor + Normalize(0.5, 0.5) inside DataLoader workers —
/root/reference/main.py:103-108, data_loader.py:441-447, and
cv2.resize for CAD images, data_loader.py:471-476). TPU-native, the host
ships raw uint8 (3 bytes/px instead of 4+ for f32) and the conversion runs
on device, fused into the training step: out = (gray/255 - 0.5)/0.5,
optionally resized to the model's input size first.

Implementations:
  * ``grayscale_normalize`` — pure jnp; XLA fuses it into the consumer.
    Resize lowers to two small matmuls (MXU work, not gathers).
  * ``grayscale_normalize_pallas`` — a Pallas kernel doing the whole
    u8 -> gray -> resize -> normalize pipeline in one VMEM pass (the
    BASELINE.json north-star fused decode->resize->grayscale->normalize
    stage, minus host-side PNG decode).
  * ``normalize_only`` — u8 -> f32 in [-1, 1] keeping channels (the GenCAD
    CAD branch: Normalize(0.5,0.5,0.5) on a 3-channel edge image,
    /root/reference/data_loader/data_loader.py:455-469).

Bilinear resize uses half-pixel centers (cv2.INTER_LINEAR / PIL.BILINEAR
convention) expressed as two dense (out, in) weight matrices: grayscale and
resize are both linear, so gray-then-resize == resize-then-gray exactly
(up to the reference's uint8 rounding between stages, < 1/255 per pixel).

Channel-order note: the reference stores frames BGR (cv2) but converts with
PIL as if RGB, i.e. it applies PIL's (0.299, 0.587, 0.114) weights
POSITIONALLY to the stored B,G,R channels — gray = 0.299*B + 0.587*G +
0.114*R (quirk; /root/reference/main.py:103-108 over cv2-extracted frames).
``bgr_as_rgb=True`` declares the input as BGR-stored-but-treated-as-RGB and
reproduces exactly that: the plain tuple on the stored order, no reversal.
CAD images in this repo load as genuine RGB (data/dataset.py read_image),
where the same positional tuple is the CORRECT luma — so both paths use
identical weights and the flag documents intent rather than changing math.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ITU-R 601-2 luma weights.
_RGB_WEIGHTS = (0.299, 0.587, 0.114)


def _weights(channels: int, bgr_as_rgb: bool) -> np.ndarray:
    """Host-side constant (a jnp array would become a tracer under jit)."""
    if channels == 1:
        return np.ones((1,), np.float32)
    # bgr_as_rgb applies the RGB tuple positionally to BGR data — which is
    # the reference's PIL-on-cv2-frames behavior, NOT a channel reversal
    # (ADVICE r1: a reversed tuple computed the *correct* luma and broke
    # frame-preprocessing parity for converted reference checkpoints).
    del bgr_as_rgb
    return np.asarray(_RGB_WEIGHTS, np.float32)


@functools.lru_cache(maxsize=32)
def _resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) bilinear interpolation matrix, half-pixel centers
    (cv2.INTER_LINEAR / PIL convention), edges clamped."""
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    lo = np.floor(src).astype(np.int64)
    frac = src - lo
    hi = np.clip(lo + 1, 0, in_size - 1)
    lo = np.clip(lo, 0, in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo), (1.0 - frac).astype(np.float32))
    np.add.at(mat, (rows, hi), frac.astype(np.float32))
    return mat


def _resize_2d(gray: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of (..., H, W) via two matmuls (MXU-friendly)."""
    h, w = gray.shape[-2:]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return gray
    rh = jnp.asarray(_resize_matrix(h, oh))
    rw = jnp.asarray(_resize_matrix(w, ow))
    out = jnp.einsum("oh,...hw->...ow", rh, gray)
    return jnp.einsum("pw,...ow->...op", rw, out)


def grayscale_normalize(images: jnp.ndarray, bgr_as_rgb: bool = False,
                        target_size: Optional[Tuple[int, int]] = None
                        ) -> jnp.ndarray:
    """uint8 (..., H, W, C) -> float32 (..., H', W', 1) in [-1, 1].

    ``target_size=(H', W')`` adds the bilinear resize stage; None keeps the
    input resolution.
    """
    channels = images.shape[-1]
    w = _weights(channels, bgr_as_rgb)
    # Channel-unrolled weighted sum, NOT a tensordot: a reduce over the
    # C=3 minor dim roots its own XLA fusion on TPU, so the full-frame
    # f32 gray tensor materializes in HBM between that fusion and the
    # normalize/bf16-cast epilogue (r5 trace, flagship shape: 0.93 ms
    # multiply_reduce writing f32[8,191,224,224] + 0.77 ms add_convert
    # re-reading it). Plain mul/adds keep the whole u8 -> gray ->
    # normalize -> consumer-cast chain in one loop fusion.
    gray = None
    for c in range(channels):
        term = images[..., c].astype(jnp.float32) * float(w[c])
        gray = term if gray is None else gray + term
    if target_size is not None:
        gray = _resize_2d(gray, tuple(target_size))
    return (gray / 127.5 - 1.0)[..., None]


def normalize_only(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 (..., H, W, C) -> float32 same shape in [-1, 1] (all channels).

    The GenCAD CAD-image normalization: Normalize(mean=0.5 x3, std=0.5 x3)
    on the 3-channel Canny edge image (reference data_loader.py:455-469);
    the Canny/resize/crop stages run host-side in data/dataset.py.
    """
    return images.astype(jnp.float32) / 127.5 - 1.0


def maybe_preprocess(images: jnp.ndarray, bgr_as_rgb: bool = False,
                     impl: str = "xla",
                     target_size: Optional[Tuple[int, int]] = None,
                     mode: str = "grayscale") -> jnp.ndarray:
    """Preprocess when the input is uint8; pass floats through unchanged.

    Lets the same model code consume either raw-uint8 pipeline batches or
    already-normalized float tensors (tests, parity harnesses).
    """
    if images.dtype != jnp.uint8:
        return images
    if mode == "normalize_only":
        return normalize_only(images)
    if target_size is not None and images.shape[-3:-1] == tuple(target_size):
        target_size = None
    if impl == "pallas":
        return grayscale_normalize_pallas(images, bgr_as_rgb, target_size)
    return grayscale_normalize(images, bgr_as_rgb, target_size)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _gray_kernel(img_ref, out_ref, *, w0, w1, w2):
    """One row-tile: u8 (1, TILE, W, C) -> f32 (1, TILE, W, 1).

    Luma weights are trace-time constants (baked into the kernel), so the
    whole op is a single VPU multiply-add chain over one VMEM slab.
    """
    # Mosaic has no unsigned->float lowering; hop through int32 (exact
    # for the 0..255 byte range). Caught on real TPU r3 — interpret mode
    # accepts the direct cast, the hardware lowering does not.
    x = img_ref[0].astype(jnp.int32).astype(jnp.float32)
    gray = x[:, :, 0] * w0 + x[:, :, 1] * w1 + x[:, :, 2] * w2
    out_ref[0] = (gray / 127.5 - 1.0)[:, :, None]


def _gray_resize_kernel(img_ref, rh_ref, rw_ref, out_ref, *, w0, w1, w2):
    """One image: u8 (1, H, W, C) -> f32 (1, OH, OW, 1).

    Grayscale on the VPU, then the bilinear resize as two MXU dots with the
    precomputed (OH, H) / (OW, W) interpolation matrices — the fused
    decode->resize->grayscale->normalize north star in one VMEM pass.
    """
    x = img_ref[0].astype(jnp.int32).astype(jnp.float32)  # no u8->f32 in Mosaic
    gray = x[:, :, 0] * w0 + x[:, :, 1] * w1 + x[:, :, 2] * w2  # (H, W)
    rows = jax.lax.dot_general(
        rh_ref[:], gray, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                     # (OH, W)
    out = jax.lax.dot_general(
        rows, rw_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                     # (OH, OW)
    out_ref[0] = (out / 127.5 - 1.0)[:, :, None]


@functools.partial(jax.jit, static_argnames=("bgr_as_rgb", "target_size"))
def grayscale_normalize_pallas(images: jnp.ndarray, bgr_as_rgb: bool = False,
                               target_size: Optional[Tuple[int, int]] = None
                               ) -> jnp.ndarray:
    """Fused u8->gray[->resize]->normalize Pallas kernel (3-channel inputs).

    Without resize: grid over flattened leading dims x row tiles. With
    resize: grid over flattened leading dims, one image per program (the
    resize couples all rows). Falls back to the jnp path for 1-channel
    input (nothing to fuse).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if images.shape[-1] != 3:
        return grayscale_normalize(images, bgr_as_rgb, target_size)

    interpret = jax.default_backend() != "tpu"
    lead = images.shape[:-3]
    h, w_dim, c = images.shape[-3:]
    flat = images.reshape((-1, h, w_dim, c))
    n = flat.shape[0]
    w = tuple(float(x) for x in _weights(3, bgr_as_rgb))

    if target_size is not None and tuple(target_size) != (h, w_dim):
        if not interpret:
            # The fused resize variant crashes this environment's remote
            # Mosaic toolchain (tpu_compile_helper exit 1; r3, plain
            # variant compiles and is bit-exact). Until the toolchain
            # accepts it, real-TPU resize preprocessing stays on the XLA
            # path; the kernel remains exercised in interpret mode
            # (tests/test_resize_gencad.py).
            return grayscale_normalize(images, bgr_as_rgb, target_size)
        oh, ow = target_size
        rh = jnp.asarray(_resize_matrix(h, oh))
        rw = jnp.asarray(_resize_matrix(w_dim, ow))
        out = pl.pallas_call(
            functools.partial(_gray_resize_kernel, w0=w[0], w1=w[1], w2=w[2]),
            out_shape=jax.ShapeDtypeStruct((n, oh, ow, 1), jnp.float32),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, h, w_dim, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((oh, h), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ow, w_dim), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, oh, ow, 1), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(flat, rh, rw)
        return out.reshape(lead + (oh, ow, 1))

    tile_rows = 8 if h % 8 == 0 else h
    grid = (n, h // tile_rows)
    out = pl.pallas_call(
        functools.partial(_gray_kernel, w0=w[0], w1=w[1], w2=w[2]),
        out_shape=jax.ShapeDtypeStruct((n, h, w_dim, 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_rows, w_dim, c),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_rows, w_dim, 1),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )(flat)
    return out.reshape(lead + (h, w_dim, 1))
