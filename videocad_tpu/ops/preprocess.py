"""On-device image preprocessing: uint8 RGB/BGR -> normalized grayscale.

The reference preprocesses on the host per frame (PIL Grayscale + ToTensor +
Normalize(0.5, 0.5) inside DataLoader workers — /root/reference/main.py:
103-108, data_loader.py:441-447). TPU-native, the host ships raw uint8
(3 bytes/px instead of 4+ for f32) and the conversion runs on device, fused
into the training step: out = (gray/255 - 0.5)/0.5.

Two implementations:
  * ``grayscale_normalize`` — pure jnp; XLA fuses it into the consumer.
  * ``grayscale_normalize_pallas`` — a Pallas VPU kernel doing the whole
    u8 -> f32 pipeline in one VMEM pass (the BASELINE.json north-star fused
    decode->normalize stage), tiled over rows.

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

import jax
import jax.numpy as jnp

# ITU-R 601-2 luma weights.
_RGB_WEIGHTS = (0.299, 0.587, 0.114)


def _weights(channels: int, bgr_as_rgb: bool) -> jnp.ndarray:
    if channels == 1:
        return jnp.ones((1,), jnp.float32)
    # bgr_as_rgb applies the RGB tuple positionally to BGR data — which is
    # the reference's PIL-on-cv2-frames behavior, NOT a channel reversal
    # (ADVICE r1: a reversed tuple computed the *correct* luma and broke
    # frame-preprocessing parity for converted reference checkpoints).
    del bgr_as_rgb
    return jnp.asarray(_RGB_WEIGHTS, jnp.float32)


def grayscale_normalize(images: jnp.ndarray, bgr_as_rgb: bool = False
                        ) -> jnp.ndarray:
    """uint8 (..., H, W, C) -> float32 (..., H, W, 1) in [-1, 1]."""
    channels = images.shape[-1]
    w = _weights(channels, bgr_as_rgb)
    x = images.astype(jnp.float32)
    gray = jnp.tensordot(x, w, axes=[[-1], [0]])[..., None]
    if channels == 1:
        pass  # already single channel; weights are identity
    return gray / 127.5 - 1.0


def maybe_preprocess(images: jnp.ndarray, bgr_as_rgb: bool = False,
                     impl: str = "xla") -> jnp.ndarray:
    """Preprocess when the input is uint8; pass floats through unchanged.

    Lets the same model code consume either raw-uint8 pipeline batches or
    already-normalized float tensors (tests, parity harnesses).
    """
    if images.dtype != jnp.uint8:
        return images
    if impl == "pallas":
        return grayscale_normalize_pallas(images, bgr_as_rgb)
    return grayscale_normalize(images, bgr_as_rgb)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _gray_kernel(img_ref, out_ref, *, w0, w1, w2):
    """One row-tile: u8 (1, TILE, W, C) -> f32 (1, TILE, W, 1).

    Luma weights are trace-time constants (baked into the kernel), so the
    whole op is a single VPU multiply-add chain over one VMEM slab.
    """
    x = img_ref[0].astype(jnp.float32)
    gray = x[:, :, 0] * w0 + x[:, :, 1] * w1 + x[:, :, 2] * w2
    out_ref[0] = (gray / 127.5 - 1.0)[:, :, None]


@functools.partial(jax.jit, static_argnames=("bgr_as_rgb",))
def grayscale_normalize_pallas(images: jnp.ndarray, bgr_as_rgb: bool = False
                               ) -> jnp.ndarray:
    """Fused u8->gray->normalize Pallas kernel (3-channel inputs).

    Grid over flattened leading dims x row tiles; each program converts a
    (TILE_ROWS, W, 3) slab in VMEM. Falls back to the jnp path for 1-channel
    input (nothing to fuse).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if images.shape[-1] != 3:
        return grayscale_normalize(images, bgr_as_rgb)

    lead = images.shape[:-3]
    h, w_dim, c = images.shape[-3:]
    flat = images.reshape((-1, h, w_dim, c))
    n = flat.shape[0]

    tile_rows = 8 if h % 8 == 0 else h
    grid = (n, h // tile_rows)
    w = tuple(float(x) for x in _weights(3, bgr_as_rgb))

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
