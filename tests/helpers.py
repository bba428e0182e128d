"""Shared test fixtures: tiny model configs and synthetic batches."""

import numpy as np

TINY_CONFIG = dict(
    hidden_size=32,
    num_decoder_layers=2,
    dim_feedforward=32,
    nhead=2,
    dropout=0.0,
    encoder="vit",
    enable_past_actions=True,
    enable_past_states=True,
    enable_timestep_embedding=True,
    window_size=3,
    image_size=32,
    vit_patch=16,
    vit_dim=16,
    vit_depth=1,
    vit_heads=2,
    vit_head_dim=8,
    vit_mlp_dim=16,
)


def synthetic_batch(rng: np.random.Generator, batch=2, seq_len=8,
                    image_size=32, channels=1, num_views=0, pad_tail=0):
    """A random batch in the framework's NHWC batch contract."""
    frames = rng.random((batch, seq_len, image_size, image_size, channels),
                        dtype=np.float32)
    actions = np.stack(
        [rng.integers(0, 5, size=(batch, seq_len))]
        + [rng.integers(-1, 1000, size=(batch, seq_len)) for _ in range(6)],
        axis=-1,
    ).astype(np.float32)
    if pad_tail:
        frames[:, -pad_tail:] = -1.0
        actions[:, -pad_tail:] = -1.0
    batch_dict = {
        "frames": frames,
        "actions": actions,
        "cad_image": rng.random((batch, image_size, image_size, channels),
                                dtype=np.float32),
        "timesteps": np.tile(np.arange(seq_len)[None], (batch, 1)),
    }
    if num_views:
        batch_dict["multiview_images"] = rng.random(
            (batch, num_views, image_size, image_size, channels),
            dtype=np.float32)
    return batch_dict
