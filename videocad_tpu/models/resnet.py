"""ResNet-18 encoder with GroupNorm.

The reference's 'resnet' encoder is torchvision resnet18 with every
BatchNorm converted to GroupNorm(min(32, C)) and the classification head
stripped (/root/reference/model/trajectory_model.py:9-16, 68-72), yielding a
512-d embedding. GroupNorm (not BatchNorm) also suits SPMD training: no
cross-device batch statistics to synchronize.

``in_channels`` is configurable (default 1 for grayscale UI frames); the
reference keeps the 3-channel ImageNet stem, which cannot consume its own
grayscale frame tensors — a latent bug we fix rather than reproduce.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # epsilon 1e-5 = torch GroupNorm default (the reference's
        # convert_bn_to_gn); flax defaults to 1e-6.
        gn = lambda name, c: nn.GroupNorm(  # noqa: E731
            num_groups=min(32, c), epsilon=1e-5, dtype=self.dtype,
            name=name)
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(gn("gn1", self.features)(y))
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = gn("gn2", self.features)(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(residual)
            residual = gn("downsample_gn", self.features)(residual)
        return nn.relu(y + residual)


class ResNet18GN(nn.Module):
    """(B, H, W, C) -> (B, 512) embedding."""

    dtype: jnp.dtype = jnp.float32
    stage_sizes: tuple = (2, 2, 2, 2)
    widths: tuple = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                         name="stem_gn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (blocks, width) in enumerate(zip(self.stage_sizes, self.widths)):
            for block in range(blocks):
                stride = 2 if stage > 0 and block == 0 else 1
                x = BasicBlock(width, stride, dtype=self.dtype,
                               name=f"stage{stage}_block{block}")(x)
        return jnp.mean(x, axis=(1, 2))
