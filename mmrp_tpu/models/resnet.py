"""ResNet vision encoder (Flax linen).

The reference offers torchvision resnet50 / efficientnet_b0 as alternative
image backbones (reference: src/Model/fusion.py:37-130). This is the
framework's ResNet family — bottleneck-v1.5 (stride on the 3x3), NHWC,
GroupNorm in place of BatchNorm (stateless, the standard JAX/TPU choice) — whose
``forward`` contract matches SwinEncoder: dict(patches (B, 49, F),
global (B, F)) so the fusion stack is backbone-agnostic (the 7x7 final
feature map flattens to 49 "patches").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class ResNetConfig:
    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)  # resnet50
    width: int = 64

    @staticmethod
    def resnet50(**kw) -> "ResNetConfig":
        return ResNetConfig(stage_sizes=(3, 4, 6, 3), **kw)

    @staticmethod
    def resnet18_like(**kw) -> "ResNetConfig":
        return ResNetConfig(stage_sizes=(1, 1, 1, 1), **kw)

    @property
    def num_features(self) -> int:
        return self.width * 8 * 4  # 2048 for resnet50


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # train kept for API symmetry
        # GroupNorm instead of BatchNorm: stateless (no batch_stats
        # collection), batch-size independent, the standard JAX/TPU choice
        norm = lambda name: nn.GroupNorm(num_groups=32, dtype=self.dtype, name=name)
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.filters, (3, 3), strides=(self.strides, self.strides),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = norm("bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="down")(x)
            residual = norm("bn_down")(residual)
        return nn.relu(residual + y)


class ResNetEncoder(nn.Module):
    config: ResNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        train = not deterministic
        y = nn.Conv(self.config.width, (7, 7), strides=(2, 2), use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        y = nn.relu(nn.GroupNorm(num_groups=32, dtype=self.dtype, name="stem_bn")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")
        for stage, n_blocks in enumerate(self.config.stage_sizes):
            for b in range(n_blocks):
                strides = 2 if stage > 0 and b == 0 else 1
                y = Bottleneck(
                    self.config.width * (2**stage), strides, self.dtype,
                    name=f"stage{stage}_block{b}",
                )(y, train)
        B, H, W, C = y.shape
        patches = y.reshape(B, H * W, C)
        return {"patches": patches, "global": patches.mean(axis=1)}
