"""EfficientNet-B0 vision encoder (Flax linen).

Closes the last reference backbone variant (reference:
src/Model/fusion.py:118-119 — torchvision ``efficientnet_b0``): the
standard B0 stack of MBConv blocks (expand -> depthwise -> squeeze-excite
-> project, residual when shapes match), NHWC, GroupNorm in place of
BatchNorm (stateless — the same TPU-first choice as models/resnet.py).
Output contract matches SwinEncoder/ResNetEncoder: dict(patches
(B, H*W, 1280), global (B, 1280)) so the fusion stack stays
backbone-agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

# (expand_ratio, channels, num_blocks, stride, kernel) — the B0 stage table
_B0_STAGES: Tuple[Tuple[int, int, int, int, int], ...] = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


@dataclass(frozen=True)
class EfficientNetConfig:
    stem_channels: int = 32
    head_channels: int = 1280
    se_ratio: float = 0.25
    stages: Tuple[Tuple[int, int, int, int, int], ...] = _B0_STAGES

    @staticmethod
    def b0(**kw) -> "EfficientNetConfig":
        return EfficientNetConfig(**kw)

    @property
    def num_features(self) -> int:
        return self.head_channels


def _gn(name: str, dtype) -> nn.GroupNorm:
    # all B0 channel counts are multiples of 8
    return nn.GroupNorm(num_groups=8, dtype=dtype, name=name)


class MBConv(nn.Module):
    """Mobile inverted bottleneck with squeeze-excitation."""

    out_channels: int
    expand_ratio: int
    strides: int
    kernel: int
    se_ratio: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C_in = x.shape[-1]
        C_mid = C_in * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(C_mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand")(y)
            y = nn.silu(_gn("expand_norm", self.dtype)(y))
        y = nn.Conv(
            C_mid, (self.kernel, self.kernel),
            strides=(self.strides, self.strides), padding="SAME",
            feature_group_count=C_mid, use_bias=False, dtype=self.dtype,
            name="depthwise",
        )(y)
        y = nn.silu(_gn("dw_norm", self.dtype)(y))
        # squeeze-excite over the PRE-expansion width (standard EfficientNet)
        se_dim = max(1, int(C_in * self.se_ratio))
        s = y.mean(axis=(1, 2))  # (B, C_mid)
        s = nn.silu(nn.Dense(se_dim, dtype=self.dtype, name="se_reduce")(s))
        s = nn.sigmoid(nn.Dense(C_mid, dtype=self.dtype, name="se_expand")(s))
        y = y * s[:, None, None, :]
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="project")(y)
        y = _gn("project_norm", self.dtype)(y)
        if self.strides == 1 and C_in == self.out_channels:
            y = x + y
        return y


class EfficientNetEncoder(nn.Module):
    config: EfficientNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        y = nn.Conv(cfg.stem_channels, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        y = nn.silu(_gn("stem_norm", self.dtype)(y))
        for s, (expand, ch, n_blocks, stride, kernel) in enumerate(cfg.stages):
            for b in range(n_blocks):
                y = MBConv(
                    out_channels=ch, expand_ratio=expand,
                    strides=stride if b == 0 else 1, kernel=kernel,
                    se_ratio=cfg.se_ratio, dtype=self.dtype,
                    name=f"stage{s}_block{b}",
                )(y)
        y = nn.Conv(cfg.head_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="head")(y)
        y = nn.silu(_gn("head_norm", self.dtype)(y))
        B, H, W, C = y.shape
        patches = y.reshape(B, H * W, C)
        return {"patches": patches, "global": patches.mean(axis=1)}
