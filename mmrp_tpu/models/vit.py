"""ViT vision encoder (plain pre-LN ViT) in Flax linen.

Extra backbone family beyond the reference's set. (Note: the reference's
"medclip" backbone is NOT a plain ViT — MedCLIP's vision tower is a Swin
plus projection head; see models/medclip.py for the faithful port target,
reference src/Model/fusion.py:131-171.) Output contract matches the other
encoders: dict(patches (B, Np, F), global (B, F)); ``global`` is the CLS
token, mirroring CLIP-style pooling.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mmrp_tpu.models.layers import Mlp


@dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 16
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    dropout: float = 0.0

    @staticmethod
    def small(**kw) -> "ViTConfig":
        d = dict(hidden_dim=192, num_layers=4, num_heads=3, mlp_dim=768)
        d.update(kw)
        return ViTConfig(**d)


class ViTBlock(nn.Module):
    config: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, dropout_rate=cfg.dropout, dtype=self.dtype
        )(y, y, deterministic=deterministic)
        x = x + y
        y = Mlp(cfg.mlp_dim, dropout=cfg.dropout, dtype=self.dtype)(
            nn.LayerNorm(dtype=self.dtype)(x), deterministic
        )
        return x + y


class ViTEncoder(nn.Module):
    config: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        B = x.shape[0]
        y = nn.Conv(
            cfg.hidden_dim,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        y = y.reshape(B, -1, cfg.hidden_dim)
        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, cfg.hidden_dim), jnp.float32,
        )
        y = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(y.dtype), (B, 1, cfg.hidden_dim)), y], axis=1
        )
        pos = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, y.shape[1], cfg.hidden_dim), jnp.float32,
        )
        y = y + pos.astype(y.dtype)
        for i in range(cfg.num_layers):
            y = ViTBlock(cfg, dtype=self.dtype, name=f"block{i}")(y, deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        return {"patches": y[:, 1:, :], "global": y[:, 0, :]}
