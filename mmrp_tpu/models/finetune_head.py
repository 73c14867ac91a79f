"""Label-aware Swin finetuning head.

Parity with the reference SwinModelForFinetune (reference:
src/Model/SwinModelForFinetune.py:55-125): a small image enhancer
(global-attention + windowed block, model.py:13-59), ``num_classes``
learnable label queries cross-attending the patch sequence, each query's
output concatenated with the global feature and passed through a fusion
MLP to produce that label's logit.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from mmrp_tpu.models.layers import Mlp, SelfAttentionBlock
from mmrp_tpu.models.swin import SwinConfig, SwinEncoder


class LabelQueryHead(nn.Module):
    """Label queries x patches cross-attention -> per-label logits."""

    num_classes: int
    dim: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patches, global_feat, deterministic: bool = True):
        B = patches.shape[0]
        queries = self.param(
            "label_queries",
            nn.initializers.truncated_normal(0.02),
            (1, self.num_classes, self.dim),
            jnp.float32,
        )
        q = jnp.broadcast_to(queries.astype(patches.dtype), (B, self.num_classes, self.dim))
        attended = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="label_cross_attn"
        )(q, patches, deterministic=deterministic)  # (B, C, D)
        g = jnp.broadcast_to(global_feat[:, None, :], attended.shape)
        fused = jnp.concatenate([attended, g], axis=-1)  # (B, C, 2D)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fuse_in")(fused)
        h = nn.gelu(h)
        logits = nn.Dense(1, dtype=jnp.float32, name="fuse_out")(h)[..., 0]
        return logits  # (B, C)


class SwinForFinetune(nn.Module):
    """Swin backbone + enhancer + label-query classifier."""

    swin: SwinConfig
    num_classes: int = 43
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        feats = SwinEncoder(self.swin, dtype=self.dtype, name="swin")(
            image, deterministic
        )
        patches = feats["patches"]
        # image enhancer: one global self-attention block over patches
        patches = SelfAttentionBlock(
            num_heads=self.num_heads, dtype=self.dtype, name="enhancer"
        )(patches, deterministic=deterministic)
        global_feat = patches.mean(axis=1)
        logits = LabelQueryHead(
            num_classes=self.num_classes,
            dim=patches.shape[-1],
            num_heads=self.num_heads,
            dtype=self.dtype,
            name="label_head",
        )(patches, global_feat, deterministic)
        return {"logits": logits, "patches": patches, "global": global_feat}
