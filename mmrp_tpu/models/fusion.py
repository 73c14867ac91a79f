"""Cross-modal fusion modules (Flax linen).

Capability parity with the reference fusion layer (reference:
src/Model/fusion.py:20-35 PreFusionEnhancer, :334-471 CrossModalFusion):

- ``PreFusionEnhancer``: per-modality self-attention with a learned
  positional embedding and a learnable alpha-scaled residual;
- ``CrossModalFusion``: bidirectional cross-attention (text queries over
  image patches and vice versa), producing the fused sequence
  ``[cls, patches..., txt]`` plus the attention maps the explainability
  engine consumes ({txt2img, img2txt}, head-averaged downstream).

The TPU-first differences: everything is batch-static, masks are additive
and precomputed, attention weights are returned from a single softmax
computation (no second forward), and dtype policy is explicit.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    B, L, D = x.shape
    return x.reshape(B, L, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    B, H, L, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, H * d)


class CrossAttention(nn.Module):
    """MHA that also returns head-wise attention weights (for explain)."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        q_in: jnp.ndarray,  # (B, Lq, D)
        kv_in: jnp.ndarray,  # (B, Lk, D)
        kv_mask: Optional[jnp.ndarray] = None,  # (B, Lk) 1=valid
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        D, H = self.dim, self.num_heads
        q = _split_heads(nn.Dense(D, dtype=self.dtype, name="q")(q_in), H)
        k = _split_heads(nn.Dense(D, dtype=self.dtype, name="k")(kv_in), H)
        v = _split_heads(nn.Dense(D, dtype=self.dtype, name="v")(kv_in), H)
        scale = (D // H) ** -0.5
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * scale
        if kv_mask is not None:
            scores = scores + jnp.where(kv_mask, 0.0, -1e9)[:, None, None, :]
        attn = nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)
        out = nn.Dense(D, dtype=self.dtype, name="out")(_merge_heads(out))
        return out, attn


class PreFusionEnhancer(nn.Module):
    """Self-attn + learned positional embedding + alpha-scaled residual
    (reference fusion.py:20-35)."""

    dim: int
    num_heads: int
    max_len: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, self.max_len, self.dim),
            jnp.float32,
        )
        alpha = self.param("alpha", nn.initializers.zeros, (), jnp.float32)
        y = x + pos[:, : x.shape[1], :].astype(x.dtype)
        y = nn.LayerNorm(dtype=self.dtype)(y)
        attn_mask = None
        if mask is not None:
            attn_mask = mask[:, None, None, :].astype(bool)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dropout_rate=self.dropout, dtype=self.dtype
        )(y, y, mask=attn_mask, deterministic=deterministic)
        return x + alpha.astype(x.dtype) * y


class CrossModalFusion(nn.Module):
    """Bidirectional cross-attention fusion.

    Inputs: image patches (B, Np, D), image global (B, D), text tokens
    (B, Lt, D), text mask (B, Lt). Output: fused sequence
    ``[cls, Np patches, txt]`` (B, Np+2, D) + attention dict.
    """

    dim: int
    num_heads: int
    num_patches: int
    max_text_len: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        img_patches: jnp.ndarray,
        img_global: jnp.ndarray,
        txt_tokens: jnp.ndarray,
        txt_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        D = self.dim
        # per-modality enhancement before fusion (fusion.py:408-421)
        txt = PreFusionEnhancer(
            D, self.num_heads, self.max_text_len, self.dropout, self.dtype, name="txt_enh"
        )(txt_tokens, txt_mask, deterministic)
        patches = PreFusionEnhancer(
            D, self.num_heads, self.num_patches, self.dropout, self.dtype, name="img_enh"
        )(img_patches, None, deterministic)

        # text queries attend image patches; patches attend text
        txt_fused, attn_t2i = CrossAttention(
            D, self.num_heads, self.dropout, self.dtype, name="txt2img"
        )(txt, patches, None, deterministic)
        img_fused, attn_i2t = CrossAttention(
            D, self.num_heads, self.dropout, self.dtype, name="img2txt"
        )(patches, txt, txt_mask, deterministic)

        txt = nn.LayerNorm(dtype=self.dtype, name="txt_norm")(txt + txt_fused)
        patches = nn.LayerNorm(dtype=self.dtype, name="img_norm")(patches + img_fused)

        # pooled text respecting the padding mask
        if txt_mask is not None:
            w = txt_mask.astype(patches.dtype)
            txt_pooled = (txt * w[:, :, None]).sum(1) / jnp.maximum(
                w.sum(1, keepdims=True), 1.0
            )
        else:
            txt_pooled = txt.mean(axis=1)

        cls = nn.Dense(D, dtype=self.dtype, name="cls_proj")(
            jnp.concatenate([img_global, txt_pooled], axis=-1)
        )
        seq = jnp.concatenate(
            [cls[:, None, :], patches, txt_pooled[:, None, :]], axis=1
        )  # (B, 1+Np+1, D)
        return seq, {"txt2img": attn_t2i, "img2txt": attn_i2t}
