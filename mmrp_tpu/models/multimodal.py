"""MultiModalRetrievalModel — the hub of the framework.

Capability parity with the reference hub module (reference:
src/Model/model.py:109-796): Swin + text backbones, per-modality
projections into the joint space, an N-layer fusion stack (cross-modal
fusion -> positional encoding -> self-attention -> FFN/adapter residual
with stochastic depth), a pooled joint embedding, and a 4x-wide MLP
classifier over the 43 labels. Modes: multimodal / image / text (missing
modality replaced by a learned null token, keeping shapes static instead of
the reference's per-branch Python forks, model.py:461-479).

The model is a pure function of (params, batch): retrieval and explanation
engines live outside (mmrp_tpu.retrieval / mmrp_tpu.models.explain) and are
composed by mmrp_tpu.api — unlike the reference where the torch module owns
a retriever and an explainer (model.py:281-309, 628-635). That keeps this
forward jit-compilable end to end.

Reference quirk intentionally preserved: each fusion layer re-attends the
SAME backbone features; the residual stream flows only through the pooled
joint embedding (model.py:376-449, noted in SURVEY §3.3).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mmrp_tpu.config import Config
from mmrp_tpu.models.fusion import CrossModalFusion
from mmrp_tpu.models.layers import DropPath, Mlp, PositionalEncoding
from mmrp_tpu.models.swin import SwinConfig, SwinEncoder
from mmrp_tpu.models.text_encoder import TextConfig, TextEncoder


@dataclass(frozen=True)
class MultiModalConfig:
    swin: SwinConfig
    text: TextConfig
    vision_backbone: str = "swin"  # swin | resnet50 | vit/medclip (fusion.py:37-171)
    joint_dim: int = 1024
    num_fusion_layers: int = 5
    num_heads: int = 8
    num_classes: int = 43
    mode: str = "multimodal"  # multimodal | image | text
    use_shared_ffn: bool = False
    use_cls_only: bool = False
    dropout: float = 0.1
    drop_path: float = 0.1
    max_text_len: int = 512

    @staticmethod
    def from_config(cfg: Config, num_classes: int = 43, flagship: bool = False) -> "MultiModalConfig":
        """Build from the framework Config. ``flagship=True`` selects the
        full-size backbones (Swin-B + ClinicalBERT dims)."""
        swin = SwinConfig.from_name(
            cfg.image_backbone if cfg.image_backbone.startswith("swin")
            # MedCLIP's vision tower is Swin-Tiny (models/medclip.py)
            else ("swin_tiny" if cfg.image_backbone.lower() == "medclip" else "swin"),
            use_pallas=cfg.use_pallas_attention,
            img_size=cfg.image_size,
            remat=cfg.remat_backbone,
        )
        backbone = cfg.image_backbone.lower()
        if backbone.startswith("swin"):
            vision_backbone = "swin"
        elif backbone.startswith("resnet"):
            vision_backbone = "resnet50"
        elif backbone in ("medclip", "vit"):
            vision_backbone = "medclip" if flagship else "vit"
        else:
            vision_backbone = "swin"
        if flagship:
            text = TextConfig.clinicalbert()
        elif "micro" in cfg.image_backbone:
            text = TextConfig.small(
                hidden_dim=32, num_layers=1, num_heads=2, intermediate_dim=64
            )
        else:
            text = TextConfig.small()
        return MultiModalConfig(
            swin=swin,
            text=text,
            vision_backbone=vision_backbone,
            joint_dim=cfg.joint_dim,
            num_fusion_layers=cfg.num_fusion_layers,
            num_heads=cfg.num_heads,
            num_classes=num_classes,
            use_shared_ffn=cfg.use_shared_ffn,
            use_cls_only=cfg.use_cls_only,
            max_text_len=cfg.text_dim,
        )


class Backbones(nn.Module):
    """Vision + text encoders with projections to the joint dim
    (reference fusion.py:37-332)."""

    config: MultiModalConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, input_ids, attention_mask, deterministic=True):
        cfg = self.config
        if cfg.vision_backbone in ("resnet50", "resnet"):
            from mmrp_tpu.models.resnet import ResNetConfig, ResNetEncoder

            vis = ResNetEncoder(ResNetConfig.resnet50(), dtype=self.dtype,
                                name="resnet")(image, deterministic)
        elif cfg.vision_backbone == "medclip":
            # MedCLIP's vision tower is Swin (tiny at parity scale, set by
            # MultiModalConfig.from_config) + 512-d projection
            # (fusion.py:131-171; see models/medclip.py)
            from mmrp_tpu.models.medclip import MedCLIPVisionEncoder

            vis = MedCLIPVisionEncoder(
                swin=cfg.swin, dtype=self.dtype, name="medclip"
            )(image, deterministic)
        elif cfg.vision_backbone == "vit":
            from mmrp_tpu.models.vit import ViTConfig, ViTEncoder

            vis = ViTEncoder(
                ViTConfig.small(img_size=cfg.swin.img_size),
                dtype=self.dtype, name="vit",
            )(image, deterministic)
        else:
            vis = SwinEncoder(cfg.swin, dtype=self.dtype, name="swin")(
                image, deterministic
            )
        txt = TextEncoder(cfg.text, dtype=self.dtype, name="text")(
            input_ids, attention_mask, deterministic
        )
        return {
            "img_patches": vis["patches"],  # (B, Np, F_img)
            "img_global": vis["global"],  # (B, F_img)
            "txt_tokens": txt["tokens"],  # (B, Lt, F_txt)
            "txt_cls": txt["cls"],  # (B, F_txt)
        }


class FusionLayer(nn.Module):
    """One fusion block: cross-modal fusion -> pos-enc -> self-attn ->
    FFN(+adapter) residual (reference model.py:375-449)."""

    config: MultiModalConfig
    drop_path: float
    shared_ffn: Optional[nn.Module] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, img_patches, img_global, txt_tokens, txt_mask, deterministic=True
    ):
        cfg = self.config
        D = cfg.joint_dim
        seq, attn = CrossModalFusion(
            dim=D,
            num_heads=cfg.num_heads,
            num_patches=img_patches.shape[1],
            max_text_len=cfg.max_text_len,
            dropout=cfg.dropout,
            dtype=self.dtype,
            name="fusion",
        )(img_patches, img_global, txt_tokens, txt_mask, deterministic)

        seq = nn.Dropout(cfg.dropout)(seq, deterministic=deterministic)
        seq = PositionalEncoding(max_len=seq.shape[1] + 1)(seq)
        y = nn.LayerNorm(dtype=self.dtype)(seq)
        y = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, dropout_rate=cfg.dropout, dtype=self.dtype
        )(y, y, deterministic=deterministic)
        seq = seq + DropPath(self.drop_path)(y, deterministic)

        ffn = self.shared_ffn
        if ffn is None:
            ffn = Mlp(D * 4, dropout=cfg.dropout, dtype=self.dtype, name="ffn")
        y = ffn(nn.LayerNorm(dtype=self.dtype)(seq), deterministic)
        seq = seq + DropPath(self.drop_path)(y, deterministic)

        # small bottleneck adapter (model.py:443-446)
        a = nn.Dense(D // 4, dtype=self.dtype, name="adapter_down")(seq)
        a = nn.gelu(a)
        a = nn.Dense(D, dtype=self.dtype, name="adapter_up")(a)
        seq = nn.LayerNorm(dtype=self.dtype)(seq + a)

        pooled = seq[:, 0, :] if cfg.use_cls_only else seq.mean(axis=1)
        return pooled, attn


class MultiModalRetrievalModel(nn.Module):
    config: MultiModalConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,  # (B, H, W, 3)
        input_ids: jnp.ndarray,  # (B, Lt)
        attention_mask: jnp.ndarray,  # (B, Lt)
        deterministic: bool = True,
        return_attention: bool = False,
        patch_delta: Optional[jnp.ndarray] = None,
        txt_delta: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        cfg = self.config
        D = cfg.joint_dim

        feats = Backbones(cfg, dtype=self.dtype, name="backbones")(
            image, input_ids, attention_mask, deterministic
        )

        img_patches = nn.Dense(D, dtype=self.dtype, name="img_proj")(feats["img_patches"])
        if patch_delta is not None:
            # explainability hook: gradients w.r.t. this zero-valued input are
            # gradients w.r.t. the projected patches (Grad-CAM, explain.py)
            img_patches = img_patches + patch_delta
        img_global = nn.Dense(D, dtype=self.dtype, name="img_global_proj")(feats["img_global"])
        txt_tokens = nn.Dense(D, dtype=self.dtype, name="txt_proj")(feats["txt_tokens"])
        if txt_delta is not None:
            # explainability hook: grads w.r.t. this zero input are grads
            # w.r.t. the projected text tokens (token-level IG/saliency)
            txt_tokens = txt_tokens + txt_delta
        txt_cls = nn.Dense(D, dtype=self.dtype, name="txt_cls_proj")(feats["txt_cls"])
        txt_mask = attention_mask[:, : txt_tokens.shape[1]]

        # modality gating with learned null tokens — static shapes in all modes
        if cfg.mode == "image":
            null_txt = self.param(
                "null_txt", nn.initializers.truncated_normal(0.02), (1, 1, D), jnp.float32
            )
            txt_tokens = jnp.broadcast_to(
                null_txt.astype(txt_tokens.dtype), (txt_tokens.shape[0], 1, D)
            )
            txt_cls = txt_tokens[:, 0, :]
            txt_mask = jnp.ones((txt_tokens.shape[0], 1), dtype=attention_mask.dtype)
        elif cfg.mode == "text":
            null_img = self.param(
                "null_img", nn.initializers.truncated_normal(0.02), (1, 1, D), jnp.float32
            )
            img_patches = jnp.broadcast_to(
                null_img.astype(img_patches.dtype), (img_patches.shape[0], 1, D)
            )
            img_global = img_patches[:, 0, :]

        shared_ffn = None
        if cfg.use_shared_ffn:
            shared_ffn = Mlp(D * 4, dropout=cfg.dropout, dtype=self.dtype, name="shared_ffn")

        joint = nn.Dense(D, dtype=self.dtype, name="joint_init")(
            jnp.concatenate([img_global, txt_cls], axis=-1)
        )
        attn_maps = []
        for i in range(cfg.num_fusion_layers):
            dp = cfg.drop_path * i / max(cfg.num_fusion_layers - 1, 1)
            pooled, attn = FusionLayer(
                cfg,
                drop_path=dp,
                shared_ffn=shared_ffn,
                dtype=self.dtype,
                name=f"fusion_layer{i}",
            )(img_patches, img_global, txt_tokens, txt_mask, deterministic)
            joint = nn.LayerNorm(dtype=self.dtype, name=f"joint_norm{i}")(joint + pooled)
            if return_attention:
                attn_maps.append(attn)

        joint = joint.astype(jnp.float32)
        x = nn.Dense(D * 4, dtype=self.dtype, name="cls_hidden")(joint)
        x = nn.gelu(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        logits = nn.Dense(cfg.num_classes, dtype=jnp.float32, name="cls_out")(x)

        out: Dict[str, Any] = {
            "logits": logits,
            "joint_emb": joint,
            "img_emb": img_global.astype(jnp.float32),
            "txt_emb": txt_cls.astype(jnp.float32),
            "img_patches_proj": img_patches.astype(jnp.float32),
            "txt_tokens_proj": txt_tokens.astype(jnp.float32),
        }
        if return_attention:
            out["attention"] = attn_maps
        return out
