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

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmrp_tpu.config import Config
from mmrp_tpu.models.fusion import CrossModalFusion
from mmrp_tpu.models.layers import DropPath, Mlp, ln_f32
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
    quant: str = "none"  # "int8": W8A8 GEMMs in the fusion stack (serving)
    remat_fusion: bool = False  # jax.checkpoint per fusion layer (the
    #   stack's (B, Np+Lt+1, joint_dim) activations dominate big-batch
    #   training memory alongside the backbones)

    @staticmethod
    def from_config(cfg: Config, num_classes: int = 43, flagship: bool = False,
                    text_override: Optional[TextConfig] = None) -> "MultiModalConfig":
        """Build from the framework Config. ``flagship=True`` selects the
        full-size backbones (Swin-B + ClinicalBERT dims). ``text_override``
        pins the text tower's dims (pretrained-bootstrap path: the tower
        must be built at the ported checkpoint's shape, models/port.py)."""
        sq = getattr(cfg, "serve_quant", "none")
        swin_kw = {}
        if sq == "int8_static":
            # static-scale W8A8 in the Swin whole-block kernel (wide-C
            # stages); activation scales from the calibration artifact if
            # present, else dynamic per-row (weights still static int8)
            swin_kw["quant"] = "int8_static"
            amax_path = getattr(cfg, "swin_act_amax_path", None)
            if amax_path:
                from mmrp_tpu.models.quant_calib import load_act_amax

                swin_kw["act_amax"] = load_act_amax(amax_path)
        swin = SwinConfig.from_name(
            cfg.image_backbone if cfg.image_backbone.startswith("swin")
            # MedCLIP's vision tower is Swin-Tiny (models/medclip.py)
            else ("swin_tiny" if cfg.image_backbone.lower() == "medclip" else "swin"),
            use_pallas=cfg.use_pallas_attention,
            img_size=cfg.image_size,
            remat=cfg.remat_backbone,
            **swin_kw,
        )
        backbone = cfg.image_backbone.lower()
        if backbone.startswith("swin"):
            vision_backbone = "swin"
        elif backbone.startswith("resnet"):
            vision_backbone = "resnet50"
        elif backbone.startswith("efficientnet"):
            vision_backbone = "efficientnet"
        elif backbone in ("medclip", "vit"):
            # honor the explicit choice: "vit" is the generic ViT encoder,
            # "medclip" the MedCLIP Swin-tower wrapper — conflating them
            # by flagship-ness would silently run the wrong ablation
            vision_backbone = backbone
        else:
            vision_backbone = "swin"
        tq = "int8_kernel" if sq in ("int8", "int8_static") else "none"
        # one knob remats all three heavy towers (Swin blocks, BERT layers,
        # fusion stack) — big-batch training trades FLOPs for activation HBM
        rm = bool(cfg.remat_backbone)
        if text_override is not None:
            import dataclasses

            text = dataclasses.replace(text_override, quant=tq, remat=rm)
        elif flagship:
            text = TextConfig.clinicalbert(quant=tq, remat=rm)
        elif "micro" in cfg.image_backbone:
            text = TextConfig.small(
                hidden_dim=32, num_layers=1, num_heads=2, intermediate_dim=64,
                quant=tq, remat=rm,
            )
        else:
            text = TextConfig.small(quant=tq, remat=rm)
        return MultiModalConfig(
            swin=swin,
            text=text,
            remat_fusion=rm,
            vision_backbone=vision_backbone,
            joint_dim=cfg.joint_dim,
            num_fusion_layers=cfg.num_fusion_layers,
            num_heads=cfg.num_heads,
            num_classes=num_classes,
            mode=cfg.modality,
            use_shared_ffn=cfg.use_shared_ffn,
            use_cls_only=cfg.use_cls_only,
            max_text_len=cfg.text_dim,
            quant="int8" if sq in ("int8", "int8_static") else "none",
        )


class Backbones(nn.Module):
    """Vision + text encoders with projections to the joint dim
    (reference fusion.py:37-332)."""

    config: MultiModalConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, input_ids, attention_mask, deterministic=True):
        cfg = self.config
        # unimodal modes skip the unused tower entirely (cfg.mode is
        # trace-time static; reference model.py:461-479 selects modes in
        # forward but still pays both towers — here text mode does not
        # build or run the vision encoder at all, and vice versa)
        if cfg.mode == "text":
            txt = TextEncoder(cfg.text, dtype=self.dtype, name="text")(
                input_ids, attention_mask, deterministic
            )
            return {"txt_tokens": txt["tokens"], "txt_cls": txt["cls"]}
        if cfg.vision_backbone in ("resnet50", "resnet"):
            from mmrp_tpu.models.resnet import ResNetConfig, ResNetEncoder

            vis = ResNetEncoder(ResNetConfig.resnet50(), dtype=self.dtype,
                                name="resnet")(image, deterministic)
        elif cfg.vision_backbone == "efficientnet":
            # reference's third torchvision variant (fusion.py:118-119)
            from mmrp_tpu.models.efficientnet import (
                EfficientNetConfig, EfficientNetEncoder,
            )

            vis = EfficientNetEncoder(
                EfficientNetConfig.b0(), dtype=self.dtype, name="efficientnet"
            )(image, deterministic)
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
        if cfg.mode == "image":
            return {"img_patches": vis["patches"], "img_global": vis["global"]}
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
    FFN(+adapter) residual (reference model.py:375-449).

    Fused path (TPU, eval / dropout==0, no attention maps requested): the
    self-attention runs as one Pallas kernel with the sinusoidal positional
    encoding folded in, and the FFN as the fused LN+MLP+residual kernel —
    the sequence is padded to 8 tokens ([cls, Np, txt, 0-pad]) with padded
    keys masked, so real-row outputs match the XLA path
    (tests/test_fusion_fused.py)."""

    config: MultiModalConfig
    drop_path: float
    shared_ffn: Optional[nn.Module] = None
    dtype: jnp.dtype = jnp.float32
    num_patches_real: Optional[int] = None  # set when patches arrive padded

    @nn.compact
    def __call__(
        self, img_patches, img_global, txt_tokens, txt_mask,
        deterministic=True, need_attn=True, img_mask=None,
    ):
        from mmrp_tpu.models.fusion import _use_fused_attn
        from mmrp_tpu.models.layers import LnParams, MhaParams
        from mmrp_tpu.models.swin import MlpParams

        cfg = self.config
        D = cfg.joint_dim
        # deterministic only: XLA int8 GEMMs have zero-gradient rounding, so
        # quantized training would silently break (see text_encoder.BertLayer)
        quant = cfg.quant == "int8" and deterministic
        Np = self.num_patches_real or img_patches.shape[1]
        Lr = Np + 2                      # real sequence length (cls+Np+txt)
        use_fused = (
            not need_attn
            and not quant
            and self.shared_ffn is None
            and (deterministic or self.drop_path == 0.0)
            and _use_fused_attn(True, deterministic, cfg.dropout)
        )
        Lp = ((Lr + 7) // 8) * 8 if use_fused else Lr

        seq, attn = CrossModalFusion(
            dim=D,
            num_heads=cfg.num_heads,
            num_patches=Np,
            max_text_len=cfg.max_text_len,
            dropout=cfg.dropout,
            dtype=self.dtype,
            quant=quant,
            pad_seq_to=Lp if Lp != Lr else None,
            name="fusion",
        )(img_patches, img_global, txt_tokens, txt_mask, deterministic,
          need_attn, img_mask)

        seq = nn.Dropout(cfg.dropout)(seq, deterministic=deterministic)

        ln0_s, ln0_b = LnParams(name="LayerNorm_0")(D)
        (wq, bq), (wk, bk), (wv, bv), (wo, bo) = MhaParams(
            D, name="attention")()
        ln1_s, ln1_b = LnParams(name="LayerNorm_1")(D)
        mlp_holder = None if self.shared_ffn is not None else MlpParams(
            D * 4, D, name="ffn")

        from mmrp_tpu.models.layers import sinusoidal_positions

        sin = jnp.asarray(sinusoidal_positions(Lp, D))

        if use_fused:
            from mmrp_tpu.ops.fused_attention import fused_attention
            from mmrp_tpu.ops.fused_mlp import fused_ln_mlp_residual

            B = seq.shape[0]
            if Lp != Lr:
                valid_row = jnp.concatenate(
                    [jnp.zeros((Lr,), jnp.float32),
                     jnp.full((Lp - Lr,), -1e9, jnp.float32)])
                smask = jnp.broadcast_to(valid_row[None], (B, Lp))
            else:
                smask = None
            # pos-enc + LN + self-attention + residual, one kernel
            seq = fused_attention(
                seq, ln0_s.astype(jnp.float32), ln0_b.astype(jnp.float32),
                wq.astype(self.dtype), bq.astype(self.dtype),
                wk.astype(self.dtype), bk.astype(self.dtype),
                wv.astype(self.dtype), bv.astype(self.dtype),
                wo.astype(self.dtype), bo.astype(self.dtype),
                key_mask=smask, pos=sin[:Lp].astype(self.dtype),
                num_heads=cfg.num_heads, ln_mode="pre",
                include_residual=True,
            )
            (w1, b1), (w2, b2) = mlp_holder()
            seq = fused_ln_mlp_residual(
                seq.reshape(B * Lp, D),
                ln1_s.astype(jnp.float32), ln1_b.astype(jnp.float32),
                w1.astype(self.dtype), b1.astype(self.dtype),
                w2.astype(self.dtype), b2.astype(self.dtype),
            ).reshape(B, Lp, D)
        else:
            seq = seq + sin[None, : seq.shape[1]].astype(seq.dtype)
            y = ln_f32(seq, ln0_s, ln0_b, self.dtype)
            B, L, _ = seq.shape
            h, dh = cfg.num_heads, D // cfg.num_heads
            if quant:
                from mmrp_tpu.ops.quant import quant_dot, quant_dot_multi

                q, k, v = quant_dot_multi(y, [(wq, bq), (wk, bk), (wv, bv)])
                q, k, v = (t.reshape(B, L, h, dh) for t in (q, k, v))
            else:
                q = (y @ wq.astype(y.dtype) + bq.astype(y.dtype)).reshape(B, L, h, dh)
                k = (y @ wk.astype(y.dtype) + bk.astype(y.dtype)).reshape(B, L, h, dh)
                v = (y @ wv.astype(y.dtype) + bv.astype(y.dtype)).reshape(B, L, h, dh)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * dh**-0.5
            p = jax.nn.softmax(scores, axis=-1)
            p = nn.Dropout(cfg.dropout)(p, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            y = ctx.astype(seq.dtype).reshape(B, L, D)
            if quant:
                y = quant_dot(y, wo, bo)
            else:
                y = y @ wo.astype(seq.dtype) + bo.astype(seq.dtype)
            seq = seq + DropPath(self.drop_path)(y, deterministic)

            y = ln_f32(seq, ln1_s, ln1_b, self.dtype)
            if self.shared_ffn is not None:
                y = self.shared_ffn(y, deterministic)
            elif quant:
                from mmrp_tpu.ops.quant import quant_dot as _qd

                (w1, b1), (w2, b2) = mlp_holder()
                y = jax.nn.gelu(_qd(y, w1, b1))
                y = _qd(y, w2, b2)
            else:
                (w1, b1), (w2, b2) = mlp_holder()
                y = jax.nn.gelu(y @ w1.astype(y.dtype) + b1.astype(y.dtype))
                y = nn.Dropout(cfg.dropout)(y, deterministic=deterministic)
                y = y @ w2.astype(y.dtype) + b2.astype(y.dtype)
                y = nn.Dropout(cfg.dropout)(y, deterministic=deterministic)
            seq = seq + DropPath(self.drop_path)(y, deterministic)

        # small bottleneck adapter (model.py:443-446)
        a = nn.Dense(D // 4, dtype=self.dtype, name="adapter_down")(seq)
        a = nn.gelu(a)
        a = nn.Dense(D, dtype=self.dtype, name="adapter_up")(a)
        seq = nn.LayerNorm(dtype=self.dtype, name="LayerNorm_2")(seq + a)

        if cfg.use_cls_only:
            pooled = seq[:, 0, :]
        elif Lp != Lr:
            w = jnp.concatenate([jnp.ones((Lr,), jnp.float32),
                                 jnp.zeros((Lp - Lr,), jnp.float32)])
            pooled = jnp.einsum("bld,l->bd", seq.astype(jnp.float32),
                                w) / float(Lr)
            pooled = pooled.astype(seq.dtype)
        else:
            pooled = seq.mean(axis=1)
        return pooled, attn


class MultiModalRetrievalModel(nn.Module):
    config: MultiModalConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image: Optional[jnp.ndarray],  # (B, H, W, 3); None iff `features` given
        input_ids: jnp.ndarray,  # (B, Lt)
        attention_mask: jnp.ndarray,  # (B, Lt)
        deterministic: bool = True,
        return_attention: bool = False,
        patch_delta: Optional[jnp.ndarray] = None,
        txt_delta: Optional[jnp.ndarray] = None,
        features: Optional[Dict[str, jnp.ndarray]] = None,
        return_features: bool = False,
    ) -> Dict[str, Any]:
        """``features`` (keys img_patches/img_global/txt_tokens/txt_cls, the
        raw pre-projection backbone outputs) skips the backbones and runs
        projections + fusion + classifier only — the explain engine's
        patch-level IG interpolates these features and recomputes just this
        head per step, exactly like the reference's captum forward
        (reference src/Model/explain.py:121-168,378-390) instead of paying
        n_steps full backbone passes. ``return_features`` exposes the raw
        backbone outputs so one forward can seed that path."""
        cfg = self.config
        D = cfg.joint_dim

        if features is not None:
            feats = features
        else:
            feats = Backbones(cfg, dtype=self.dtype, name="backbones")(
                image, input_ids, attention_mask, deterministic
            )

        # explain hooks are meaningless for a tower the mode replaces with
        # a null token — fail loudly instead of returning silent zero grads
        if cfg.mode == "text" and patch_delta is not None:
            raise ValueError("patch_delta requires the image tower (mode='text')")
        if cfg.mode == "image" and txt_delta is not None:
            raise ValueError("txt_delta requires the text tower (mode='image')")

        B0 = input_ids.shape[0]
        if cfg.mode != "text":
            img_patches = nn.Dense(D, dtype=self.dtype, name="img_proj")(feats["img_patches"])
            if patch_delta is not None:
                # explainability hook: gradients w.r.t. this zero-valued input
                # are gradients w.r.t. the projected patches (Grad-CAM)
                img_patches = img_patches + patch_delta
            img_global = nn.Dense(D, dtype=self.dtype, name="img_global_proj")(feats["img_global"])
        if cfg.mode != "image":
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
                null_txt.astype(self.dtype), (B0, 1, D)
            )
            txt_cls = txt_tokens[:, 0, :]
            txt_mask = jnp.ones((B0, 1), dtype=attention_mask.dtype)
        elif cfg.mode == "text":
            null_img = self.param(
                "null_img", nn.initializers.truncated_normal(0.02), (1, 1, D), jnp.float32
            )
            img_patches = jnp.broadcast_to(
                null_img.astype(self.dtype), (B0, 1, D)
            )
            img_global = img_patches[:, 0, :]

        shared_ffn = None
        if cfg.use_shared_ffn:
            shared_ffn = Mlp(D * 4, dropout=cfg.dropout, dtype=self.dtype, name="shared_ffn")

        joint = nn.Dense(D, dtype=self.dtype, name="joint_init")(
            jnp.concatenate([img_global, txt_cls], axis=-1)
        )

        # Fused fusion-stack path (TPU): all 5 layers re-attend the SAME
        # backbone features (reference quirk), so pad the patches to a
        # Mosaic-friendly token count ONCE with a validity mask; every
        # attention op masks the pad keys, keeping real-row outputs equal to
        # the unpadded XLA path (tests/test_fusion_fused.py).
        from mmrp_tpu.models.fusion import _use_fused_attn

        Np = img_patches.shape[1]
        fused_stack = (
            not return_attention
            and cfg.quant != "int8"
            and _use_fused_attn(True, deterministic, cfg.dropout)
        )
        img_patches_f, img_mask = img_patches, None
        if fused_stack and Np % 8 != 0:
            P = ((Np + 7) // 8) * 8
            B = img_patches.shape[0]
            img_patches_f = jnp.pad(
                img_patches, ((0, 0), (0, P - Np), (0, 0)))
            img_mask = jnp.broadcast_to(
                (jnp.arange(P) < Np).astype(jnp.int32)[None], (B, P))

        attn_maps = []
        # static_argnums: module instance is arg 0; the Python bools
        # `deterministic` (5) and `need_attn` (6) steer trace-time branches
        layer_cls = (
            nn.remat(FusionLayer, static_argnums=(5, 6))
            if cfg.remat_fusion else FusionLayer
        )
        for i in range(cfg.num_fusion_layers):
            dp = cfg.drop_path * i / max(cfg.num_fusion_layers - 1, 1)
            pooled, attn = layer_cls(
                cfg,
                drop_path=dp,
                shared_ffn=shared_ffn,
                dtype=self.dtype,
                num_patches_real=Np,
                name=f"fusion_layer{i}",
            )(img_patches_f, img_global, txt_tokens, txt_mask, deterministic,
              return_attention, img_mask)
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
        if return_features:
            out["features"] = feats
        return out
