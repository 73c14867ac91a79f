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

Performance (round 2): on the target slice every GEMM here is HBM-bound
(docs/ROOFLINE.md), so each attention block runs as ONE fused Pallas kernel
(ops/fused_attention.py) that keeps qkv/scores/proj in VMEM — including the
enhancer's pos-add and alpha-scaled residual and the cross-attention's
post-residual LayerNorm. The fused path needs token counts that are
multiples of 8 (Mosaic sublane tiles): callers pass patches PADDED to 8
with a validity mask (see multimodal.py), and padded keys are excluded via
the additive mask, so real-row outputs are bit-comparable to the unfused
path (tests/test_fusion_fused.py). When attention maps are requested
(explainability) or dropout is active, the autodiff XLA path runs instead
— same parameters, same math.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmrp_tpu.models.layers import DenseParams, LnParams, MhaParams, ln_f32


def _use_fused_attn(enabled: bool, deterministic: bool, dropout: float,
                    *token_counts: int) -> bool:
    import os

    from mmrp_tpu.models.swin import _pallas_backend

    return (
        enabled
        # A/B kill-switch for the FUSION stack only (Swin kernels keep
        # their own gates): MMRP_FUSION_FUSED=0 routes fusion attention
        # through XLA — used by the explain-path A/B (ROOFLINE §9: the IG
        # scan differentiates the fusion head, where the custom-VJP
        # kernel was a measured TRAIN loss; serve keeps the fused path).
        and os.environ.get("MMRP_FUSION_FUSED", "1") == "1"
        and (deterministic or dropout == 0.0)
        and all(n % 8 == 0 for n in token_counts)
        and _pallas_backend()
    )


def _additive_mask(mask: Optional[jnp.ndarray]):
    """(B, N) 0/1 validity -> (B, N) additive f32 (0 / -1e9), or None."""
    if mask is None:
        return None
    return jnp.where(mask > 0, 0.0, -1e9).astype(jnp.float32)


class CrossAttention(nn.Module):
    """MHA that also returns head-wise attention weights (for explain).

    ``post_ln``: optional (scale, bias) — when given, the module returns
    LayerNorm(q_in + attn_out) (the reference's residual+LN that follows
    each cross-attention, fusion.py:439-440) so the fused kernel can do
    residual+LN in VMEM. ``need_weights=False`` enables the fused path and
    returns attn=None.
    """

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_fused: bool = True
    quant: bool = False   # W8A8 int8 GEMMs (serving; ops/quant.py)

    @nn.compact
    def __call__(
        self,
        q_in: jnp.ndarray,  # (B, Lq, D)
        kv_in: jnp.ndarray,  # (B, Lk, D)
        kv_mask: Optional[jnp.ndarray] = None,  # (B, Lk) 1=valid
        deterministic: bool = True,
        need_weights: bool = True,
        post_ln: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        D, H = self.dim, self.num_heads
        (wq, bq) = DenseParams(D, name="q")(D)
        (wk, bk) = DenseParams(D, name="k")(D)
        (wv, bv) = DenseParams(D, name="v")(D)
        (wo, bo) = DenseParams(D, name="out")(D)
        B, Lq, _ = q_in.shape
        Lk = kv_in.shape[1]
        add_mask = _additive_mask(kv_mask)

        if (
            not need_weights
            and not self.quant
            and _use_fused_attn(self.use_fused, deterministic, self.dropout,
                                Lq, Lk)
        ):
            from mmrp_tpu.ops.fused_attention import fused_attention

            if post_ln is not None:
                ln_s, ln_b = post_ln
                mode = "post"
            else:
                ln_s = jnp.ones((D,), jnp.float32)
                ln_b = jnp.zeros((D,), jnp.float32)
                mode = "none"
            out = fused_attention(
                q_in, ln_s.astype(jnp.float32), ln_b.astype(jnp.float32),
                wq.astype(self.dtype), bq.astype(self.dtype),
                wk.astype(self.dtype), bk.astype(self.dtype),
                wv.astype(self.dtype), bv.astype(self.dtype),
                wo.astype(self.dtype), bo.astype(self.dtype),
                kv=kv_in, key_mask=add_mask, num_heads=H, ln_mode=mode,
                include_residual=False,
            )
            return out, None

        d = D // H
        if self.quant:
            from mmrp_tpu.ops.quant import quant_dot, quant_dot_multi

            (q,) = quant_dot_multi(q_in, [(wq, bq)])
            k, v = quant_dot_multi(kv_in, [(wk, bk), (wv, bv)])
            q = q.reshape(B, Lq, H, d)
            k = k.reshape(B, Lk, H, d)
            v = v.reshape(B, Lk, H, d)
        else:
            q = (q_in @ wq.astype(q_in.dtype) + bq.astype(q_in.dtype)).reshape(
                B, Lq, H, d)
            k = (kv_in @ wk.astype(kv_in.dtype) + bk.astype(kv_in.dtype)).reshape(
                B, Lk, H, d)
            v = (kv_in @ wv.astype(kv_in.dtype) + bv.astype(kv_in.dtype)).reshape(
                B, Lk, H, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * d**-0.5
        if add_mask is not None:
            scores = scores + add_mask[:, None, None, :]
        attn = jax.nn.softmax(scores, axis=-1)
        attn_d = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn_d.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.astype(q_in.dtype).reshape(B, Lq, D)
        if self.quant:
            out = quant_dot(ctx, wo, bo)
        else:
            out = ctx @ wo.astype(q_in.dtype) + bo.astype(q_in.dtype)
        if post_ln is not None:
            ln_s, ln_b = post_ln
            out = ln_f32(q_in + out, ln_s, ln_b, q_in.dtype,
                         affine_in_f32=True)
        return out, (attn if need_weights else None)


class PreFusionEnhancer(nn.Module):
    """Self-attn + learned positional embedding + alpha-scaled residual
    (reference fusion.py:20-35): out = x + alpha * MHA(LN(x + pos)).

    ``max_len`` sizes the positional parameter (the REAL token count); the
    input may be padded beyond it (extra rows get zero pos and must be
    masked out via ``mask``)."""

    dim: int
    num_heads: int
    max_len: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_fused: bool = True
    quant: bool = False

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        B, N, D = x.shape
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, self.max_len, self.dim),
            jnp.float32,
        )
        alpha = self.param("alpha", nn.initializers.zeros, (), jnp.float32)
        ln_s, ln_b = LnParams(name="LayerNorm_0")(D)
        (wq, bq), (wk, bk), (wv, bv), (wo, bo) = MhaParams(
            D, name="attention")()
        pos_n = pos[0, :N]
        if N > self.max_len:  # padded input: zero pos on pad rows
            pos_n = jnp.concatenate(
                [pos[0], jnp.zeros((N - self.max_len, D), pos.dtype)], axis=0)
        add_mask = _additive_mask(mask)

        if not self.quant and _use_fused_attn(
                self.use_fused, deterministic, self.dropout, N):
            from mmrp_tpu.ops.fused_attention import fused_attention

            return fused_attention(
                x, ln_s.astype(jnp.float32), ln_b.astype(jnp.float32),
                wq.astype(self.dtype), bq.astype(self.dtype),
                wk.astype(self.dtype), bk.astype(self.dtype),
                wv.astype(self.dtype), bv.astype(self.dtype),
                wo.astype(self.dtype), bo.astype(self.dtype),
                key_mask=add_mask, pos=pos_n.astype(self.dtype),
                alpha=alpha, num_heads=self.num_heads, ln_mode="pre",
                include_residual=True, residual_from_raw=True,
            )

        base = x + pos_n[None].astype(x.dtype)
        y = ln_f32(base, ln_s, ln_b, self.dtype)
        h, d = self.num_heads, D // self.num_heads
        if self.quant:
            from mmrp_tpu.ops.quant import quant_dot, quant_dot_multi

            q, k, v = quant_dot_multi(y, [(wq, bq), (wk, bk), (wv, bv)])
            q, k, v = (t.reshape(B, N, h, d) for t in (q, k, v))
        else:
            q = (y @ wq.astype(y.dtype) + bq.astype(y.dtype)).reshape(B, N, h, d)
            k = (y @ wk.astype(y.dtype) + bk.astype(y.dtype)).reshape(B, N, h, d)
            v = (y @ wv.astype(y.dtype) + bv.astype(y.dtype)).reshape(B, N, h, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * d**-0.5
        if add_mask is not None:
            scores = scores + add_mask[:, None, None, :]
        p = jax.nn.softmax(scores, axis=-1)
        p = nn.Dropout(self.dropout)(p, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.astype(x.dtype).reshape(B, N, D)
        if self.quant:
            y = quant_dot(ctx, wo, bo)
        else:
            y = ctx @ wo.astype(x.dtype) + bo.astype(x.dtype)
        return x + alpha.astype(x.dtype) * y


class CrossModalFusion(nn.Module):
    """Bidirectional cross-attention fusion.

    Inputs: image patches (B, Np, D) — possibly padded to 8 beyond
    ``num_patches`` real ones, with ``img_mask`` marking validity — image
    global (B, D), text tokens (B, Lt, D), text mask (B, Lt). Output: fused
    sequence ``[cls, Np patches, txt]`` (B, Np+2, D) + attention dict (None
    entries on the fused path).
    """

    dim: int
    num_heads: int
    num_patches: int           # REAL patch count (positional param size)
    max_text_len: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_fused: bool = True
    quant: bool = False
    pad_seq_to: Optional[int] = None  # emit [cls, real patches, txt, 0-pad]

    @nn.compact
    def __call__(
        self,
        img_patches: jnp.ndarray,
        img_global: jnp.ndarray,
        txt_tokens: jnp.ndarray,
        txt_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        need_attn: bool = True,
        img_mask: Optional[jnp.ndarray] = None,  # (B, Np_padded) 1=valid
    ):
        D = self.dim
        # per-modality enhancement before fusion (fusion.py:408-421)
        txt_e = PreFusionEnhancer(
            D, self.num_heads, self.max_text_len, self.dropout, self.dtype,
            use_fused=self.use_fused, quant=self.quant, name="txt_enh",
        )(txt_tokens, txt_mask, deterministic)
        pat_e = PreFusionEnhancer(
            D, self.num_heads, self.num_patches, self.dropout, self.dtype,
            use_fused=self.use_fused, quant=self.quant, name="img_enh",
        )(img_patches, img_mask, deterministic)

        tn_s, tn_b = LnParams(name="txt_norm")(D)
        in_s, in_b = LnParams(name="img_norm")(D)

        # text queries attend image patches; patches attend text — both over
        # the ENHANCED tensors, each followed by the reference's residual+LN
        # (folded into the kernel via post_ln)
        txt, attn_t2i = CrossAttention(
            D, self.num_heads, self.dropout, self.dtype,
            use_fused=self.use_fused, quant=self.quant, name="txt2img",
        )(txt_e, pat_e, img_mask, deterministic, need_attn,
          post_ln=(tn_s, tn_b))
        patches, attn_i2t = CrossAttention(
            D, self.num_heads, self.dropout, self.dtype,
            use_fused=self.use_fused, quant=self.quant, name="img2txt",
        )(pat_e, txt_e, txt_mask, deterministic, need_attn,
          post_ln=(in_s, in_b))

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
        parts = [cls[:, None, :], patches[:, : self.num_patches],
                 txt_pooled[:, None, :]]
        real_len = 2 + self.num_patches
        if self.pad_seq_to is not None and self.pad_seq_to > real_len:
            B = patches.shape[0]
            parts.append(jnp.zeros(
                (B, self.pad_seq_to - real_len, D), patches.dtype))
        seq = jnp.concatenate(parts, axis=1)  # (B, 1+Np+1 [+pad], D)
        return seq, {"txt2img": attn_t2i, "img2txt": attn_i2t}
