"""BERT-family text encoder (Flax linen) for radiology reports.

The reference loads ClinicalBERT through HuggingFace and takes
``last_hidden_state``, truncated to the model's max positions (reference:
src/Model/fusion.py:140-156, 313-325). This is a from-scratch Flax encoder
with the same architecture family (learned word+position embeddings,
post-LN transformer stack, padding-mask attention) so pretrained
ClinicalBERT weights can be mapped in when available, while the framework
remains fully functional offline with its own WordPiece vocab.

Presets: ``clinicalbert`` (12x768, vocab 28996) and ``small`` (4x256) —
the latter keeps unit tests and the single-chip bench light.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 28996
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_dim: int = 3072
    max_positions: int = 512
    dropout: float = 0.1
    type_vocab_size: int = 2
    use_fused_ffn: bool = False  # Pallas FFN kernel (slower at BERT shapes)
    use_fused_attention: bool = True  # Pallas LN+qkv+attn+proj kernel (TPU)
    # serving quantization (ops/quant.py): "int8" = all GEMMs W8A8 (XLA
    # path); "int8_ffn" = fused bf16 attention kernel + W8A8 FFN;
    # "int8_kernel" = int8 GEMMs INSIDE the fused attention kernel + W8A8
    # FFN. Pick by measurement — see tools/ab_bench.py bert variants.
    quant: str = "none"
    remat: bool = False  # jax.checkpoint per layer: FLOPs for activation mem

    @staticmethod
    def clinicalbert(**kw) -> "TextConfig":
        return TextConfig(**kw)

    @staticmethod
    def small(**kw) -> "TextConfig":
        defaults = dict(
            vocab_size=8192,
            hidden_dim=256,
            num_layers=4,
            num_heads=4,
            intermediate_dim=1024,
            max_positions=512,
        )
        defaults.update(kw)
        return TextConfig(**defaults)

    @staticmethod
    def from_name(name: str, **kw) -> "TextConfig":
        name = name.lower()
        if name in ("clinicalbert", "bert", "bert_base"):
            return TextConfig.clinicalbert(**kw)
        if name in ("small", "bert_small"):
            return TextConfig.small(**kw)
        raise ValueError(f"unknown text encoder preset {name!r}")


class BertEmbeddings(nn.Module):
    config: TextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, deterministic: bool = True):
        cfg = self.config
        B, L = input_ids.shape
        word = nn.Embed(cfg.vocab_size, cfg.hidden_dim, dtype=self.dtype, name="word")(
            input_ids
        )
        pos_ids = jnp.arange(L)[None, :]
        pos = nn.Embed(
            cfg.max_positions, cfg.hidden_dim, dtype=self.dtype, name="position"
        )(pos_ids)
        tok_type = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_dim, dtype=self.dtype, name="token_type"
        )(jnp.zeros_like(input_ids))
        x = word + pos + tok_type
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return nn.Dropout(cfg.dropout)(x, deterministic=deterministic)


class BertLayer(nn.Module):
    config: TextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_mask, deterministic: bool = True):
        """x: (B, L, D); key_mask: (B, L) ADDITIVE f32 (0 valid / -1e9 pad)."""
        from mmrp_tpu.models.layers import (
            DenseParams, LnParams, MhaParams, ln_f32,
        )

        cfg = self.config
        (wq, bq), (wk, bk), (wv, bv), (wo, bo) = MhaParams(
            cfg.hidden_dim, name="attention")()
        ln_s, ln_b = LnParams(name="attn_norm")(cfg.hidden_dim)

        # Fused Pallas path: qkv + attention + proj + residual + post-LN in
        # VMEM (ops/fused_attention.py) — every GEMM here is HBM-bound on the
        # target chip (docs/ROOFLINE.md), so the win is byte elimination.
        # Training with dropout>0 takes the XLA path (kernel has no interior
        # dropout); gradients through the kernel come from its custom VJP.
        # quant modes (serving): "int8" = every GEMM W8A8 on the XLA path;
        # "int8_ffn" = fused bf16 attention kernel + W8A8 FFN — the measured
        # optimum (attention is BW-bound -> byte elimination wins; the FFN is
        # FLOP-bound -> cheaper MACs win). See tools/ab_bench.py.
        # Quantization only when deterministic: jnp.round/int8 casts in
        # quant_dot have zero gradient, so the XLA int8 path would silently
        # break training even at dropout=0 (the dropout==0 escape is only
        # valid for the fused kernels, whose custom VJPs are full precision).
        quant_ok = deterministic
        quant = cfg.quant == "int8" and quant_ok
        quant_ffn = cfg.quant in ("int8", "int8_ffn", "int8_kernel") and quant_ok
        quant_kernel = cfg.quant == "int8_kernel" and quant_ok
        use_fused = (
            cfg.use_fused_attention
            and not quant
            and (deterministic or cfg.dropout == 0.0)
            # fused_attention requires Nq % 8 == 0 (sublane-aligned in-kernel
            # reshape); fall back to the XLA path for odd sequence lengths
            and x.shape[1] % 8 == 0
            and (jax.default_backend() == "tpu"
                 or __import__("os").environ.get("MMRP_FORCE_PALLAS") == "1")
        )
        if use_fused:
            from mmrp_tpu.ops.fused_attention import fused_attention

            x = fused_attention(
                x, ln_s.astype(jnp.float32), ln_b.astype(jnp.float32),
                wq.astype(self.dtype), bq.astype(self.dtype),
                wk.astype(self.dtype), bk.astype(self.dtype),
                wv.astype(self.dtype), bv.astype(self.dtype),
                wo.astype(self.dtype), bo.astype(self.dtype),
                key_mask=key_mask, num_heads=cfg.num_heads, ln_mode="post",
                quant=quant_kernel,
            )
        else:
            h = cfg.num_heads
            B, L, D = x.shape
            d = D // h
            if quant:
                from mmrp_tpu.ops.quant import quant_dot_multi

                q, k, v = quant_dot_multi(
                    x, [(wq, bq), (wk, bk), (wv, bv)])
                q, k, v = (t.reshape(B, L, h, d) for t in (q, k, v))
            else:
                q = (x @ wq.astype(x.dtype) + bq.astype(x.dtype)).reshape(B, L, h, d)
                k = (x @ wk.astype(x.dtype) + bk.astype(x.dtype)).reshape(B, L, h, d)
                v = (x @ wv.astype(x.dtype) + bv.astype(x.dtype)).reshape(B, L, h, d)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * d**-0.5
            scores = scores + key_mask.astype(jnp.float32)[:, None, None, :]
            p = jax.nn.softmax(scores, axis=-1)
            p = nn.Dropout(cfg.dropout)(p, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", p.astype(x.dtype), v,
                             preferred_element_type=jnp.float32)
            ctx = ctx.astype(x.dtype).reshape(B, L, D)
            if quant:
                from mmrp_tpu.ops.quant import quant_dot

                y = quant_dot(ctx, wo, bo)
            else:
                y = ctx @ wo.astype(x.dtype) + bo.astype(x.dtype)
            y = nn.Dropout(cfg.dropout)(y, deterministic=deterministic)
            x = ln_f32(x + y, ln_s, ln_b, self.dtype)

        # FFN params declared explicitly: fused Pallas kernel (inference) and
        # autodiff XLA path share one checkpoint tree (port.py unchanged)
        w1, b1 = DenseParams(cfg.intermediate_dim, name="ffn_in")(cfg.hidden_dim)
        w2, b2 = DenseParams(cfg.hidden_dim, name="ffn_out")(cfg.intermediate_dim)
        ln_s, ln_b = LnParams(name="ffn_norm")(cfg.hidden_dim)

        # off by default: the BERT FFN is MXU-bound at these shapes and the
        # fused kernel measured slower than XLA's pipelined GEMMs
        if (
            cfg.use_fused_ffn
            and deterministic
            and jax.default_backend() == "tpu"
        ):
            from mmrp_tpu.ops.fused_mlp import fused_ln_mlp_residual

            B, L, D = x.shape
            out = fused_ln_mlp_residual(
                x.reshape(B * L, D),
                ln_s.astype(jnp.float32), ln_b.astype(jnp.float32),
                w1.astype(self.dtype), b1.astype(self.dtype),
                w2.astype(self.dtype), b2.astype(self.dtype),
                post_ln=True,
            )
            return out.reshape(B, L, D)

        if quant_ffn:
            from mmrp_tpu.ops.quant import quant_dot

            y = jax.nn.gelu(quant_dot(x, w1, b1))
            y = quant_dot(y, w2, b2)
        else:
            y = jax.nn.gelu(x @ w1.astype(x.dtype) + b1.astype(x.dtype))
            y = y @ w2.astype(x.dtype) + b2.astype(x.dtype)
        y = nn.Dropout(cfg.dropout)(y, deterministic=deterministic)
        return ln_f32(x + y, ln_s, ln_b, self.dtype)


class TextEncoder(nn.Module):
    """-> dict(tokens (B, L, D), cls (B, D))."""

    config: TextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, input_ids, attention_mask, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        # truncate to max positions, like the reference (fusion.py:313-320)
        input_ids = input_ids[:, : cfg.max_positions]
        attention_mask = attention_mask[:, : cfg.max_positions]

        x = BertEmbeddings(cfg, dtype=self.dtype, name="embeddings")(
            input_ids, deterministic
        )
        # (B, Lk) ADDITIVE key mask (0 valid / -1e9 pad) — the compact form
        # both the fused kernel and the XLA path consume
        key_mask = jnp.where(attention_mask > 0, 0.0, -1e9).astype(jnp.float32)
        # static_argnums: module instance is arg 0, `deterministic` is 3
        layer_cls = nn.remat(BertLayer, static_argnums=(3,)) if cfg.remat \
            else BertLayer
        for i in range(cfg.num_layers):
            x = layer_cls(cfg, dtype=self.dtype, name=f"layer{i}")(
                x, key_mask, deterministic
            )
        return {"tokens": x, "cls": x[:, 0, :]}
