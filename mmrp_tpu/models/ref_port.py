"""Reference-semantics fusion stack: faithful JAX port + weight converter.

The production model (models/multimodal.py) is a TPU-first REDESIGN of the
reference's fusion architecture (pre-LN enhancers, joint-dim fusion, fused
kernels). This module is the complementary PARITY path: it reproduces the
reference's exact eval-time math —

- ``PreFusionEnhancer``  (reference src/Model/fusion.py:20-35):
  ``x += pos[:L]; x2 = MHA(x, x, x); out = LN(alpha * x + x2)``
- ``CrossModalFusion``   (src/Model/fusion.py:334-471): bidirectional
  cross-attention at raw backbone dims with separate q/k/v projections
  into joint_dim, residual projections, ln_img/ln_txt, the
  ``[x1, patches_fused, x2]`` output sequence, and the cls-only
  ``comb_mlp`` pooled variant;
- the model fusion loop (src/Model/model.py:375-459): per-layer fusion →
  dropout → PositionalEncoding → shared self-attn → mean-pool →
  norm1/StochasticDepth residual with a learnable alpha → norm2 + FFN
  (shared or per-layer MultiHeadMLP) → adapter → joint_emb; plus the
  image-only / text-only modes (model.py:461-479) and the 4x-wide MLP
  classifier (model.py:271-277)

— so that a checkpoint trained with the reference's torch code can be
converted (``convert_reference_state``) and served from JAX with
matching joint embeddings / logits / attention maps, and so that
tests/test_reference_parity.py can pin every semantics decision against
the reference's ACTUAL torch modules (imported with third-party stubs).

Eval semantics only: dropout and StochasticDepth are identity (torch
``.eval()``); there is no training path here — training happens in the
TPU-native model. torch's exact (erf) GELU is used throughout, NOT the
tanh approximation.

Known reference quirk reproduced faithfully rather than "fixed": the
model-level ``use_cls_only=True`` path crashes in the reference
(``fused_out[:, 0, :]`` on a 2-D tensor, model.py:428-429), so
``reference_forward`` rejects it too; the fusion-module cls-only variant
(fusion.py:457-466) IS supported and tested.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

_LN_EPS = 1e-5  # torch nn.LayerNorm default


def _ln(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + _LN_EPS) * p["weight"] + p["bias"]


def _linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["weight"] + p["bias"]


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)  # torch nn.GELU default


def _mha(p: Params, q_in: jnp.ndarray, kv_in: jnp.ndarray,
         num_heads: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """torch nn.MultiheadAttention self/cross attention with a SHARED
    key=value input (``attn(q, kv, kv)``)."""
    return _mha_kv(p, q_in, kv_in, kv_in, num_heads)


def _mha_kv(p: Params, q_in: jnp.ndarray, k_in: jnp.ndarray,
            v_in: jnp.ndarray, num_heads: int
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """torch nn.MultiheadAttention (batch_first, eval) with DISTINCT
    query/key/value inputs — torch applies its own packed in-proj on top
    of whatever the caller passes (fusion.py:428,434 passes pre-projected
    Q/K/V Linears, and torch still runs wq/wk/wv over them). Returns
    (out, head-AVERAGED weights (B, Lq, Lk)) — torch's default
    ``average_attn_weights=True``."""
    D = q_in.shape[-1]
    H = num_heads
    d = D // H
    B, Lq, _ = q_in.shape
    Lk = k_in.shape[1]
    q = (q_in @ p["wq"] + p["bq"]).reshape(B, Lq, H, d)
    k = (k_in @ p["wk"] + p["bk"]).reshape(B, Lk, H, d)
    v = (v_in @ p["wv"] + p["bv"]).reshape(B, Lk, H, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(d, q.dtype)
    )
    attn = jax.nn.softmax(scores, axis=-1)  # (B, H, Lq, Lk)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, Lq, D)
    out = ctx @ p["wo"] + p["bo"]
    return out, attn.mean(axis=1)


def _enhancer(p: Params, x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """PreFusionEnhancer eval forward (fusion.py:30-35)."""
    L = x.shape[1]
    x = x + p["pos_embed"][:, :L]
    x2, _ = _mha(p["attn"], x, x, num_heads)
    return _ln(p["norm1"], p["alpha"] * x + x2)


def cross_modal_fusion(
    p: Params,
    img_global: jnp.ndarray,   # (B, img_dim)
    img_patch: jnp.ndarray,    # (B, Np, img_dim)
    txt_feats: Optional[jnp.ndarray],  # (B, L, txt_dim) | None
    num_heads: int,
    use_cls_only: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """CrossModalFusion eval forward (fusion.py:390-471).

    Returns (seq (B, 1+Np+1, joint) | fused_vec (B, joint) if cls-only,
    attn dict {txt2img, img2txt} with head-averaged weights)."""
    if txt_feats is None:
        # learnable default pooled text token (fusion.py:377-380,406-409)
        B = img_global.shape[0] if img_global is not None else img_patch.shape[0]
        txt_feats = jnp.broadcast_to(
            p["default_txt_token"],
            (B,) + tuple(p["default_txt_token"].shape[1:]),
        )
    txt_feats = _enhancer(p["txt_self_attn"], txt_feats, num_heads)
    img_global = _enhancer(
        p["img_global_self_attn"], img_global[:, None, :], num_heads
    )[:, 0]
    img_patch = _enhancer(p["img_patch_self_attn"], img_patch, num_heads)

    txt_pooled = txt_feats[:, 0:1] if use_cls_only else txt_feats

    q_txt = _linear(p["query_txt"], txt_pooled)
    k_img = _linear(p["key_img"], img_patch)
    v_img = _linear(p["value_img"], img_patch)
    att_t2i, w_t2i = _mha_kv(p["attn_txt2img"], q_txt, k_img, v_img, num_heads)

    q_img = _linear(p["query_img"], img_patch)
    k_txt = _linear(p["key_txt"], txt_pooled)
    v_txt = _linear(p["value_txt"], txt_pooled)
    att_i2t, w_i2t = _mha_kv(p["attn_img2txt"], q_img, k_txt, v_txt, num_heads)

    patches_fused = _linear(p["img_patch_proj"], img_patch) + att_i2t
    x1 = _ln(
        p["ln_img"],
        _linear(p["img_global_proj"], img_global) + att_t2i.mean(axis=1),
    )
    txt_p = _linear(p["txt_proj"], txt_feats)
    x2 = _ln(p["ln_txt"], txt_p[:, 0] + att_i2t.mean(axis=1))

    attn = {"txt2img": w_t2i, "img2txt": w_i2t}
    if use_cls_only:
        patch_avg = patches_fused.mean(axis=1)
        cat = jnp.concatenate([x1, patch_avg, x2], axis=1)
        h = _gelu(_linear(p["comb_mlp_0"], cat))
        fused_vec = _linear(p["comb_mlp_3"], h)
        attn["patch_avg"] = patch_avg
        return fused_vec, attn

    seq = jnp.concatenate(
        [x1[:, None, :], patches_fused, x2[:, None, :]], axis=1
    )
    return seq, attn


def _mlp2(p0: Params, p1: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Linear -> GELU -> Linear (MultiHeadMLP model.py:61-75, adapters
    model.py:262-268, comb_mlp fusion.py:381-386 — dropout eval = id)."""
    return _linear(p1, _gelu(_linear(p0, x)))


def reference_forward(
    params: Params,
    img_global: Optional[jnp.ndarray],
    img_patches: Optional[jnp.ndarray],
    txt_feats: Optional[jnp.ndarray],
    *,
    num_heads: int,
    model_type: str = "multimodal",
    use_cls_only: bool = False,
    use_shared_ffn: bool = True,
    return_attention: bool = False,
) -> Dict[str, Any]:
    """MultiModalRetrievalModel.forward (model.py:330-489) from backbone
    features onward, eval mode. Returns the reference's output dict
    {joint_emb, img_emb, txt_emb, logits, attn}."""
    if use_cls_only and model_type == "multimodal":
        raise NotImplementedError(
            "reference model.py:428-429 crashes for use_cls_only=True "
            "(2-D index on fused_vec); not a supported reference config"
        )
    attn_weights: Dict[str, jnp.ndarray] = {}

    img_emb = (
        _linear(params["img_proj"], img_global)
        if img_global is not None
        else None
    )
    if txt_feats is not None:
        txt_pool = txt_feats[:, 0] if use_cls_only else txt_feats.mean(axis=1)
        txt_emb = _linear(params["txt_proj"], txt_pool)
    else:
        txt_emb = None

    if model_type == "multimodal":
        joint_emb = None
        for i, fp in enumerate(params["fusion_layers"]):
            fused_out, attn_from_fusion = cross_modal_fusion(
                fp, img_global, img_patches, txt_feats, num_heads,
                use_cls_only=use_cls_only,
            )
            seq = fused_out  # (B, L, D); dropout eval = id
            # PositionalEncoding (model.py:91-107): x + pe[:, :L]
            pe = params["pos_encoder_pe"]
            if seq.shape[1] > pe.shape[1]:
                raise ValueError("sequence longer than pos encoder table")
            seq = seq + pe[:, : seq.shape[1]]
            seq_out, comb_w = _mha(params["self_attn"], seq, seq, num_heads)
            if return_attention:
                attn_weights[f"layer_{i}_comb"] = comb_w
                attn_weights[f"layer_{i}_txt2img"] = attn_from_fusion["txt2img"]
                attn_weights[f"layer_{i}_img2txt"] = attn_from_fusion["img2txt"]
            fused = seq_out.mean(axis=1)
            if i == 0:
                x = fused
            else:
                x = _ln(params["norm1_layers"][i], joint_emb)
                # StochasticDepth eval = x + residual (model.py:82-84)
                x = x + params["alpha"] * fused
            x_ffn = _ln(params["norm2_layers"][i], x)
            ffn = (
                params["shared_ffn"]
                if use_shared_ffn
                else params["ffn"][i]
            )
            x = x + _mlp2(ffn["linear1"], ffn["linear2"], x_ffn)
            ad = params["adapters"][i]
            x = x + _mlp2(ad["0"], ad["2"], x)
            joint_emb = x
    elif model_type == "image":
        g = _linear(params["img_proj"], img_global)
        pch = _linear(params["img_proj"], img_patches)
        seq = jnp.concatenate([g[:, None, :], pch], axis=1)
        pooled = seq.mean(axis=1)
        ffn = params["shared_ffn"] if use_shared_ffn else params["ffn"][0]
        joint_emb = _mlp2(ffn["linear1"], ffn["linear2"], pooled)
    elif model_type == "text":
        x = txt_feats[:, 0] if use_cls_only else txt_feats.mean(axis=1)
        x = _linear(params["txt_proj"], x)
        ffn = params["shared_ffn"] if use_shared_ffn else params["ffn"][0]
        joint_emb = _mlp2(ffn["linear1"], ffn["linear2"], x)
    else:
        raise ValueError(model_type)

    # classifier (model.py:271-277): Linear -> GELU -> Linear (dropouts id)
    h = _gelu(_linear(params["classifier_0"], joint_emb))
    logits = _linear(params["classifier_3"], h)
    return {
        "joint_emb": joint_emb,
        "img_emb": img_emb,
        "txt_emb": txt_emb,
        "logits": logits,
        "attn": attn_weights if return_attention else None,
    }


# ---------------------------------------------------------------------------
# torch state_dict -> params converter
# ---------------------------------------------------------------------------


def _t(v) -> np.ndarray:
    arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return arr.astype(np.float32)


def _conv_linear(sd: Dict, prefix: str) -> Params:
    return {
        "weight": _t(sd[f"{prefix}.weight"]).T,
        "bias": _t(sd[f"{prefix}.bias"]),
    }


def _conv_ln(sd: Dict, prefix: str) -> Params:
    return {
        "weight": _t(sd[f"{prefix}.weight"]),
        "bias": _t(sd[f"{prefix}.bias"]),
    }


def _conv_mha(sd: Dict, prefix: str) -> Params:
    """torch MultiheadAttention: packed in_proj (3D, D) + out_proj."""
    w = _t(sd[f"{prefix}.in_proj_weight"])
    b = _t(sd[f"{prefix}.in_proj_bias"])
    D = w.shape[0] // 3
    return {
        "wq": w[:D].T, "bq": b[:D],
        "wk": w[D : 2 * D].T, "bk": b[D : 2 * D],
        "wv": w[2 * D :].T, "bv": b[2 * D :],
        "wo": _t(sd[f"{prefix}.out_proj.weight"]).T,
        "bo": _t(sd[f"{prefix}.out_proj.bias"]),
    }


def _conv_enhancer(sd: Dict, prefix: str) -> Params:
    return {
        "attn": _conv_mha(sd, f"{prefix}.self_attn"),
        "norm1": _conv_ln(sd, f"{prefix}.norm1"),
        "pos_embed": _t(sd[f"{prefix}.pos_embed"]),
        "alpha": _t(sd[f"{prefix}.alpha"]),
    }


def convert_fusion_state(sd: Dict, prefix: str = "") -> Params:
    """CrossModalFusion.state_dict() -> params for cross_modal_fusion."""
    p = prefix
    return {
        "txt_self_attn": _conv_enhancer(sd, f"{p}txt_self_attn"),
        "img_patch_self_attn": _conv_enhancer(sd, f"{p}img_patch_self_attn"),
        "img_global_self_attn": _conv_enhancer(sd, f"{p}img_global_self_attn"),
        "ln_img": _conv_ln(sd, f"{p}ln_img"),
        "ln_txt": _conv_ln(sd, f"{p}ln_txt"),
        "query_txt": _conv_linear(sd, f"{p}query_txt"),
        "key_img": _conv_linear(sd, f"{p}key_img"),
        "value_img": _conv_linear(sd, f"{p}value_img"),
        "attn_txt2img": _conv_mha(sd, f"{p}attn_txt2img"),
        "query_img": _conv_linear(sd, f"{p}query_img"),
        "key_txt": _conv_linear(sd, f"{p}key_txt"),
        "value_txt": _conv_linear(sd, f"{p}value_txt"),
        "attn_img2txt": _conv_mha(sd, f"{p}attn_img2txt"),
        "default_txt_token": _t(sd[f"{p}default_txt_token"]),
        "txt_proj": _conv_linear(sd, f"{p}txt_proj"),
        "img_patch_proj": _conv_linear(sd, f"{p}img_patch_proj"),
        "img_global_proj": _conv_linear(sd, f"{p}img_global_proj"),
        "comb_mlp_0": _conv_linear(sd, f"{p}comb_mlp.0"),
        "comb_mlp_3": _conv_linear(sd, f"{p}comb_mlp.3"),
    }


def convert_reference_state(
    sd: Dict, num_fusion_layers: int, use_shared_ffn: bool = True
) -> Params:
    """MultiModalRetrievalModel.state_dict() -> params for
    reference_forward. Backbone keys (``backbones.*``) are ignored here —
    backbone conversion lives in models/port.py (BERT/Swin/MedCLIP
    converters, equivalence-tested vs HF torch in tests/test_port.py)."""
    params: Params = {
        "fusion_layers": [
            convert_fusion_state(sd, f"fusion_layers.{i}.")
            for i in range(num_fusion_layers)
        ],
        "self_attn": _conv_mha(sd, "self_attn"),
        "norm1_layers": [
            _conv_ln(sd, f"norm1_layers.{i}")
            for i in range(num_fusion_layers)
        ],
        "norm2_layers": [
            _conv_ln(sd, f"norm2_layers.{i}")
            for i in range(num_fusion_layers)
        ],
        "alpha": _t(sd["alpha"]),
        "pos_encoder_pe": _t(sd["pos_encoder.pe"]),
        "img_proj": _conv_linear(sd, "img_proj"),
        "txt_proj": _conv_linear(sd, "txt_proj"),
        "adapters": [
            {
                "0": _conv_linear(sd, f"adapters.{i}.0"),
                "2": _conv_linear(sd, f"adapters.{i}.2"),
            }
            for i in range(num_fusion_layers)
        ],
        "classifier_0": _conv_linear(sd, "classifier.0"),
        "classifier_3": _conv_linear(sd, "classifier.3"),
    }
    if use_shared_ffn:
        params["shared_ffn"] = {
            "linear1": _conv_linear(sd, "shared_ffn.linear1"),
            "linear2": _conv_linear(sd, "shared_ffn.linear2"),
        }
    else:
        params["ffn"] = [
            {
                "linear1": _conv_linear(sd, f"ffn.{i}.linear1"),
                "linear2": _conv_linear(sd, f"ffn.{i}.linear2"),
            }
            for i in range(num_fusion_layers)
        ]
    return params
