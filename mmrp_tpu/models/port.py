"""Pretrained weight porting: HF BERT/ClinicalBERT + Swin -> Flax modules.

The reference downloads timm/HF checkpoints at runtime (reference:
src/Helpers/model_utils.py:11-55, swinDownload.py:42-100, fusion.py:92-171)
— SURVEY hard-part #1 is loading those weights into the TPU-native modules
so parity metrics don't require retraining. These converters map a torch
``state_dict`` (from transformers.BertModel / transformers.SwinModel, same
tensor layout as Bio_ClinicalBERT and microsoft/swin-* checkpoints) into
the parameter pytrees of mmrp_tpu.models.text_encoder.TextEncoder and
mmrp_tpu.models.swin.SwinEncoder.

Layout notes (verified output-for-output in tests/test_port.py):
- torch Linear stores (out, in); Flax Dense kernels are (in, out);
- flax MultiHeadDotProductAttention splits heads in its kernels
  ((in, heads, head_dim) / (heads, head_dim, out));
- our Swin fuses q/k/v into one Dense — the converter concatenates;
- our PatchMerging concatenates 2x2 neighbors in row-major order
  [x(0,0), x(0,1), x(1,0), x(1,1)] while HF orders them
  [x(0,0), x(1,0), x(0,1), x(1,1)] — the reduction kernel's input groups
  are permuted accordingly.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w).T


def _as_np(state: Mapping) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


# ---------------------------------------------------------------------------
# BERT
# ---------------------------------------------------------------------------


def convert_hf_bert(state_dict: Mapping, num_layers: int) -> Dict:
    """HF BertModel state_dict -> TextEncoder params['params'] subtree.
    (No head count needed: q/k/v kernels stay 2D — the head split is a
    runtime reshape in the encoder, not a parameter layout.)"""
    sd = _as_np(state_dict)
    pfx = "bert." if any(k.startswith("bert.") for k in sd) else ""

    def attn_in(name):  # torch Linear (out, in) -> 2D (in, out) kernel
        return {"kernel": _t(sd[f"{name}.weight"]), "bias": sd[f"{name}.bias"]}

    params: Dict = {
        "embeddings": {
            "word": {"embedding": sd[f"{pfx}embeddings.word_embeddings.weight"]},
            "position": {"embedding": sd[f"{pfx}embeddings.position_embeddings.weight"]},
            "token_type": {"embedding": sd[f"{pfx}embeddings.token_type_embeddings.weight"]},
            "LayerNorm_0": {
                "scale": sd[f"{pfx}embeddings.LayerNorm.weight"],
                "bias": sd[f"{pfx}embeddings.LayerNorm.bias"],
            },
        }
    }
    for i in range(num_layers):
        lp = f"{pfx}encoder.layer.{i}"
        params[f"layer{i}"] = {
            "attention": {
                "query": attn_in(f"{lp}.attention.self.query"),
                "key": attn_in(f"{lp}.attention.self.key"),
                "value": attn_in(f"{lp}.attention.self.value"),
                "out": attn_in(f"{lp}.attention.output.dense"),
            },
            "attn_norm": {
                "scale": sd[f"{lp}.attention.output.LayerNorm.weight"],
                "bias": sd[f"{lp}.attention.output.LayerNorm.bias"],
            },
            "ffn_in": {
                "kernel": _t(sd[f"{lp}.intermediate.dense.weight"]),
                "bias": sd[f"{lp}.intermediate.dense.bias"],
            },
            "ffn_out": {
                "kernel": _t(sd[f"{lp}.output.dense.weight"]),
                "bias": sd[f"{lp}.output.dense.bias"],
            },
            "ffn_norm": {
                "scale": sd[f"{lp}.output.LayerNorm.weight"],
                "bias": sd[f"{lp}.output.LayerNorm.bias"],
            },
        }
    return params


# ---------------------------------------------------------------------------
# Swin
# ---------------------------------------------------------------------------


def convert_hf_swin(state_dict: Mapping, depths) -> Dict:
    """HF SwinModel state_dict -> SwinEncoder params['params'] subtree.
    (Head counts live in the rel_bias_table columns, copied verbatim;
    qkv kernels stay 2D, so no head arg is needed.)"""
    sd = _as_np(state_dict)
    pfx = "swin." if any(k.startswith("swin.") for k in sd) else ""

    params: Dict = {
        "patch_embed": {
            "proj": {
                # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
                "kernel": np.transpose(
                    sd[f"{pfx}embeddings.patch_embeddings.projection.weight"],
                    (2, 3, 1, 0),
                ),
                "bias": sd[f"{pfx}embeddings.patch_embeddings.projection.bias"],
            },
            "LayerNorm_0": {
                "scale": sd[f"{pfx}embeddings.norm.weight"],
                "bias": sd[f"{pfx}embeddings.norm.bias"],
            },
        },
        "norm": {
            "scale": sd[f"{pfx}layernorm.weight"],
            "bias": sd[f"{pfx}layernorm.bias"],
        },
    }

    for s, depth in enumerate(depths):
        for b in range(depth):
            lp = f"{pfx}encoder.layers.{s}.blocks.{b}"
            q = _t(sd[f"{lp}.attention.self.query.weight"])
            k = _t(sd[f"{lp}.attention.self.key.weight"])
            v = _t(sd[f"{lp}.attention.self.value.weight"])
            qb = sd[f"{lp}.attention.self.query.bias"]
            kb = sd[f"{lp}.attention.self.key.bias"]
            vb = sd[f"{lp}.attention.self.value.bias"]
            params[f"stage{s}_block{b}"] = {
                "LayerNorm_0": {
                    "scale": sd[f"{lp}.layernorm_before.weight"],
                    "bias": sd[f"{lp}.layernorm_before.bias"],
                },
                "attn": {
                    "rel_bias_table": sd[
                        f"{lp}.attention.self.relative_position_bias_table"
                    ],
                    "qkv": {
                        "kernel": np.concatenate([q, k, v], axis=1),
                        "bias": np.concatenate([qb, kb, vb]),
                    },
                    "proj": {
                        "kernel": _t(sd[f"{lp}.attention.output.dense.weight"]),
                        "bias": sd[f"{lp}.attention.output.dense.bias"],
                    },
                },
                "LayerNorm_1": {
                    "scale": sd[f"{lp}.layernorm_after.weight"],
                    "bias": sd[f"{lp}.layernorm_after.bias"],
                },
                "mlp": {
                    "Dense_0": {
                        "kernel": _t(sd[f"{lp}.intermediate.dense.weight"]),
                        "bias": sd[f"{lp}.intermediate.dense.bias"],
                    },
                    "Dense_1": {
                        "kernel": _t(sd[f"{lp}.output.dense.weight"]),
                        "bias": sd[f"{lp}.output.dense.bias"],
                    },
                },
            }
        dkey = f"{pfx}encoder.layers.{s}.downsample"
        if f"{dkey}.reduction.weight" in sd:
            red = _t(sd[f"{dkey}.reduction.weight"])  # (4C, 2C) in flax layout
            C = red.shape[0] // 4
            # HF neighbor order [x00, x10, x01, x11] -> ours [x00, x01, x10, x11]
            perm = np.concatenate(
                [np.arange(0, C), np.arange(2 * C, 3 * C),
                 np.arange(C, 2 * C), np.arange(3 * C, 4 * C)]
            )
            nscale = sd[f"{dkey}.norm.weight"][perm]
            nbias = sd[f"{dkey}.norm.bias"][perm]
            params[f"merge{s}"] = {
                "LayerNorm_0": {"scale": nscale, "bias": nbias},
                "Dense_0": {"kernel": red[perm]},
            }
    return params


# ---------------------------------------------------------------------------
# MedCLIP (vision tower = HF SwinModel + bias-free projection head)
# ---------------------------------------------------------------------------


def convert_medclip_vit(
    state_dict: Mapping,
    depths=(2, 2, 6, 2),
) -> Dict:
    """MedCLIP-ViT checkpoint -> MedCLIPVisionEncoder params['params'].

    MedCLIP's ``MedCLIPVisionModelViT`` wraps an HF SwinModel as
    ``vision_model.model.*`` plus ``vision_model.projection_head.weight``
    (Linear 768->512, no bias) — reference consumption at
    src/Model/fusion.py:131-171. Accepts a full MedCLIPModel state_dict
    (``vision_model.`` prefix), a bare vision-model dict (``model.`` +
    ``projection_head.``), and the text branch is ignored.
    """
    sd = _as_np(state_dict)
    pfx = "vision_model." if any(k.startswith("vision_model.") for k in sd) else ""
    swin_sd = {
        k[len(pfx) + len("model."):]: v
        for k, v in sd.items()
        if k.startswith(f"{pfx}model.")
    }
    if not swin_sd:
        raise KeyError(
            "no vision tower found: expected '[vision_model.]model.*' keys"
        )
    return {
        "swin": convert_hf_swin(swin_sd, depths),
        "projection": {"kernel": _t(sd[f"{pfx}projection_head.weight"])},
    }


# ---------------------------------------------------------------------------
# Bootstrap helpers: load a checkpoint from disk + infer module configs
# (the pipeline wiring for reference fusion.py:92-99, 313-325 — pretrained
# backbones feeding the joint model)
# ---------------------------------------------------------------------------


def load_pretrained_state(path: str) -> Dict[str, np.ndarray]:
    """Load a torch state dict from an HF model directory/name or a raw
    state-dict file (.pt/.bin/.pth/.safetensors) -> numpy dict."""
    import os

    if os.path.splitext(str(path))[1] in (".pt", ".bin", ".pth"):
        import torch

        return _as_np(torch.load(path, map_location="cpu", weights_only=True))
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(str(path))
    from transformers import AutoModel

    return _as_np(AutoModel.from_pretrained(str(path)).state_dict())


def text_config_from_state(sd: Mapping, num_heads: int = 0, **kw):
    """Infer a TextConfig matching an HF BertModel state dict (so the joint
    model's text tower gets built at the ported checkpoint's dims).

    num_heads is not recoverable from tensor shapes; default hidden//64
    (every BERT-family release uses 64-dim heads)."""
    from mmrp_tpu.models.text_encoder import TextConfig

    sd = _as_np(sd)
    pfx = "bert." if any(k.startswith("bert.") for k in sd) else ""
    emb = sd[f"{pfx}embeddings.word_embeddings.weight"]
    layers = {
        int(k.split(".")[2 if not pfx else 3])
        for k in sd
        if k.startswith(f"{pfx}encoder.layer.")
    }
    n_layers = max(layers) + 1
    hidden = emb.shape[1]
    inter = sd[f"{pfx}encoder.layer.0.intermediate.dense.weight"].shape[0]
    return TextConfig(
        vocab_size=emb.shape[0],
        hidden_dim=hidden,
        num_layers=n_layers,
        num_heads=num_heads or max(1, hidden // 64),
        intermediate_dim=inter,
        max_positions=sd[f"{pfx}embeddings.position_embeddings.weight"].shape[0],
        # readable from the checkpoint: a type_vocab_size != 2 default
        # would otherwise build a mismatched token_type table that the
        # shape-unchecked warm start only surfaces as an optax tree
        # mismatch on the first update
        type_vocab_size=sd[
            f"{pfx}embeddings.token_type_embeddings.weight"
        ].shape[0],
        **kw,
    )


def swin_layout_from_state(sd: Mapping):
    """Infer (depths, num_heads) from an HF SwinModel state dict: depths by
    counting blocks per encoder stage, heads from each stage's relative-
    position-bias table (num_heads columns)."""
    sd = _as_np(sd)
    pfx = "swin." if any(k.startswith("swin.") for k in sd) else ""
    stage_blocks: Dict[int, int] = {}
    heads: Dict[int, int] = {}
    for k, v in sd.items():
        if not k.startswith(f"{pfx}encoder.layers."):
            continue
        rest = k[len(f"{pfx}encoder.layers."):]
        parts = rest.split(".")
        s = int(parts[0])
        if parts[1] == "blocks":
            b = int(parts[2])
            stage_blocks[s] = max(stage_blocks.get(s, 0), b + 1)
            if rest.endswith("relative_position_bias_table"):
                heads[s] = v.shape[1]
    n_stages = max(stage_blocks) + 1
    depths = tuple(stage_blocks[s] for s in range(n_stages))
    num_heads = tuple(heads[s] for s in range(n_stages))
    return depths, num_heads


