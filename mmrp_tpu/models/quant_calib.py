"""Post-training calibration for the static W8A8 Swin serving path.

The dynamic W8A8 scheme (ops/quant.py) re-quantizes weights inside the
whole-block kernel per grid program and abs-max-scans every activation —
measured as a +9.5% LOSS on the Swin-B encoder (docs/ROOFLINE.md §6).
The static scheme removes both passes: weights are pre-quantized
per-out-channel OUTSIDE the kernel (models/swin.py int8_static branch),
and activations use per-tensor scales calibrated here — the abs-max of
each GEMM's input over a calibration set, folded into the kernel as
compile-time constants.

Calibration statistics are captured via flax ``sow`` hooks in the plain
XLA formulation of the block (models/swin.py: qkv_in/proj_in/mlp1_in/
mlp2_in abs-max) — mathematically the same intermediates the fused kernel
quantizes (oracle: ops/fused_swin_block.xla_equivalent(return_act_amax=
True); equivalence asserted in tests/test_quant_static.py).

Reference parity: the reference serves through torch AMP autocast with no
quantization (src/Trainner/train.py); this module is the TPU-native
replacement that targets the v5e's 2x int8 MXU rate. Fidelity is gated at
flagship widths in tests/test_quant_static.py (cosine > 0.995).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

AmaxTree = Tuple[Tuple[float, float, float, float], ...]

# sow names in GEMM order (qkv, proj, w1, w2) — the order the kernel's
# act_scales tuple is consumed in (ops/fused_swin_block._block_body)
_ATTN_KEYS = ("qkv_in_amax", "proj_in_amax")
_MLP_KEYS = ("mlp1_in_amax", "mlp2_in_amax")


def _unwrap(v):
    """sow stores either the reduced scalar or a tuple of values."""
    while isinstance(v, (tuple, list)):
        v = v[-1] if v else 0.0
    return float(np.asarray(v))


def _block_names(cfg) -> list:
    return [f"stage{s}_block{b}"
            for s, depth in enumerate(cfg.depths) for b in range(depth)]


def calibrate_swin_act_amax(cfg, params, images,
                            batch_size: int = 8) -> AmaxTree:
    """Run the plain-XLA Swin forward over ``images`` and return per-block
    (qkv_in, proj_in, mlp1_in, mlp2_in) activation abs-max tuples.

    cfg: the production SwinConfig (quant/use_pallas flags are overridden
    for the calibration pass). params: the Swin param subtree (same tree
    for all paths by construction). images: (N, H, W, 3) array or an
    iterable of batches.
    """
    from mmrp_tpu.models.swin import SwinEncoder, force_core

    calib_cfg = dataclasses.replace(
        cfg, use_pallas=False, pallas_stages=None, quant="none",
        act_amax=None, remat=False, drop_path_rate=0.0, dropout=0.0)
    model = SwinEncoder(calib_cfg, dtype=jnp.float32)

    @jax.jit
    def stats(p, x):
        # force_core(False): calibration must take the plain XLA
        # formulation where ALL four sow hooks live (trace-time context)
        with force_core(False):
            _, st = model.apply({"params": p}, x, True,
                                mutable=["intermediates"])
        return st["intermediates"]

    if hasattr(images, "shape") and getattr(images, "ndim", 0) == 4:
        n = images.shape[0]
        batches: Iterable = (
            images[i:i + batch_size] for i in range(0, n, batch_size))
    else:
        batches = images

    names = _block_names(calib_cfg)
    total = np.zeros((len(names), 4), np.float64)
    seen = 0
    for xb in batches:
        inter = jax.device_get(stats(params, jnp.asarray(xb)))
        for bi, name in enumerate(names):
            blk = inter[name]
            vals = [_unwrap(blk["attn"][k]) for k in _ATTN_KEYS] + \
                   [_unwrap(blk[k]) for k in _MLP_KEYS]
            total[bi] = np.maximum(total[bi], vals)
        seen += 1
    if seen == 0:
        raise ValueError("calibration set is empty")
    if not np.all(np.isfinite(total)) or np.any(total <= 0):
        raise ValueError(f"degenerate calibration stats: {total}")
    return tuple(tuple(float(v) for v in row) for row in total)


def save_act_amax(path: str, amax: AmaxTree) -> None:
    """Write the calibration artifact (atomic: write-then-rename)."""
    import os
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump({"format": "swin_act_amax_v1",
                   "blocks": [list(row) for row in amax]}, fh, indent=1)
    os.replace(tmp, path)


def load_act_amax(path: str) -> AmaxTree:
    with open(path) as fh:
        doc = json.load(fh)
    if doc.get("format") != "swin_act_amax_v1":
        raise ValueError(f"{path}: not a swin_act_amax_v1 artifact")
    return tuple(tuple(float(v) for v in row) for row in doc["blocks"])


def build_quant_cache(params) -> dict:
    """Pre-quantize every Swin block's GEMM weights ONCE, outside jit.

    The SwinBlock static-int8 branch quantizes inline when no cache is
    provided — XLA hoists that out of chained-scan loops (bench paths),
    but a dispatch-per-batch serving loop re-runs it every call (~2.6 ms
    at Swin-B widths: one VPU pass + int8 write over ~87 M weights).
    This walks the param tree, quantizes with the SAME ops/quant.py
    scheme, and returns a collection tree aligned with the model's module
    scopes, ready to pass as
    ``model.apply({"params": p, "quant_cache": cache}, ...)`` —
    api.py::serving_variables wires it automatically for serving.

    Returns {} when the tree contains no Swin blocks.
    """
    from mmrp_tpu.ops.quant import quantize_weight

    def is_block(node) -> bool:
        return (hasattr(node, "keys")
                and "attn" in node and "mlp" in node
                and hasattr(node["attn"], "keys")
                and "qkv" in node["attn"] and "proj" in node["attn"]
                and "Dense_0" in node.get("mlp", {}))

    def walk(node):
        if not hasattr(node, "keys"):
            return None
        if is_block(node):
            out = {}
            for name, w in (
                ("qkv", node["attn"]["qkv"]["kernel"]),
                ("proj", node["attn"]["proj"]["kernel"]),
                ("mlp1", node["mlp"]["Dense_0"]["kernel"]),
                ("mlp2", node["mlp"]["Dense_1"]["kernel"]),
            ):
                wq, s = quantize_weight(jnp.asarray(w))
                out[f"wq_{name}"] = wq
                out[f"s_{name}"] = s
            return out
        sub = {}
        for k, v in node.items():
            r = walk(v)
            if r:
                sub[k] = r
        return sub or None

    p = params.get("params", params) if hasattr(params, "get") else params
    p = p.get("model", p) if hasattr(p, "get") else p
    return walk(p) or {}


def swin_params_of(variables) -> Optional[dict]:
    """Extract the Swin param subtree from MultiModalRetrievalModel
    variables (models/multimodal.py:174,382 — Backbones names the Swin
    tower 'swin' under 'backbones'). Accepts raw trees, {"params": ...},
    and the serving {"model": ...} wrapper (api.py::serving_forward)."""
    p = variables.get("params", variables)
    p = p.get("model", p) if hasattr(p, "get") else p
    for path in (("backbones", "swin"), ("swin",)):
        sub = p
        ok = True
        for k in path:
            if k not in sub:
                ok = False
                break
            sub = sub[k]
        if ok:
            return sub
    return None
