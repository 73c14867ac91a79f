"""Per-op device profile of the explain path (BASELINE config #4).

Same methodology as tools/profile_trace.py (real xprof trace of a chained
program, per-op aggregation), applied to the serve/eval explain program:
forward with attention maps + patch-level Integrated Gradients on each
sample's top-1 label (models/explain.py::ig_patch_attribution — backbone
once, fusion-head-only IG scan, alphas chunked into the batch dim).
Reference hook: src/Model/explain.py:302-427 (captum IG loop) and the
web app latency print (src/web/app.py:306-308).

Usage: python tools/profile_explain.py [out.json]
Env: BENCH_SWIN (default base), BENCH_BATCH (32), BENCH_TEXT_LEN (64),
     BENCH_IG_STEPS (50), BENCH_IG_CHUNK (5), BENCH_PALLAS, PROF_ITERS (4).
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from profile_trace import aggregate  # noqa: E402  (same trace parsing)


def capture(trace_dir: str):
    from bench import setup_compile_cache

    setup_compile_cache()

    import jax
    import jax.numpy as jnp

    from mmrp_tpu.models.explain import _resolve_chunk, ig_patch_attribution
    from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
    from mmrp_tpu.models.swin import SwinConfig
    from mmrp_tpu.models.text_encoder import TextConfig

    on_tpu = jax.default_backend() == "tpu"
    batch = int(os.environ.get("BENCH_BATCH", "32" if on_tpu else "2"))
    text_len = int(os.environ.get("BENCH_TEXT_LEN", "64"))
    ig_steps = int(os.environ.get("BENCH_IG_STEPS", "50" if on_tpu else "4"))
    chunk = _resolve_chunk(ig_steps, int(os.environ.get("BENCH_IG_CHUNK", "5")))
    iters = int(os.environ.get("PROF_ITERS", "4"))
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    swin_name = os.environ.get("BENCH_SWIN", "base" if on_tpu else "tiny")

    cfg = MultiModalConfig(
        swin=SwinConfig.from_name(f"swin_{swin_name}", use_pallas=use_pallas),
        text=TextConfig.clinicalbert(),
        joint_dim=1024,
        num_fusion_layers=5,
        num_heads=8,
        num_classes=43,
        max_text_len=text_len,
    )
    model = MultiModalRetrievalModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((batch, 224, 224, 3), dtype=np.float32))
    ids = jnp.asarray(
        rng.integers(0, cfg.text.vocab_size, (batch, text_len)).astype(np.int32)
    )
    mask = jnp.ones((batch, text_len), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img[:1], ids[:1], mask[:1])
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )

    def explain_once(params, image, ids, mask):
        out = model.apply(params, image, ids, mask, return_attention=True,
                          return_features=True)
        t2i = jnp.stack([a["txt2img"] for a in out["attention"]]).mean(axis=(0, 2))
        w = mask[:, : t2i.shape[1]].astype(t2i.dtype)
        attn_map = (t2i * w[:, :, None]).sum(1) / jnp.maximum(
            w.sum(1, keepdims=True), 1.0
        )
        targets = jnp.argmax(out["logits"], axis=1)
        ig = ig_patch_attribution(
            model, params, out["features"], ids, mask, targets, ig_steps,
            chunk=chunk,
        )
        return attn_map, ig

    def chained(params, img0, ids, mask):
        def body(img_c, _):
            attn_map, ig = explain_once(params, img_c, ids, mask)
            img_next = img_c + (attn_map.mean() + ig.mean()).astype(
                img_c.dtype) * 1e-12
            return img_next, ()

        final, _ = jax.lax.scan(body, img0, None, length=iters)
        return final.mean()

    fn = jax.jit(chained)
    _ = float(fn(params, img, ids, mask))  # compile + warm
    with jax.profiler.trace(trace_dir):
        v = float(fn(params, img, ids, mask))
    return {"batch": batch, "iters": iters, "text_len": text_len,
            "pallas": use_pallas, "swin": swin_name, "ig_steps": ig_steps,
            "ig_chunk": chunk, "value": v}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mmrp_profile_explain.json"
    trace_dir = os.environ.get("PROF_DIR", "/tmp/mmrp_trace_explain")
    meta = capture(trace_dir)
    planes, per_op, per_line, total = aggregate(trace_dir, meta["iters"])
    it = meta["iters"]
    report = {
        "meta": meta,
        "planes": planes,
        "total_device_ms_per_iter": total / 1e6 / it,
        "lines_ms_per_iter": {
            k: v / 1e6 / it for k, v in sorted(
                per_line.items(), key=lambda kv: -kv[1])
        },
        "top_ops_ms_per_iter": {
            k: v / 1e6 / it for k, v in per_op.most_common(60)
        },
    }
    Path(out_path).write_text(json.dumps(report, indent=1))
    print(json.dumps({k: report[k] for k in ("meta", "planes",
                                             "total_device_ms_per_iter")}, indent=1))
    for k, v in list(report["top_ops_ms_per_iter"].items())[:40]:
        print(f"{v:9.3f} ms  {k}")


if __name__ == "__main__":
    main()
