"""Explainability-path bench (BASELINE.json config #4): Integrated
Gradients + attention maps for predicted labels, batch 32.

Reference hook: the web app's predict+explain latency print
(reference src/web/app.py:306-308) and the IG loop in
src/Model/explain.py:302-427 (captum, n_steps sequential python loop);
here IG is one lax.scan'd compiled program (models/explain.py).

Chained-scan timing like bench.py: iteration i+1's image depends on
iteration i's IG map, finished by a scalar fetch, so the measured wall
time contains `iters` sequential real executions. One model build per
process (CLAUDE.md):

  BENCH_SWIN=tiny  python tools/bench_explain.py   # stand-in dims
  BENCH_SWIN=base  python tools/bench_explain.py   # flagship (Swin-B)

Writes/merges BENCH_EXPLAIN.json (folded into BENCH_DETAILS.json by
bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from bench import setup_compile_cache

    setup_compile_cache()

    import jax
    import jax.numpy as jnp

    from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
    from mmrp_tpu.models.swin import SwinConfig
    from mmrp_tpu.models.text_encoder import TextConfig

    on_tpu = jax.default_backend() == "tpu"
    batch = int(os.environ.get("BENCH_BATCH", "32" if on_tpu else "2"))
    text_len = int(os.environ.get("BENCH_TEXT_LEN", "64"))
    ig_steps = int(os.environ.get("BENCH_IG_STEPS", "50" if on_tpu else "4"))
    iters = int(os.environ.get("BENCH_ITERS", "8" if on_tpu else "2"))
    swin_name = os.environ.get("BENCH_SWIN", "tiny")
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"

    # full precision + return_attention path: explain differentiates the
    # model, so the int8 serving GEMMs are excluded by the deterministic
    # gate anyway; bf16 params like the embed bench.
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

    ig_level = os.environ.get("BENCH_IG_LEVEL", "patch")  # patch | pixel
    # chunk sweep, back-to-back in ONE process (drift-free A/B): alphas
    # folded into the batch dim per scan step (models/explain.py::
    # ig_patch_attribution). chunk=1 is the round-3 sequential baseline.
    chunks = [int(c) for c in
              os.environ.get("BENCH_IG_CHUNKS", "1,5,10").split(",")]

    from mmrp_tpu.models.explain import _resolve_chunk, ig_patch_attribution

    def make_explain_once(ig_chunk):
        def explain_once(params, image, ids, mask):
            """One explain pass: forward w/ attention maps + IG on each
            sample's top-1 predicted label (models/explain.py semantics,
            one jitted program).

            BENCH_IG_LEVEL=patch (default, the product/reference
            semantics: backbone once, IG scan differentiates only the
            fusion head via the features= path) or pixel (legacy
            full-model IG, n_steps backbone fwd+bwd — the pre-round-3
            measurement)."""
            out = model.apply(params, image, ids, mask, return_attention=True,
                              return_features=True)
            # attention map: layer+head mean of txt->img, token-masked mean
            t2i = jnp.stack([a["txt2img"] for a in out["attention"]]).mean(axis=(0, 2))
            w = mask[:, : t2i.shape[1]].astype(t2i.dtype)
            attn_map = (t2i * w[:, :, None]).sum(1) / jnp.maximum(
                w.sum(1, keepdims=True), 1.0
            )  # (B, Np)

            targets = jnp.argmax(out["logits"], axis=1)  # per-sample top-1

            if ig_level == "patch":
                ig = ig_patch_attribution(
                    model, params, out["features"], ids, mask, targets,
                    ig_steps, chunk=ig_chunk,
                )  # (B, Np)
            else:
                alphas = (jnp.arange(ig_steps) + 0.5) / ig_steps

                def logit_of(im):
                    o = model.apply(params, im, ids, mask)
                    return jnp.take_along_axis(
                        o["logits"], targets[:, None], axis=1).sum()

                grad_fn = jax.grad(logit_of)

                def body(acc, alpha):
                    return acc + grad_fn(image * alpha), None

                total, _ = jax.lax.scan(body, jnp.zeros_like(image), alphas)
                ig = jnp.abs(image * total / ig_steps).sum(-1)  # (B, H, W)
            return attn_map, ig

        def chained(params, img0, ids, mask):
            def body(img_c, _):
                attn_map, ig = explain_once(params, img_c, ids, mask)
                img_next = img_c + (attn_map.mean() + ig.mean()).astype(
                    img_c.dtype) * 1e-12
                return img_next, ()

            final, _ = jax.lax.scan(body, img0, None, length=iters)
            return final.mean()

        return jax.jit(chained)

    out_path = REPO / "BENCH_EXPLAIN.json"
    existing = {}
    if out_path.exists():
        try:
            existing = json.loads(out_path.read_text())
        except ValueError:
            existing = {}

    for chunk in chunks:
        k = _resolve_chunk(ig_steps, chunk)
        fn = make_explain_once(k)
        t0 = time.perf_counter()
        _ = float(fn(params, img, ids, mask))  # compile + warm
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(fn(params, img, ids, mask))
        dt = time.perf_counter() - t0

        row = {
            "swin": swin_name,
            "batch": batch,
            "text_len": text_len,
            "ig_steps": ig_steps,
            "ig_chunk": k,
            "ig_level": ig_level,
            "iters": iters,
            "attention_path": "pallas" if use_pallas else "xla",
            "explain_ms_per_batch": dt / iters * 1e3,
            "explain_images_per_sec": batch * iters / dt,
            "compile_s": compile_s,
            "backend": jax.default_backend(),
            "method": "chained-scan, scalar fetch; IG(top-1) as lax.scan + "
                      "attention maps, one jitted program; patch = backbone "
                      "once + fusion-head-only IG (reference granularity); "
                      "ig_chunk alphas folded into the batch dim per step",
        }
        suffix = "" if ig_level != "patch" else "_patch"
        ck = "" if k == 1 else f"_c{k}"
        # keep historical pallas-arm key names; the BENCH_PALLAS=0 arm
        # gets its own rows so the A/B survives in one file
        ap = "" if use_pallas else "_xla"
        existing[f"{swin_name}_B{batch}_ig{ig_steps}{suffix}{ck}{ap}"] = row
        out_path.write_text(json.dumps(existing, indent=1))
        print(json.dumps(row, indent=1))


if __name__ == "__main__":
    main()
