"""Benchmark: image-text pairs embedded/sec/chip + retrieval latency.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: joint-embedding throughput (pairs/sec/chip) of the FLAGSHIP
parity architecture — Swin-B (the reference backbone, fusion.py:92) +
ClinicalBERT-dims text encoder + 5-layer fusion, text length 64 (median
OpenI report length; the reference pads to 512 but true reports are short).
BENCH_SWIN=tiny selects the lighter stand-in (recorded under its own
metric name). Baseline: the driver-set north star of 5,000 pairs/sec/chip
(BASELINE.json).

Default serving precision is the measured optimum mix (tools/ab_bench.py):
bf16 fused Pallas attention + W8A8 int8 GEMMs (ops/quant.py) for the
FLOP-bound fusion stack and BERT FFN + STATIC-scale W8A8 inside the Swin
whole-block/pair kernels (round 4: pre-quantized weights + calibrated
per-tensor activation scales, models/quant_calib.py — back-to-back
Swin-B encoder −4.1% where dynamic quant lost +9.5%) — the analog of the
reference's fp16 AMP serving, fidelity-gated by tests/test_quant_model.py
and tests/test_quant_static.py (embedding cosine > 0.995 at every Swin-B
stage width, stable retrieval order). BENCH_QUANT=int8 restores the
round-3 mix (Swin bf16); =none selects pure bf16.

Timing methodology: the remote-execution tunnel used for this TPU neither
honors block_until_ready nor re-executes deduplicated dispatches, so naive
loops over-report by orders of magnitude (observed 51x chip peak). All
timed loops here are **chained lax.scan programs** — iteration i+1's input
depends on iteration i's output — finished by a single scalar fetch, so the
measured wall time must contain `iters` sequential real executions.
Secondary metrics (exact top-10 retrieval over a 100k-item gallery, per
query, chained) land in BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def setup_compile_cache() -> None:
    """Persistent XLA compile cache: repeat bench/A-B runs skip the
    multi-minute first compile through the tunnel. Shared by every tool
    under tools/ (call before building models)."""
    import jax

    cache = os.path.join(os.path.expanduser("~"), ".cache", "mmrp_jax_cache")
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (AttributeError, ValueError):
        pass


def _build_model(use_pallas: bool, text_len: int, swin_name: str = None):
    import jax.numpy as jnp

    from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
    from mmrp_tpu.models.swin import SwinConfig
    from mmrp_tpu.models.text_encoder import TextConfig

    swin_name = swin_name or os.environ.get("BENCH_SWIN", "tiny")
    # BENCH_QUANT=int8 selects the W8A8 serving path (ops/quant.py; fidelity
    # validated in tests/test_quant_model.py — cosine>0.995, stable top-k).
    # Measured mix (tools/ab_bench.py, back-to-back): fusion stack all-int8
    # (15.8->13.5 ms, at the chip's int8 FLOP floor); BERT int8 INSIDE the
    # fused attention kernel + int8 FFN (12.0 -> 9.96 ms vs bf16 fused);
    # Swin stays bf16 (bandwidth-bound). "int8_all" = plain XLA W8A8
    # everywhere (no fused kernels) for comparison.
    # "int8_swins" additionally serves the Swin whole-block kernel with
    # STATIC-scale W8A8 (pre-quantized weights + fixed per-tensor act
    # scales — ops/fused_swin_block.py static flavor; fidelity gate
    # tests/test_quant_static.py). Act-scale values do not affect speed,
    # so the bench uses a constant (BENCH_ACT_AMAX, default 8.0); real
    # serving calibrates via models/quant_calib.py.
    quant = os.environ.get("BENCH_QUANT", "int8_swins")
    swin_kw = {}
    if quant == "int8_swins":
        depths = {"tiny": (2, 2, 6, 2), "small": (2, 2, 18, 2),
                  "base": (2, 2, 18, 2)}.get(swin_name, (2, 2, 6, 2))
        a = float(os.environ.get("BENCH_ACT_AMAX", "8.0"))
        swin_kw = {"quant": "int8_static",
                   "act_amax": tuple((a,) * 4 for _ in range(sum(depths)))}
    cfg = MultiModalConfig(
        swin=SwinConfig.from_name(f"swin_{swin_name}", use_pallas=use_pallas,
                                  **swin_kw),
        text=TextConfig.clinicalbert(
            quant={"int8": "int8_kernel", "int8_all": "int8",
                   "int8_swins": "int8_kernel"}.get(quant, "none")),
        joint_dim=1024,
        num_fusion_layers=5,
        num_heads=8,
        num_classes=43,
        max_text_len=text_len,
        quant="int8" if quant.startswith("int8") else "none",
    )
    return MultiModalRetrievalModel(cfg, dtype=jnp.bfloat16), cfg


def bench_embed(batch: int, text_len: int, use_pallas: bool, iters: int):
    """-> (pairs/sec, implied fraction of v5e bf16 peak)."""
    import jax
    import jax.numpy as jnp

    model, cfg = _build_model(use_pallas, text_len)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((batch, 224, 224, 3), dtype=np.float32))
    ids = jnp.asarray(
        rng.integers(0, cfg.text.vocab_size, (batch, text_len)).astype(np.int32)
    )
    mask = jnp.ones((batch, text_len), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img[:1], ids[:1], mask[:1])
    if os.environ.get("BENCH_BF16_PARAMS", "1") == "1":
        # serve-mode weights: bf16 params halve HBM weight traffic
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params,
        )

    def chained(params, img0, ids, mask):
        def body(img_c, _):
            out = model.apply(params, img_c, ids, mask)
            # serialize: next input depends on this output (O(1) extra work)
            img_next = img_c + out["joint_emb"].mean().astype(img_c.dtype) * 1e-12
            return img_next, ()

        final, _ = jax.lax.scan(body, img0, None, length=iters)
        return final.mean()

    fn = jax.jit(chained)
    _ = float(fn(params, img, ids, mask))  # compile + warmup (full chain)
    # median of several timed chains: dispatch jitter through the dev
    # tunnel is tens-of-ms scale (docs/ROOFLINE.md chip-state notes), so a
    # single chain carries avoidable noise; each repeat is a full chained
    # re-execution (same methodology as the warmup/timed pair before).
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    dts = []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        _ = float(fn(params, img, ids, mask))  # scalar fetch forces all
        dts.append(time.perf_counter() - t0)
    dt = float(np.median(dts))
    throughput = batch * iters / dt
    bench_embed.last_spread = {  # picked up into BENCH_DETAILS by main()
        "dt_repeats_s": [round(x, 5) for x in dts],
        "spread_pct": round(100.0 * (max(dts) - min(dts)) / dt, 2),
    }

    # FLOPs (2 x MACs): Swin GMACs 4.5/8.7/15.4 (tiny/small/base); BERT-base
    # dims ~85M MACs/token; fusion stack 2.07 TF per 128 pairs at L64
    # (docs/ROOFLINE.md §3), scaled by the text share for other lengths.
    swin_flops = {"tiny": 9.0e9, "small": 17.4e9, "base": 30.8e9}.get(
        os.environ.get("BENCH_SWIN", "tiny"), 9.0e9
    )
    fusion_flops = 12.4e9 + 60e6 * text_len  # const (patch/seq) + per-token
    flops_per_pair = swin_flops + 2.0 * 85e6 * text_len + fusion_flops
    # fraction of the MEASURED bf16 rate of this chip slice (~105 TF/s,
    # docs/ROOFLINE.md §1), not the nominal 197: "1.0" = at the roof
    return throughput, throughput * flops_per_pair / 105e12


def bench_retrieval(n_gallery: int, dim: int = 1024, k: int = 10, iters: int = 64):
    """Chained per-query exact top-k -> ms/query on device."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    g = rng.standard_normal((n_gallery, dim)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    g_dev = jax.device_put(g)
    q0 = jnp.asarray(rng.standard_normal((1, dim)).astype(np.float32))

    def chained(q0, g):
        def body(q, _):
            s, idx = jax.lax.top_k(
                jnp.dot(q, g.T, preferred_element_type=jnp.float32), k
            )
            q_next = jnp.roll(q, 1, axis=1) + s.max() * 1e-12
            return q_next, ()

        final, _ = jax.lax.scan(body, q0, None, length=iters)
        return final.mean()

    fn = jax.jit(chained)
    _ = float(fn(q0, g_dev))
    t0 = time.perf_counter()
    _ = float(fn(q0, g_dev))
    dt = time.perf_counter() - t0
    return dt / iters * 1e3


def main() -> None:
    import jax

    setup_compile_cache()

    try:
        backend = jax.default_backend()
    except RuntimeError as e:
        # tunnel/backend init failure (observed: axon 'Unavailable' after a
        # long hang). Record the failure honestly as ONE parseable line
        # instead of crashing with no bench row at all; annotate (don't
        # clobber) the last good BENCH_DETAILS.
        details = {}
        try:
            with open("BENCH_DETAILS.json") as fh:
                details = json.load(fh)
        except (OSError, ValueError):
            pass
        details["error_backend_init"] = repr(e)
        with open("BENCH_DETAILS.json", "w") as fh:
            json.dump(details, fh, indent=1)
        print(json.dumps({
            "metric": "pairs_embedded_per_sec_per_chip(tpu-unavailable)",
            "value": 0.0,
            "unit": "pairs/s/chip",
            "vs_baseline": 0.0,
        }))
        return
    on_tpu = backend == "tpu"
    # headline = the FLAGSHIP parity architecture (Swin-B, reference
    # fusion.py:92). BENCH_SWIN=tiny selects the smaller stand-in, recorded
    # with its own clearly-labeled metric name.
    swin_name = os.environ.setdefault("BENCH_SWIN", "base" if on_tpu else "tiny")
    batch = int(os.environ.get(
        "BENCH_BATCH", ("64" if swin_name == "base" else "128") if on_tpu else "4"))
    text_len = int(os.environ.get("BENCH_TEXT_LEN", "64"))
    iters = 20 if on_tpu else 2
    # fused Pallas window attention is the default on TPU (measured +15%
    # over the best XLA formulation); BENCH_PALLAS=0 selects the XLA path
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    key = "pallas" if use_pallas else "xla"

    quant = os.environ.get("BENCH_QUANT", "int8_swins")
    dtype_tag = ("int8s-serve" if quant == "int8_swins"
                 else "int8-serve" if quant.startswith("int8") else "bf16")
    details = {"backend": backend, "swin": swin_name, "batch": batch,
               "text_len": text_len, "attention_path": key, "quant": quant,
               "method": "chained-scan, scalar fetch"}
    throughput = 0.0
    try:
        throughput, mxu_frac = bench_embed(batch, text_len, use_pallas, iters)
        details["embed_pairs_per_sec"] = throughput
        details["implied_peak_frac"] = mxu_frac
        details["embed_timing"] = getattr(bench_embed, "last_spread", None)
    except Exception as e:  # noqa: BLE001 — record and continue
        details["error_embed"] = repr(e)

    try:
        n_gal = 100_000 if on_tpu else 2_000
        details[f"retrieval_ms_per_query_{n_gal//1000}k"] = bench_retrieval(n_gal)
    except Exception as e:  # noqa: BLE001
        details["error_retrieval"] = repr(e)

    # merge separately-measured rows (same chained methodology, one model
    # build per process — see CLAUDE.md): training step (tools/bench_train.py)
    # and the Swin-B flagship embed (BENCH_FLAGSHIP=1 runs of this file)
    here = os.path.dirname(os.path.abspath(__file__))
    for side, key in (("BENCH_TRAIN.json", "train_step"),
                      ("BENCH_TRAIN_FLAGSHIP.json", "train_step_flagship"),
                      ("BENCH_FLAGSHIP.json", "flagship_embed"),
                      ("BENCH_EXPLAIN.json", "explain"),
                      ("BENCH_STREAM.json", "stream"),
                      ("BENCH_KG.json", "kg_train"),
                      ("BENCH_LOADER.json", "input_pipeline")):
        p = os.path.join(here, side)
        if os.path.exists(p):
            try:
                with open(p) as fh:
                    details[key] = json.load(fh)
            except (OSError, ValueError) as e:  # noqa: PERF203
                details[key] = {"error": repr(e)}

    with open("BENCH_DETAILS.json", "w") as fh:
        json.dump(details, fh, indent=1)

    arch_tag = {"base": "swin_b", "small": "swin_s", "tiny": "swin_t"}.get(
        swin_name, swin_name)
    print(
        json.dumps(
            {
                "metric": f"pairs_embedded_per_sec_per_chip({arch_tag}"
                f"+clinbert_dims,L{text_len},{dtype_tag})",
                "value": round(throughput, 2),
                "unit": "pairs/s/chip",
                "vs_baseline": round(throughput / 5000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
