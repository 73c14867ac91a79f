"""BASELINE config #5 bench: streaming embed+retrieve+predict at high batch
over a 100k-item gallery (serve/stream.py::StreamingPipeline).

Unlike the chained-scan embed bench (one giant jit program), this measures
the PRODUCTION serving loop: per-batch host->device feed, jitted
forward+classify, device-side gallery top-K, host materialization of
probs/labels/retrieved ids. Dispatch deduplication cannot inflate it —
every batch carries distinct data and every batch's results are fetched.

The pipelined mode (depth=2, the default) dispatches batch i+1 before
materializing batch i, overlapping the tunnel/host latency with device
compute; depth=1 records the strictly-serial baseline for comparison.

Env knobs: BENCH_SWIN (base|tiny), BENCH_QUANT (int8|none), BENCH_BATCH,
BENCH_TEXT_LEN, STREAM_BATCHES, STREAM_GALLERY. Writes BENCH_STREAM.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import _build_model, setup_compile_cache

    setup_compile_cache()

    from mmrp_tpu.retrieval.gallery import RetrievalEngine
    from mmrp_tpu.serve.stream import StreamingPipeline

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    batch = int(os.environ.get("BENCH_BATCH", "128" if on_tpu else "4"))
    text_len = int(os.environ.get("BENCH_TEXT_LEN", "64"))
    n_batches = int(os.environ.get("STREAM_BATCHES", "16" if on_tpu else "3"))
    n_gallery = int(os.environ.get("STREAM_GALLERY",
                                   "100000" if on_tpu else "512"))
    img = 224 if on_tpu else 56
    swin_name = os.environ.get("BENCH_SWIN", "base" if on_tpu else "tiny")

    model, cfg = _build_model(use_pallas=True, text_len=text_len,
                              swin_name=swin_name)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.random((1, img, img, 3), dtype=np.float32))
    ids0 = jnp.asarray(rng.integers(0, cfg.text.vocab_size,
                                    (1, text_len)).astype(np.int32))
    mask0 = jnp.ones((1, text_len), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img0, ids0, mask0)
    params = jax.tree_util.tree_map(  # serve-mode bf16 weights (bench.py)
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )

    gal = rng.standard_normal((n_gallery, cfg.joint_dim)).astype(np.float32)
    engine = RetrievalEngine(gal, [f"g{i}" for i in range(n_gallery)])
    label_names = [f"label_{i}" for i in range(cfg.num_classes)]
    thresholds = np.full((cfg.num_classes,), 0.5, np.float32)

    pipe = StreamingPipeline(model, params["params"], engine, label_names,
                             thresholds, K=10)

    # dtype of the streamed image tensor: f32 = model-ready NHWC (77 MB per
    # batch-128 — measured link-bound through the tunnel), u8 = windowed
    # pixels finished on device (6.4 MB, serve/stream.py compact ingestion)
    dtype = os.environ.get("STREAM_DTYPE", "u8")

    def make_loader(n, seed0):
        for b in range(n):
            r = np.random.default_rng(seed0 + b)
            if dtype == "u8":
                image = r.integers(0, 256, (batch, img, img)).astype(np.uint8)
            else:
                image = r.random((batch, img, img, 3), dtype=np.float32)
            yield {
                "image": image,
                "input_ids": r.integers(
                    0, cfg.text.vocab_size, (batch, text_len)
                ).astype(np.int32),
                "attention_mask": np.ones((batch, text_len), np.int32),
                "ids": [f"q{b}_{j}" for j in range(batch)],
            }

    # warmup/compile: forward + topk programs
    t0 = time.perf_counter()
    for _ in pipe.run(make_loader(2, 1000)):
        pass
    compile_s = time.perf_counter() - t0

    out = Path(__file__).resolve().parent.parent / "BENCH_STREAM.json"
    result = {
        "metric": f"stream_pairs_per_sec_per_chip(swin_{swin_name},"
        f"L{text_len},quant={os.environ.get('BENCH_QUANT', 'int8')})",
        "backend": backend,
        "batch": batch,
        "batches": n_batches,
        "gallery": n_gallery,
        "K": 10,
        "compile_s": compile_s,
        "method": "per-batch feed + jitted fwd + device top-K + host "
        "materialization; distinct data per batch, every result fetched",
        "rows": {},
    }
    if out.exists():  # merge earlier dtype/depth rows (same backend only)
        try:
            prev = json.loads(out.read_text())
            if prev.get("backend") == backend:
                result["rows"].update(prev.get("rows", {}))
        except (OSError, ValueError):
            pass
    bytes_per_batch = (batch * img * img * (1 if dtype == "u8" else 12)
                       + batch * text_len * 8)
    # best over THIS process's rows only: absolute rates drift across
    # sessions (CLAUDE.md chip-state drift), merged rows are history
    fresh = set()
    result["best_note"] = "best_* over this session's rows only (drift)"
    for depth in (1, 2, 4):
        checksum = 0.0
        for res in pipe.run(make_loader(n_batches, 2000), depth=depth):
            checksum += float(res["probs"].mean())
        row = dict(pipe.stats)
        row["probs_mean_checksum"] = checksum / n_batches
        row["image_dtype"] = dtype
        row["host_to_device_mb_per_batch"] = round(bytes_per_batch / 1e6, 2)
        result["rows"][f"{dtype}_depth{depth}"] = row
        fresh.add(f"{dtype}_depth{depth}")
        result["best_pairs_per_sec"] = max(
            r["pairs_per_sec"] for n, r in result["rows"].items()
            if n in fresh
        )
        out.write_text(json.dumps(result, indent=1))
        print(json.dumps({f"{dtype}_depth{depth}": row}), flush=True)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
