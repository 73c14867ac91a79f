"""BASELINE configs #1 + #3: interactive predict latency and rerank latency.

Config #1 — single-pair end-to-end predict (reference hook:
src/web/app.py:306-308, which prints a per-request latency for DICOM
upload -> prediction): ONE request = DICOM Part-10 decode + window +
resize + normalize (host, data/dicom.py), WordPiece tokenize, batch-1
jitted forward (the SAME serving_forward the web app and exporter use,
api.py), sigmoid + calibrated-threshold compare. Wall-clock per request
is the honest metric here — the interactive user waits for the full
round trip, host work and transfer/dispatch included. Dispatch
deduplication (CLAUDE.md) cannot inflate it: every request carries
distinct pixels and a distinct report, and the probs fetch synchronizes.

Config #3 — rerank-path latency per query (reference hook:
src/Retrieval/reranker.py:240-333, a per-candidate pandas loop): exact
top-(3K) candidate fetch over the 100k x 1024 gallery (device matmul +
top_k, retrieval/gallery.py) + the vectorized host rerank
(label-Jaccard + KG-vector cascade + minmax blend, retrieval/rerank.py)
at K=10 and K=100 — the over-fetch factor and blend mirror
MMRPredictor.retrieve exactly.

Usage: python tools/bench_predict.py [predict|rerank|both]
Env: BENCH_SWIN (base|tiny), BENCH_QUANT, BENCH_TEXT_LEN, PRED_ITERS,
RERANK_GALLERY, RERANK_QUERIES. Writes/merges BENCH_PREDICT.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_REPORT_TMPL = (
    "FINDINGS: The cardiomediastinal silhouette is {a} in size. "
    "There is {b} focal airspace consolidation. {c} pleural effusion or "
    "pneumothorax. Degenerative changes of the thoracic spine. "
    "IMPRESSION: {d} acute cardiopulmonary abnormality."
)


def _report(i: int) -> str:
    a = ["normal", "mildly enlarged", "stable"][i % 3]
    b = ["no", "patchy right lower lobe", "subtle left basilar"][i % 3]
    c = ["No", "Small right", "Trace left"][(i + 1) % 3]
    d = ["No", "Findings suggest", "Possible"][(i + 2) % 3]
    return _REPORT_TMPL.format(a=a, b=b, c=c, d=d)


def _stats(ts):
    a = np.asarray(sorted(ts))
    return {
        "p50_ms": float(np.percentile(a, 50) * 1e3),
        "p90_ms": float(np.percentile(a, 90) * 1e3),
        "mean_ms": float(a.mean() * 1e3),
        "n": int(a.size),
    }


def _native_available() -> bool:
    from mmrp_tpu.data import native

    return bool(native.available())


def bench_predict_single() -> dict:
    import jax

    from bench import _build_model
    from mmrp_tpu.api import MMRPredictor
    from mmrp_tpu.data.dicom import DICOMImagePreprocessor, write_dicom
    from mmrp_tpu.data.tokenizer import WordPieceTokenizer
    from mmrp_tpu.labels import LABEL_COLS

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    text_len = int(os.environ.get("BENCH_TEXT_LEN", "128"))
    swin_name = os.environ.get("BENCH_SWIN", "base" if on_tpu else "tiny")
    iters = int(os.environ.get("PRED_ITERS", "20" if on_tpu else "5"))
    # 1024-px 16-bit source DICOM, same scale as the loader bench
    src_px = int(os.environ.get("PRED_SRC_PX", "1024"))

    model, cfg = _build_model(use_pallas=True, text_len=text_len,
                              swin_name=swin_name)
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    img0 = jnp.asarray(rng.random((1, 224, 224, 3), dtype=np.float32))
    ids0 = jnp.asarray(rng.integers(0, cfg.text.vocab_size,
                                    (1, text_len)).astype(np.int32))
    mask0 = jnp.ones((1, text_len), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img0, ids0, mask0)["params"]
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)

    # per-class calibrated threshold vector (the serve path's shape,
    # serve/runner.py thresholds.npy)
    thr = np.clip(rng.random(len(LABEL_COLS)).astype(np.float32), 0.2, 0.8)
    predictor = MMRPredictor(model, params, LABEL_COLS, retriever=None,
                             threshold=thr)
    tok = WordPieceTokenizer.train((_report(i) for i in range(64)),
                                   vocab_size=2048)
    pp = DICOMImagePreprocessor(output_size=(224, 224))

    def one_request(i: int, blob: bytes) -> dict:
        chw = pp.load(blob)                                   # decode+window
        img = np.transpose(chw, (1, 2, 0))[None].astype(np.float32)
        ids, mask = tok.encode(_report(i), max_length=text_len)
        return predictor.predict(img, ids[None], mask[None],
                                 retrieve=False, explain=False)

    # distinct pixels per request (generated OUTSIDE the timed region)
    blobs = []
    for i in range(iters + 2):
        px = np.random.default_rng(i).integers(
            0, 4096, (src_px, src_px)).astype(np.uint16)
        blobs.append(write_dicom(None, px, window_center=2048.0,
                                 window_width=4096.0))

    for i in range(2):                                        # compile+warm
        out = one_request(i, blobs[i])
        assert out["probs"].shape == (1, len(LABEL_COLS))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = one_request(i + 2, blobs[i + 2])
        ts.append(time.perf_counter() - t0)
    row = {
        "config": "predict_single_pair",
        "backend": backend,
        "swin": swin_name,
        "quant": os.environ.get("BENCH_QUANT", "int8"),
        "text_len": text_len,
        "src_px": src_px,
        "native_decode": _native_available(),
        **_stats(ts),
    }
    return row


def bench_rerank() -> dict:
    import jax

    from mmrp_tpu.labels import LABEL_COLS
    from mmrp_tpu.retrieval.gallery import RetrievalEngine
    from mmrp_tpu.retrieval.rerank import Reranker

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    n_gallery = int(os.environ.get("RERANK_GALLERY",
                                   "100000" if on_tpu else "2048"))
    n_queries = int(os.environ.get("RERANK_QUERIES", "32"))
    D = 1024
    rng = np.random.default_rng(0)
    gallery = rng.standard_normal((n_gallery, D)).astype(np.float32)
    ids = [f"g{i}" for i in range(n_gallery)]
    engine = RetrievalEngine(gallery, ids)

    # labels for every record; report-node KG vectors for half the ids so
    # BOTH cascade branches (report-node hit and label-mean fallback,
    # rerank.py:72-95) execute, like a real run where some reports joined
    # the KG and some fall back to their label set
    C = len(LABEL_COLS)
    labels = (rng.random((n_gallery, C)) < 0.12).astype(np.float32)
    labels_by_id = {ids[i]: labels[i] for i in range(n_gallery)}
    kg_dim = 128
    node_emb = rng.standard_normal(
        (C + n_gallery // 2, kg_dim)).astype(np.float32)
    kg_node2id = {f"label:{n}": j for j, n in enumerate(LABEL_COLS)}
    kg_node2id.update(
        {f"report:g{2 * i}": C + i for i in range(n_gallery // 2)})
    rr = Reranker(labels_by_id=labels_by_id, label_names=LABEL_COLS,
                  kg_node_embeddings=node_emb, kg_node2id=kg_node2id)

    rows = {}
    for K in (10, 100):
        fetch_ts, rerank_ts = [], []
        # warm the top-(3K) program once per K
        _ = engine.retrieve(gallery[0], K=3 * K, query_id="g0")
        for qi in range(n_queries):
            q = gallery[qi * 7 % n_gallery]
            qid = ids[qi * 7 % n_gallery]
            t0 = time.perf_counter()
            hits = engine.retrieve(q, K=3 * K, query_id=qid)  # over-fetch 3K
            t1 = time.perf_counter()
            cand_ids = [h[0] for h in hits]
            cand_embs = engine.get_embeddings_for_ids(cand_ids)
            ranked = rr.rerank(qid, cand_ids, cand_embs, q, topk=K)
            t2 = time.perf_counter()
            assert len(ranked) == K
            fetch_ts.append(t1 - t0)
            rerank_ts.append(t2 - t1)
        rows[f"k{K}"] = {
            "fetch": _stats(fetch_ts),
            "rerank": _stats(rerank_ts),
            "total_p50_ms": float(
                np.percentile(np.asarray(fetch_ts) + np.asarray(rerank_ts),
                              50) * 1e3),
        }
    return {
        "config": "rerank_per_query",
        "backend": backend,
        "gallery": n_gallery,
        "dim": D,
        "queries": n_queries,
        "overfetch": "3K (MMRPredictor.retrieve)",
        **rows,
    }


def main() -> None:
    # MMRP_CPU=1: pin the CPU backend IN CODE — the axon site
    # customization force-registers the tunneled TPU and JAX_PLATFORMS
    # env alone is overridden (CLAUDE.md); same escape tests use.
    if os.environ.get("MMRP_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from bench import setup_compile_cache

    setup_compile_cache()
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    out = []
    if mode in ("predict", "both"):
        out.append(bench_predict_single())
    if mode in ("rerank", "both"):
        out.append(bench_rerank())

    path = Path(__file__).resolve().parent.parent / "BENCH_PREDICT.json"
    doc = {"rows": []}
    if path.exists():
        try:
            doc = json.loads(path.read_text())
        except json.JSONDecodeError:
            pass
    # replace same (config, backend) rows, keep the rest
    keep = [r for r in doc.get("rows", [])
            if (r.get("config"), r.get("backend"))
            not in {(r2["config"], r2["backend"]) for r2 in out}]
    doc["rows"] = keep + out
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(doc, fh, indent=1)
    os.replace(tmp, path)
    for r in out:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
