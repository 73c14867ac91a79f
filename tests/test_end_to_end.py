"""Full-pipeline smoke test on a synthetic OpenI fixture: data CLI ->
staged training runner (KG + joint) -> retrieval eval -> serving context ->
HTTP round trip. This is the framework's equivalent of running the
reference's data_run.py + train.py + retrieval_eval.py + web app end to end.
"""

import base64
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from mmrp_tpu.cli import main as cli_main
from mmrp_tpu.data import dicom as D
from mmrp_tpu.labels import LABEL_COLS

TEXTS = [
    "Cardiomegaly with small left pleural effusion.",
    "No acute disease. Clear lungs.",
    "Right lower lobe pneumonia with consolidation.",
    "Degenerative change of the thoracic spine.",
    "Stable cardiomegaly. No pneumothorax.",
    "Atelectasis at the left base with volume loss.",
    "Hyperinflation consistent with emphysema.",
    "Normal chest. No effusion or pneumothorax.",
]


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    rng = np.random.default_rng(11)
    root = tmp_path_factory.mktemp("openi")
    xml_dir = root / "xml"
    dcm_dir = root / "dcm"
    xml_dir.mkdir()
    dcm_dir.mkdir()
    for i, base_text in enumerate(TEXTS * 3):  # 24 records, unique texts
        text = f"{base_text} Study number {i + 1}."
        rid = f"{i + 1}"
        (xml_dir / f"{rid}.xml").write_text(
            f"""<eCitation><ArticleTitle>r{rid}</ArticleTitle>
<Abstract><AbstractText>{text}</AbstractText></Abstract>
<parentImage id="CXR{rid}_IM-0001-1001"/></eCitation>"""
        )
        arr = (rng.random((40, 40)) * 2000).astype(np.uint16)
        D.write_dicom(dcm_dir / f"{rid}_IM-0001-1001.dcm", arr,
                      window_center=1000, window_width=2000)
    return str(xml_dir), str(dcm_dir), root


def test_data_cli_and_training_pipeline(fixture_dirs, tmp_path_factory):
    xml_dir, dcm_dir, _ = fixture_dirs
    out = tmp_path_factory.mktemp("run")

    rc = cli_main([
        "data", "--xml-dir", xml_dir, "--dicom-dir", dcm_dir,
        "--out", str(out), "--seed", "5",
    ])
    assert rc == 0
    assert (out / "records_cache.json").exists()
    assert (out / "splits" / "train_ids.json").exists()

    # Drive training through the CLI + the SHIPPED config asset
    # (configs/config.yaml), with size knobs shrunk for CI — this covers
    # Config.load coercion end to end on the real entry path.
    import yaml

    from tests.test_graft_entry import REPO

    tiny = yaml.safe_load((REPO / "configs" / "config.yaml").read_text())
    tiny.update(
        image_backbone="swin_micro", image_size=28, joint_dim=32,
        num_fusion_layers=1, num_heads=2, text_dim=16, batch_size=4,
        epochs=2, patience=3, kg_epochs=2, kg_emb_dim=16, kg_neg_size=4,
        lr=1e-3, use_pallas_attention=False, augment=False,
        kg_model="TransE", la_epochs=2,
    )
    cfg_path = out / "tiny_config.yaml"
    cfg_path.write_text(yaml.safe_dump(tiny))
    rc = cli_main([
        "train", "--config", str(cfg_path), "--data", str(out),
        "--out", str(out / "train"),
    ])
    assert rc == 0
    summary = json.loads((out / "train" / "pipeline_summary.json").read_text())
    assert "joint" in summary and "retrieval" in summary
    assert np.isfinite(summary["joint"]["composite"])
    gen = summary["retrieval"]["generalization"]
    assert "P@10" in gen and "p50_ms" in gen
    # gallery dumps must be duplicate-free (regression: the weighted
    # training sampler draws with replacement; dumping from it produced
    # duplicate gallery rows and mAP > 1)
    train_ids = json.loads((out / "train" / "train_ids.json").read_text())
    assert len(train_ids) == len(set(train_ids))
    for key in ("generalization", "historical"):
        for m in ("P@10", "mAP", "MRR", "nDCG@10"):
            assert 0.0 <= summary["retrieval"][key][m] <= 1.0
    # artifacts for serving
    assert (out / "train" / "test_embeddings.npy").exists()
    assert (out / "train" / "vocab.txt").exists()
    assert (out / "train" / "kg" / "node_embeddings.npy").exists()
    # staged-pipeline artifacts (reference train.py:304-360): stage-1 Swin
    # finetune backbone + metrics, LabelAttention ckpt for the reranker
    assert (out / "train" / "swin" / "swin_backbone.npz").exists()
    assert (out / "train" / "swin" / "best_swin_finetune_metrics.json").exists()
    assert (out / "train" / "label_attention.npz").exists()
    # full-train-state checkpoints for --resume
    assert any((out / "train" / "joint" / "ckpt" / "steps").iterdir())

    # ---- serving round trip over HTTP -------------------------------------
    from mmrp_tpu.serve.app import serve
    from mmrp_tpu.serve.runner import build_demo_context

    ctx = build_demo_context(str(out / "train"))
    # per-class calibrated thresholds reach the predictor (train.py:620-704)
    assert np.asarray(ctx["predictor"].threshold).shape == (len(LABEL_COLS),)

    # ---- int8_static activation calibration over the trained run ----------
    rc = cli_main([
        "calibrate", "--run-dir", str(out / "train"), "--data", str(out),
        "-n", "8", "--batch-size", "4",
    ])
    assert rc == 0
    from mmrp_tpu.models.quant_calib import load_act_amax

    amax = load_act_amax(str(out / "train" / "swin_act_amax.json"))
    assert len(amax) == sum(ctx["predictor"].model.config.swin.depths)
    assert all(all(v > 0 for v in row) for row in amax)
    server = serve(lambda: ctx, port=0, block=False)
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"

        rng = np.random.default_rng(3)
        arr = (rng.random((40, 40)) * 2000).astype(np.uint16)
        blob = D.write_dicom(None, arr, window_center=1000, window_width=2000)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/predict",
            data=json.dumps({
                "dicom_b64": base64.b64encode(blob).decode(),
                "text": "cardiomegaly with effusion",
                "threshold": 0.5,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            payload = json.loads(r.read())
        assert "top_labels" in payload
        assert len(payload["top_labels"]) == 5
        names = [t[0] for t in payload["top_labels"]]
        assert all(n in LABEL_COLS for n in names)
        assert "retrieval" in payload and len(payload["retrieval"]) > 0
        assert "agreement" in payload

        # per-retrieved-item full explain (reference app.py:449-630):
        # K items batched through attention+IG+GradCAM with per-item targets
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/predict",
            data=json.dumps({
                "dicom_b64": base64.b64encode(blob).decode(),
                "text": "cardiomegaly with effusion",
                "detail": True,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            payload = json.loads(r.read())
        detail = payload["retrieval_detail"]
        assert len(detail) >= 1
        d0 = detail[0]
        for key in ("top_labels", "agreement", "cross_map", "cross_map_ig"):
            assert key in d0, key
        assert "attn_vs_ig" in d0["agreement"]
        assert "attn_vs_gradcam" in d0["agreement"]
        assert "iou@20%" in d0["cross_map"]
        if len(detail) >= 2:
            assert "retrieval_diversity" in payload

        # concurrent identical requests through the ThreadingHTTPServer:
        # all must 200 and agree (jitted calls are invoked from multiple
        # handler threads; results must not interleave or corrupt)
        import concurrent.futures

        def post_once(_):
            r = urllib.request.urlopen(
                urllib.request.Request(
                    f"http://127.0.0.1:{port}/api/predict",
                    data=json.dumps({
                        "dicom_b64": base64.b64encode(blob).decode(),
                        "text": "cardiomegaly with effusion",
                    }).encode(),
                    headers={"Content-Type": "application/json"},
                ), timeout=300)
            return json.loads(r.read())

        with concurrent.futures.ThreadPoolExecutor(3) as pool_:
            results = list(pool_.map(post_once, range(3)))
        top0 = results[0]["top_labels"]
        for r in results[1:]:
            assert [t[0] for t in r["top_labels"]] == [t[0] for t in top0]
            np.testing.assert_allclose(
                [t[1] for t in r["top_labels"]], [t[1] for t in top0],
                rtol=1e-5, atol=1e-6,
            )

        # corrupted DICOM upload -> clean 400 (DicomParseError is a
        # ValueError; the decode path must never 500 or crash the server)
        bad = bytearray(blob)
        bad[130:140] = b"\xff" * 10
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/predict",
            data=json.dumps({
                "dicom_b64": base64.b64encode(bytes(bad)).decode(),
                "text": "x",
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("corrupted DICOM was accepted")
        except urllib.error.HTTPError as e:
            assert e.code == 400, e.code
    finally:
        server.shutdown()

    # ---- serialized serving artifact (serve/exported.py) ------------------
    art = out / "serving_artifact.npz"
    rc = cli_main([
        "export-serving", "--run-dir", str(out / "train"), "--data", str(out),
        "--out-path", str(art), "--batches", "1,2", "--platforms", "cpu",
    ])
    assert rc == 0 and art.exists()
    from mmrp_tpu.serve.exported import ExportedPredictor

    ep = ExportedPredictor.load(art, platform="cpu")
    assert ep.meta["label_names"] == list(LABEL_COLS)
    pre = ctx["preprocessor"]
    img3 = np.asarray(pre.load(blob)).transpose(1, 2, 0)[None].astype(np.float32)
    t_ids, t_mask = ctx["tokenizer"].encode(
        "cardiomegaly", max_length=ctx["max_length"])
    got = ep.call(img3, t_ids[None], t_mask[None])
    live = ctx["predictor"].embed(img3, t_ids[None], t_mask[None])
    np.testing.assert_allclose(got["probs"], live["probs"], rtol=2e-4, atol=2e-5)

    # ---- streaming batch pipeline over the test split (BASELINE #5) -------
    rc = cli_main([
        "stream", "--run-dir", str(out / "train"), "--data", str(out),
        "--split", "test", "-k", "3", "--batch-size", "4",
    ])
    assert rc == 0
    stream_dir = out / "train" / "stream_test"
    stats = json.loads((stream_dir / "stream_stats.json").read_text())
    assert stats["pairs"] > 0 and stats["pairs_per_sec"] > 0
    rows = [json.loads(l) for l in
            (stream_dir / "predictions.jsonl").read_text().splitlines()]
    assert len(rows) == stats["pairs"]
    assert all("probs" in r and "retrieval" in r for r in rows)

    # ---- one-command reference-protocol parity run -------------------------
    # (eval/parity.py): dry-run on this synthetic fixture so real-data
    # parity is a single command when OpenI data lands
    rc = cli_main([
        "parity", "--data", str(out), "--run-dir", str(out / "train"),
        "-k", "5", "--explain-n", "2",
    ])
    assert rc == 0
    pdir = out / "train" / "parity"
    rep = json.loads((pdir / "parity_results.json").read_text())
    md = (pdir / "PARITY_RESULTS.md").read_text()
    assert rep["n_test"] > 0
    # every section of the reference protocol must be present
    for section in ("classification", "retrieval", "variants",
                    "embedding_rank", "explain_alignment", "diversity",
                    "kg_health"):
        assert section in rep, section
    assert "macro_auroc" in rep["classification"] or any(
        "auroc" in k for k in rep["classification"])
    assert "generalization" in rep["retrieval"]
    assert "significance_vs_baseline" in rep["variants"]["full"]
    assert np.isfinite(rep["explain_alignment"]["align_pearson"]) or True
    for needle in ("eval_on_test.py", "retrieval_eval.py",
                   "retrieval_explain_eval.py"):
        assert needle in md, needle
