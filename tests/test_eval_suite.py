import json
import numpy as np
import pytest

from mmrp_tpu.data.labeler import PhraseLabeler
from mmrp_tpu.data.triplets import LabelEmbeddingLookup, PseudoTripletDataset
from mmrp_tpu.data.verify import LabelVerifier, Verdict, apply_verdicts
from mmrp_tpu.eval.classification import evaluate_classification
from mmrp_tpu.eval.diversity import diversity_report, embedding_diversity, label_diversity
from mmrp_tpu.eval.eda import (
    drop_zero_label_records,
    eda_after_split,
    eda_before_split,
    verification_delta,
)
from mmrp_tpu.eval.gt import build_label_overlap_gt
from mmrp_tpu.eval.kg_probe import embedding_health, label_node_coverage, nearest_neighbors
from mmrp_tpu.eval.retrieval_eval import dual_gallery_eval, evaluate_gallery, variant_eval
from mmrp_tpu.retrieval.gallery import RetrievalEngine
from mmrp_tpu.retrieval.rerank import Reranker


def test_build_label_overlap_gt():
    qids = ["q1", "q2"]
    ql = np.array([[1, 1, 0], [0, 0, 1]])
    gids = ["a", "b", "q1"]
    gl = np.array([[1, 0, 0], [0, 0, 1], [1, 1, 0]])
    gt = build_label_overlap_gt(qids, ql, gids, gl)
    assert gt["q1"] == ["a"]  # self excluded
    assert gt["q2"] == ["b"]
    gt2 = build_label_overlap_gt(qids, ql, gids, gl, min_shared=2)
    assert gt2["q1"] == []


def test_ontology_aware_gt():
    """README-advertised 'ontology-aware relationships' relevance (the
    reference ships no code for it): labels mapped to the same or related
    ontology terms count as shared; identity adjacency == plain overlap."""
    from mmrp_tpu.eval.gt import ontology_label_adjacency

    names = ["cardiac", "cardiomegaly", "effusion"]
    A = ontology_label_adjacency(
        names,
        {"cardiac": ["DOID:114"], "cardiomegaly": ["DOID:2843"],
         "effusion": ["RID:1"]},
        related_pairs=[("DOID:114", "DOID:2843")],
    )
    assert A[0, 1] and A[1, 0]          # related through is_a pair
    assert not A[0, 2] and not A[1, 2]  # unrelated
    assert A.diagonal().all()

    qids, gids = ["q"], ["x", "y"]
    ql = np.array([[1, 0, 0]])
    gl = np.array([[0, 1, 0], [0, 0, 1]])
    plain = build_label_overlap_gt(qids, ql, gids, gl)
    assert plain["q"] == []
    onto = build_label_overlap_gt(qids, ql, gids, gl, label_adjacency=A)
    assert onto["q"] == ["x"]  # cardiomegaly-only gallery item now relevant
    ident = build_label_overlap_gt(qids, ql, gids, gl,
                                   label_adjacency=np.eye(3, dtype=bool))
    assert ident["q"] == plain["q"]


def test_evaluate_gallery_perfect_retrieval(rng):
    # gallery where each query's own cluster is most similar
    base = rng.standard_normal((5, 16)).astype(np.float32)
    gallery = np.concatenate([base + 0.01 * rng.standard_normal((5, 16)) for _ in range(3)])
    gids = [f"g{c}_{i}" for i in range(3) for c in range(5)]
    eng = RetrievalEngine(gallery, gids)
    gt = {f"q{c}": [f"g{c}_{i}" for i in range(3)] for c in range(5)}
    res = evaluate_gallery(eng, base, [f"q{c}" for c in range(5)], gt, k=3)
    assert res["P@3"] > 0.9
    assert res["MRR"] > 0.9
    assert "p50_ms" in res


def test_dual_gallery_eval_writes_artifacts(rng, tmp_path):
    g = rng.standard_normal((20, 8)).astype(np.float32)
    ids = [f"i{k}" for k in range(20)]
    eng = RetrievalEngine(g, ids)
    gt = {f"q{j}": [ids[j]] for j in range(3)}
    res = dual_gallery_eval(eng, eng, g[:3], [f"q{j}" for j in range(3)],
                            gt, gt, k=5, out_dir=str(tmp_path))
    assert "generalization" in res and "historical" in res
    assert (tmp_path / "retrieval_results.json").exists()
    assert (tmp_path / "retrieval_results.txt").exists()


def test_variant_eval(rng, tmp_path):
    g = rng.standard_normal((15, 8)).astype(np.float32)
    ids = [f"i{k}" for k in range(15)]
    eng = RetrievalEngine(g, ids)
    labels = {i: (rng.random(4) < 0.5).astype(int) for i in ids}
    labels.update({f"q{j}": (rng.random(4) < 0.5).astype(int) for j in range(2)})

    def factory(a, b, c):
        return Reranker(alpha=a, beta=b, gamma=c, labels_by_id=labels)

    gt = {f"q{j}": [ids[j]] for j in range(2)}
    res = variant_eval(eng, g[:2], ["q0", "q1"], gt, factory, k=5,
                       out_path=str(tmp_path / "variants.json"))
    assert set(res) == {"baseline", "kg_only", "la_only", "kg_la", "full"}
    # paired significance vs the no-rerank baseline (reference README.md:82
    # advertises this; implemented in eval/significance.py)
    sig = res["full"]["significance_vs_baseline"]
    assert set(sig) == {"AP", "RR"} and "p_ttest" in sig["AP"]
    assert "per_query" not in res["baseline"]  # popped, not serialized
    saved = json.loads((tmp_path / "variants.json").read_text())
    assert "significance_vs_baseline" in saved["full"]


def test_paired_significance_detects_shift(rng):
    from mmrp_tpu.eval.significance import compare_variants, paired_tests

    b = rng.random(64)
    a = np.clip(b + 0.1, 0, 1.2)  # constant positive shift
    t = paired_tests(a, b)
    assert t["mean_delta"] > 0.05
    assert t["p_ttest"] < 1e-6 and t["p_wilcoxon"] < 1e-6
    assert t["ci95_lo"] > 0  # CI excludes zero

    same = paired_tests(b, b)
    assert same["p_ttest"] == 1.0 and same["mean_delta"] == 0.0

    noise = paired_tests(b + rng.standard_normal(64) * 1e-3, b)
    assert noise["p_ttest"] > 1e-6 or abs(noise["mean_delta"]) < 1e-3

    # constant NONZERO delta (zero variance): maximal paired evidence,
    # exact sign-test p, not NaN (regression: quantized metrics like P@K
    # on small query sets produce exactly-equal deltas)
    const = paired_tests(np.full(16, 0.6), np.full(16, 0.5))
    assert const["mean_delta"] == pytest.approx(0.1)
    assert const["p_ttest"] == pytest.approx(2.0 ** -15)
    assert const["p_wilcoxon"] == pytest.approx(2.0 ** -15)
    assert const["t"] == np.inf and const["ci95_lo"] > 0
    down = paired_tests(np.full(3, 0.2), np.full(3, 0.5))
    assert down["t"] == -np.inf and down["p_ttest"] == pytest.approx(0.25)

    # corrupted input: any non-finite delta must yield NaN p-values, not
    # fall through to the maximal-significance constant-delta branch
    bad = paired_tests([0.5, float("nan"), 0.7], [0.4, 0.6, 0.5])
    assert np.isnan(bad["p_ttest"]) and np.isnan(bad["p_wilcoxon"])

    # mismatched shapes raise (not broadcast into fabricated pairs)
    with pytest.raises(ValueError):
        paired_tests(np.zeros((4, 1)), np.zeros(4))

    out = compare_variants({"baseline": {"AP": b}, "v": {"AP": a}},
                           metrics=("AP",))
    assert out["v"]["AP"]["p_ttest"] < 1e-6


def test_evaluate_classification_writes(tmp_path, rng):
    y = (rng.random((50, 4)) < 0.4).astype(int)
    p = np.clip(y * 0.7 + rng.random((50, 4)) * 0.3, 0, 1)
    rep = evaluate_classification(p, y, [f"c{i}" for i in range(4)],
                                  out_dir=str(tmp_path))
    assert rep["macro_f1"] > 0.5
    assert (tmp_path / "test_per_class.csv").exists()
    assert (tmp_path / "test_summary.json").exists()
    # confusion + calibration (reference README advertises these reports
    # but ships no code): counts must tile N per class, ECE in [0, 1],
    # and the plots land when matplotlib is importable
    for row in rep["per_class"]:
        assert row["tp"] + row["fp"] + row["fn"] + row["tn"] == 50
    cal = rep["calibration"]
    assert 0.0 <= cal["ece"] <= 1.0
    assert sum(cal["bin_count"]) == 50 * 4
    if rep.get("plots"):
        import os

        assert os.path.exists(rep["plots"]["reliability"])
        assert os.path.exists(rep["plots"]["confusion"])


def test_calibration_report_perfect_and_bad():
    from mmrp_tpu.eval.classification import calibration_report

    # perfectly calibrated: prob == empirical frequency in every bin
    y = np.array([[0], [1]] * 50)
    p = np.full((100, 1), 0.5)
    cal = calibration_report(y, p)
    assert cal["ece"] < 1e-9
    # maximally miscalibrated: confident and always wrong
    y = np.ones((100, 1))
    p = np.full((100, 1), 0.05)
    cal = calibration_report(y, p)
    assert cal["ece"] > 0.9


def test_diversity_metrics(rng):
    same = np.tile(rng.standard_normal(8), (5, 1))
    assert embedding_diversity(same) < 1e-5
    diverse = rng.standard_normal((5, 8))
    assert embedding_diversity(diverse) > 0.3
    L = np.array([[1, 0], [1, 0], [1, 0]])
    assert label_diversity(L) == 0.0
    L2 = np.array([[1, 0], [0, 1]])
    assert label_diversity(L2) == 1.0


def test_diversity_report(rng, tmp_path):
    g = rng.standard_normal((20, 8)).astype(np.float32)
    ids = [f"i{k}" for k in range(20)]
    eng = RetrievalEngine(g, ids)
    labels = {i: (rng.random(4) < 0.5).astype(int) for i in ids}
    rep = diversity_report(eng, g[:3], ids[:3], labels, k=5,
                           out_csv=str(tmp_path / "div.csv"))
    assert 0 <= rep["mean_emb_diversity"] <= 2
    assert (tmp_path / "div.csv").exists()


def test_kg_probe(rng):
    emb = rng.standard_normal((10, 6)).astype(np.float32)
    emb[3] = 0
    h = embedding_health(emb)
    assert h["n_zero_norm"] == 1 and h["n_nan"] == 0
    node2id = {"label:a": 0, "label:b": 1, "x": 2}
    cov = label_node_coverage(node2id, ["a", "b", "c"])
    assert cov["n_present"] == 2 and cov["missing"] == ["c"]
    nn = nearest_neighbors(emb, node2id, ["label:a", "nope"], k=2)
    assert len(nn["label:a"]) == 2 and nn["nope"] == []


# ---------------- EDA ----------------


def _recs():
    return [
        {"id": "1", "report_text": "cardiomegaly seen", "labels": [1, 0, 0]},
        {"id": "2", "report_text": "clear lungs no findings", "labels": [0, 0, 0]},
        {"id": "3", "report_text": "effusion and cardiomegaly", "labels": [1, 1, 0]},
    ]


def test_eda_before_split(tmp_path):
    rep = eda_before_split(_recs(), ["a", "b", "c"], str(tmp_path / "eda.json"))
    assert rep["n_records"] == 3
    assert rep["n_zero_label"] == 1
    assert rep["prevalence"]["a"] == pytest.approx(2 / 3)
    assert (tmp_path / "eda.json").exists()


def test_drop_zero_and_after_split():
    recs = drop_zero_label_records(_recs())
    assert len(recs) == 2
    by_id = {r["id"]: r for r in recs}
    out = eda_after_split({"train": ["1"], "val": ["3"]}, by_id, ["a", "b", "c"])
    assert out["train"]["a"] == 1.0


def test_verification_flow_and_delta():
    recs = _recs()

    def fake_llm(prompt):
        # remove label "a" from report 0, add "c" to report 1
        return json.dumps([
            {"index": 0, "llm_status": "Wrong", "remove": ["a"], "add": []},
            {"index": 1, "llm_status": "Correct", "remove": [], "add": ["c"]},
            {"index": 2, "llm_status": "Correct", "remove": [], "add": []},
        ])

    v = LabelVerifier(complete=fake_llm, label_space=["a", "b", "c"], batch_size=8)
    verdicts = v.verify(recs)
    assert verdicts["1"].llm_status == "Wrong"
    after = apply_verdicts(recs, verdicts, ["a", "b", "c"])
    assert after[0]["labels"] == [0, 0, 0]
    assert after[1]["labels"] == [0, 0, 1]
    assert after[1]["final_labels"] == ["c"]
    delta = verification_delta(recs, after, ["a", "b", "c"])
    assert delta["added"] == 1 and delta["removed"] == 1


def test_verifier_offline_mode():
    v = LabelVerifier(complete=None, label_space=["a"])
    verdicts = v.verify(_recs()[:1])
    assert verdicts["1"].llm_status == "Unknown"
    after = apply_verdicts(_recs()[:1], verdicts, ["a", "b", "c"])
    assert after[0]["labels"] == [1, 0, 0]  # untouched


def test_verifier_retry_and_cache(tmp_path):
    calls = {"n": 0}

    def flaky(prompt):
        calls["n"] += 1
        if calls["n"] == 1:
            return "garbage"
        return json.dumps([{"index": 0, "llm_status": "Correct",
                            "remove": [], "add": []}])

    v = LabelVerifier(complete=flaky, label_space=["a"], max_retries=3,
                      backoff_s=0.0, cache_path=str(tmp_path / "v.json"))
    verdicts = v.verify([_recs()[0]])
    assert verdicts["1"].llm_status == "Correct"
    # cache: second verifier never calls the llm
    v2 = LabelVerifier(complete=None, cache_path=str(tmp_path / "v.json"),
                       label_space=["a"])
    verdicts2 = v2.verify([_recs()[0]])
    assert verdicts2["1"].llm_status == "Correct"


# ---------------- triplets ----------------


def test_pseudo_triplets(rng):
    labels = np.array([[1, 1, 0], [1, 1, 0], [0, 0, 1], [1, 0, 0]])
    ds = PseudoTripletDataset(["a", "b", "c", "d"], labels, pos_threshold=0.5, seed=0)
    t = ds.sample(0)
    assert t is not None
    q, p, n = t
    assert q == "a" and p in {"b", "d"} and n == "c"  # d has jaccard 0.5
    trips = list(ds)
    assert all(len(t) == 3 for t in trips)


def test_label_embedding_lookup(rng):
    table = rng.standard_normal((3, 4)).astype(np.float32)
    lookup = LabelEmbeddingLookup(table, {"r1": np.array([1, 0, 1])})
    assert lookup.label_indices("r1") == [0, 2]
    np.testing.assert_allclose(lookup.embeddings("r1"), table[[0, 2]])
    assert lookup.embeddings("unknown").shape == (0, 4)


# ---------------------------------------------------------------------------
# EDA visual diagnostics (dataEDAnLabeledCheck.py, data_phrase_check.py:61-110)
# ---------------------------------------------------------------------------


def test_mesh_label_stats(tmp_path):
    from mmrp_tpu.eval.eda import mesh_label_stats

    xml = tmp_path / "xml"
    xml.mkdir()
    (xml / "1.xml").write_text(
        "<eCitation><MeSH><major>Cardiomegaly/severe</major>"
        "<major>Pleural Effusion</major></MeSH></eCitation>"
    )
    (xml / "2.xml").write_text(
        "<eCitation><MeSH><major>cardiomegaly</major>"
        "<major>Totally Made Up Term</major></MeSH></eCitation>"
    )
    rep = mesh_label_stats(str(xml), out_dir=str(tmp_path / "eda"),
                           min_count_threshold=1)
    assert rep["n_xml_files"] == 2
    # qualifier stripped + lowercased -> the two cardiomegaly rows merge
    assert rep["mesh_counts"]["cardiomegaly"] == 2
    assert "totally made up term" in rep["unmapped_terms"]
    # cardiomegaly is a taxonomy phrase -> mapped
    assert "cardiomegaly" not in rep["unmapped_terms"]
    assert (tmp_path / "eda" / "mesh_label_stats.json").exists()
    assert (tmp_path / "eda" / "mesh_term_counts.png").exists()


def test_dicom_debug_and_label_plots(tmp_path):
    from mmrp_tpu.data import dicom as D
    from mmrp_tpu.eval.eda import dicom_debug_plots, label_distribution_plot

    rng = np.random.default_rng(0)
    arr = (rng.random((32, 32)) * 3000).astype(np.uint16)
    p = tmp_path / "x.dcm"
    D.write_dicom(p, arr, window_center=1500, window_width=3000)
    stats = dicom_debug_plots(str(p), str(tmp_path / "eda"))
    assert stats["raw_max"] > stats["raw_min"]
    assert 0.0 <= stats["norm_min"] <= stats["norm_max"] <= 1.0
    assert (tmp_path / "eda" / "dicom_debug.png").exists()
    assert (tmp_path / "eda" / "final_norm.png").exists()

    out = label_distribution_plot(
        np.array([[1, 0], [1, 1]]), ["a", "b"], str(tmp_path / "dist.png")
    )
    assert (tmp_path / "dist.png").exists()
