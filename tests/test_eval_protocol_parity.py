"""Two-stack EVAL-PROTOCOL parity vs the reference's ACTUAL eval code.

VERDICT r4 #6: the day real OpenI data lands, "bit-for-metric parity"
must be data entry, not debugging. This file runs the reference's own
evaluation/protocol code (pure numpy/sklearn/pandas — loaded straight
from /root/reference/src with heavyweight imports stubbed) on synthetic
artifacts and asserts metric-for-metric equality with mmrp_tpu's eval
stack:

- retrieval metrics P@k / R@k / AP / mAP / MRR / nDCG incl. edge cases
  (empty relevant, no hits, k > len)      — Helpers/retrieval_metrics.py:4-89
- label-overlap ground-truth builder (generalization + historical)
                                           — Helpers/contructGT.py:19-120
- classification protocol: PR-curve F1-optimal thresholds, strict->
  binarization, per-class AUROC/AP/P/R/F1, macro/micro aggregates,
  micro AP — incl. TIED scores (sklearn's grouped operating points)
                                           — Evaluate/eval_on_test.py:29-38,130-172
"""
from __future__ import annotations

import importlib.util
import json
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from mmrp_tpu.eval import metrics as our_metrics
from mmrp_tpu.eval.gt import build_label_overlap_gt

REF = Path("/root/reference/src")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference tree not available"
)

pd = pytest.importorskip("pandas")
pytest.importorskip("sklearn")


def _load_file(name: str, path: Path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_metrics():
    # pure numpy module, imports standalone
    return _load_file("ref_retrieval_metrics",
                      REF / "Helpers" / "retrieval_metrics.py")


@pytest.fixture(scope="module")
def ref_gt(tmp_path_factory):
    """contructGT executed with a fake __file__ so its module-level
    BASE_DIR/GT_DIR.mkdir lands in a writable tmp tree instead of the
    read-only reference checkout."""
    fake_root = tmp_path_factory.mktemp("refgt")
    fake_file = fake_root / "src" / "Helpers" / "contructGT.py"
    src = (REF / "Helpers" / "contructGT.py").read_text()
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))  # for `from LabelData import ...`
    ns = {"__file__": str(fake_file), "__name__": "ref_contructGT"}
    exec(compile(src, str(fake_file), "exec"), ns)  # noqa: S102
    return types.SimpleNamespace(create_gt=ns["create_gt"])


@pytest.fixture(scope="module")
def ref_eval():
    """eval_on_test with Model/DataHandler/Helpers stubbed (only the
    pure-numpy protocol pieces are exercised; the real safe_* metric fns
    come from the reference's own helper.py via test_reference_parity's
    loader pattern)."""
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    for name, attrs in (
        ("Model", {"MultiModalRetrievalModel": object}),
        ("DataHandler", {"build_dataloader": lambda *a, **k: None,
                         "parse_openi_xml": lambda *a, **k: []}),
    ):
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
    # MERGE into any existing Helpers stub (test_reference_parity installs
    # one with load_hf_model_or_local/download_swin — replacing the module
    # wholesale would break its session-cached reference modules)
    helpers = sys.modules.get("Helpers")
    if helpers is None:
        helpers = types.ModuleType("Helpers")
        sys.modules["Helpers"] = helpers
    if not hasattr(helpers, "Config"):
        helpers.Config = types.SimpleNamespace(
            load=lambda *a, **k: types.SimpleNamespace())
    if not hasattr(helpers, "log_and_print"):
        helpers.log_and_print = lambda *a, **k: None
    helper = sys.modules.get("refhelper")
    if helper is None:
        # load the REAL helper.py for safe_roc_auc / safe_avg_precision —
        # helper.py:33 needs a permissive Config at import time
        sys.modules["Helpers"].Config = types.SimpleNamespace(
            load=lambda *a, **k: types.SimpleNamespace())
        helper = _load_file("refhelper", REF / "Helpers" / "helper.py")
    sys.modules["Helpers"].safe_roc_auc = helper.safe_roc_auc
    sys.modules["Helpers"].safe_avg_precision = helper.safe_avg_precision
    mod = _load_file("ref_eval_on_test", REF / "Evaluate" / "eval_on_test.py")
    return types.SimpleNamespace(eval=mod, helper=helper)


# ---------------------------------------------------------------------------
# Retrieval metrics (Helpers/retrieval_metrics.py)
# ---------------------------------------------------------------------------


def _random_queries(rng, n=40, gallery=60, kmax=12):
    ids = [f"g{i}" for i in range(gallery)]
    retrieved, relevant = [], []
    for _ in range(n):
        retrieved.append(list(rng.choice(ids, size=kmax, replace=False)))
        nrel = int(rng.integers(0, 20))
        relevant.append(set(rng.choice(ids, size=nrel, replace=False)))
    # edge cases: empty relevant; everything relevant; k > retrieved len
    retrieved.append(list(rng.choice(ids, size=3, replace=False)))
    relevant.append(set())
    retrieved.append(list(rng.choice(ids, size=kmax, replace=False)))
    relevant.append(set(ids))
    return retrieved, relevant


def test_retrieval_metrics_parity(ref_metrics, rng):
    retrieved, relevant = _random_queries(rng)
    for k in (1, 3, 5, 10, 15):
        for ret, rel in zip(retrieved, relevant):
            assert our_metrics.precision_at_k(ret, rel, k) == pytest.approx(
                ref_metrics.precision_at_k(ret, rel, k)), (k, ret, rel)
            assert our_metrics.recall_at_k(ret, rel, k) == pytest.approx(
                ref_metrics.recall_at_k(ret, rel, k))
            assert our_metrics.ndcg_at_k(ret, rel, k) == pytest.approx(
                ref_metrics.ndcg_at_k(ret, rel, k))
            assert our_metrics.average_precision(ret, rel, k) == pytest.approx(
                ref_metrics.average_precision(ret, rel, k))
        assert our_metrics.mean_average_precision(
            retrieved, relevant, k) == pytest.approx(
            ref_metrics.mean_average_precision(retrieved, relevant, k))
    assert our_metrics.mean_reciprocal_rank(retrieved, relevant) == (
        pytest.approx(ref_metrics.mean_reciprocal_rank(retrieved, relevant)))


# ---------------------------------------------------------------------------
# Ground-truth builder (Helpers/contructGT.py)
# ---------------------------------------------------------------------------


def test_gt_builder_parity(ref_gt, rng, tmp_path):
    label_cols = [f"lab{i}" for i in range(6)]
    groups = {c: [c] for c in label_cols}
    n_test, n_train = 25, 40
    test_ids = [f"t{i}" for i in range(n_test)]
    train_ids = [f"r{i}" for i in range(n_train)]
    test_labels = (rng.random((n_test, 6)) < 0.3).astype(int)
    train_labels = (rng.random((n_train, 6)) < 0.3).astype(int)
    # one all-zero test row: no shared labels with anything
    test_labels[3] = 0

    split_dir = tmp_path / "split"
    split_dir.mkdir()
    pd.DataFrame({"id": test_ids, **{c: test_labels[:, j]
                  for j, c in enumerate(label_cols)}}).to_csv(
        split_dir / "openi_test_labeled.csv", index=False)
    pd.DataFrame({"id": train_ids, **{c: train_labels[:, j]
                  for j, c in enumerate(label_cols)}}).to_csv(
        split_dir / "openi_train_labeled.csv", index=False)
    (split_dir / "test_split_ids.json").write_text(json.dumps(test_ids))
    (split_dir / "train_split_ids.json").write_text(json.dumps(train_ids))

    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    ref_gt.create_gt(split_dir=split_dir, gt_save_dir=gt_dir,
                     combined_groups=groups)
    ref_general = json.loads((gt_dir / "test_relevance.json").read_text())
    ref_hist = json.loads(
        (gt_dir / "test_to_train_relevance.json").read_text())

    ours_general = build_label_overlap_gt(
        test_ids, test_labels, test_ids, test_labels)
    ours_hist = build_label_overlap_gt(
        test_ids, test_labels, train_ids, train_labels, exclude_self=False)
    assert ours_general == ref_general
    assert ours_hist == ref_hist


# ---------------------------------------------------------------------------
# Classification protocol (Evaluate/eval_on_test.py:29-38,130-172)
# ---------------------------------------------------------------------------


def _synthetic_cls(rng, n=80, c=12, tied=False):
    y_true = (rng.random((n, c)) < 0.35).astype(int)
    y_true[:, 0] = 0  # degenerate: no positives -> NaN AUROC/AP
    y_true[:, 1] = 1  # degenerate: no negatives
    y_prob = rng.random((n, c))
    # make scores loosely informative so thresholds are non-trivial
    y_prob = 0.6 * y_prob + 0.4 * y_true * rng.random((n, c))
    if tied:
        y_prob = np.round(y_prob, 1)  # heavy score ties
    return y_true.astype(np.float64), y_prob


def _reference_protocol(ref_eval, y_true, y_prob):
    from sklearn.metrics import (average_precision_score, f1_score,
                                 precision_score, recall_score)

    best_ts = ref_eval.eval._find_best_thresholds(y_true, y_prob)
    y_bin = (y_prob > best_ts[None, :]).astype(int)
    class_aucs = ref_eval.helper.safe_roc_auc(y_true, y_prob)
    class_aps = ref_eval.helper.safe_avg_precision(y_true, y_prob)
    return {
        "thresholds": best_ts,
        "auroc": class_aucs,
        "ap": class_aps,
        "prec": precision_score(y_true, y_bin, average=None, zero_division=0),
        "rec": recall_score(y_true, y_bin, average=None, zero_division=0),
        "f1": f1_score(y_true, y_bin, average=None, zero_division=0),
        "macro_auc": float(np.nanmean(class_aucs)),
        "macro_ap": float(np.nanmean(class_aps)),
        "macro_f1": float(f1_score(y_true, y_bin, average="macro",
                                   zero_division=0)),
        "micro_f1": float(f1_score(y_true, y_bin, average="micro",
                                   zero_division=0)),
        "macro_prec": float(precision_score(y_true, y_bin, average="macro",
                                            zero_division=0)),
        "macro_rec": float(recall_score(y_true, y_bin, average="macro",
                                        zero_division=0)),
        "micro_prec": float(precision_score(y_true, y_bin, average="micro",
                                            zero_division=0)),
        "micro_rec": float(recall_score(y_true, y_bin, average="micro",
                                        zero_division=0)),
        "micro_ap": float(average_precision_score(y_true, y_prob,
                                                  average="micro")),
    }


@pytest.mark.parametrize("tied", [False, True])
def test_classification_protocol_parity(ref_eval, rng, tied):
    y_true, y_prob = _synthetic_cls(rng, tied=tied)
    ref = _reference_protocol(ref_eval, y_true, y_prob)

    ts = our_metrics.find_best_thresholds(y_true, y_prob)
    np.testing.assert_allclose(ts, ref["thresholds"], rtol=0, atol=0,
                               err_msg="PR-curve F1-optimal thresholds")
    names = [f"c{i}" for i in range(y_true.shape[1])]
    rep = our_metrics.per_class_report(y_true, y_prob, ts, names)
    rows = rep["per_class"]
    np.testing.assert_allclose([r["auroc"] for r in rows], ref["auroc"],
                               atol=1e-12, err_msg="per-class AUROC")
    np.testing.assert_allclose([r["ap"] for r in rows], ref["ap"],
                               atol=1e-12, err_msg="per-class AP")
    np.testing.assert_allclose([r["precision"] for r in rows], ref["prec"],
                               atol=1e-12)
    np.testing.assert_allclose([r["recall"] for r in rows], ref["rec"],
                               atol=1e-12)
    np.testing.assert_allclose([r["f1"] for r in rows], ref["f1"], atol=1e-12)
    for ours_key, ref_key in (
        ("macro_auroc", "macro_auc"), ("macro_ap", "macro_ap"),
        ("macro_f1", "macro_f1"), ("micro_f1", "micro_f1"),
        ("macro_precision", "macro_prec"), ("macro_recall", "macro_rec"),
        ("micro_precision", "micro_prec"), ("micro_recall", "micro_rec"),
        ("micro_ap", "micro_ap"),
    ):
        assert rep[ours_key] == pytest.approx(ref[ref_key], abs=1e-12), (
            ours_key)


def test_pr_curve_matches_sklearn(rng):
    from sklearn.metrics import precision_recall_curve

    for tied in (False, True):
        for _ in range(5):
            y = (rng.random(50) < 0.4).astype(int)
            s = rng.random(50)
            if tied:
                s = np.round(s, 1)
            if y.sum() in (0, len(y)):
                continue
            p0, r0, t0 = precision_recall_curve(y, s)
            p1, r1, t1 = our_metrics.pr_curve(y, s)
            np.testing.assert_allclose(p1, p0, atol=1e-12)
            np.testing.assert_allclose(r1, r0, atol=1e-12)
            np.testing.assert_allclose(t1, t0, atol=1e-12)
