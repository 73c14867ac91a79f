import json
import numpy as np
import pytest

from mmrp_tpu.data import dicom as D
from mmrp_tpu.data.openi import normalize_image_id, parse_openi_xml
from mmrp_tpu.data.splits import multilabel_stratified_split, train_val_test_split
from mmrp_tpu.labels import LABEL_COLS, NUM_CLASSES


def test_normalize_image_id():
    assert normalize_image_id("CXR3_1_IM-1384-2001") == "3_1_IM-1384-2001"
    assert normalize_image_id("CXR1192_IM-0096-2001") == "1192_IM-0096-2001"
    assert normalize_image_id("IMG123") is None
    assert normalize_image_id("") is None


REPORTS = [
    ("1", "Cardiomegaly with small pleural effusion."),
    ("2", "No acute disease. Lungs are clear."),
    ("3", "Right lower lobe pneumonia."),
    ("4", "Degenerative change of the spine. No pneumothorax."),
]


def _write_openi_fixture(tmp_path, rng):
    xml_dir = tmp_path / "xml"
    dcm_dir = tmp_path / "dcm"
    xml_dir.mkdir()
    dcm_dir.mkdir()
    for rid, text in REPORTS:
        xml = f"""<eCitation>
  <ArticleTitle>report {rid}</ArticleTitle>
  <Abstract><AbstractText Label="FINDINGS">{text}</AbstractText></Abstract>
  <parentImage id="CXR{rid}_IM-0001-1001"></parentImage>
</eCitation>"""
        (xml_dir / f"{rid}.xml").write_text(xml)
        arr = (rng.random((32, 32)) * 1000).astype(np.uint16)
        D.write_dicom(dcm_dir / f"{rid}_IM-0001-1001.dcm", arr)
    return str(xml_dir), str(dcm_dir)


def test_parse_openi_xml(tmp_path, rng):
    xml_dir, dcm_dir = _write_openi_fixture(tmp_path, rng)
    records = parse_openi_xml(xml_dir, dcm_dir)
    assert len(records) == 4
    by_id = {r["id"]: r for r in records}
    r1 = by_id["1_IM-0001-1001"]
    assert r1["labels"][LABEL_COLS.index("cardiac")] == 1
    assert r1["is_abnormal"] and not r1["is_normal"]
    r2 = by_id["2_IM-0001-1001"]
    assert r2["labels"][LABEL_COLS.index("Normal")] == 1
    assert r2["is_normal"]
    assert len(r2["labels"]) == NUM_CLASSES


def test_parse_cache_roundtrip(tmp_path, rng):
    xml_dir, dcm_dir = _write_openi_fixture(tmp_path, rng)
    cache = tmp_path / "cache.json"
    r1 = parse_openi_xml(xml_dir, dcm_dir, cache_path=str(cache))
    assert cache.exists()
    r2 = parse_openi_xml(xml_dir, dcm_dir, cache_path=str(cache))
    assert r1 == r2


def test_multilabel_stratified_split_proportions(rng):
    n, C = 1000, 10
    Y = (rng.random((n, C)) < np.linspace(0.02, 0.4, C)).astype(int)
    tr, va, te = multilabel_stratified_split(Y, [0.8, 0.1, 0.1], seed=1)
    assert len(tr) + len(va) + len(te) == n
    assert set(tr) | set(va) | set(te) == set(range(n))
    assert abs(len(tr) - 800) < 30
    # per-label proportions roughly preserved
    for c in range(C):
        tot = Y[:, c].sum()
        if tot >= 20:
            frac = Y[tr, c].sum() / tot
            assert 0.7 < frac < 0.9, (c, frac)


def test_split_determinism(rng):
    Y = (rng.random((200, 5)) < 0.2).astype(int)
    a = multilabel_stratified_split(Y, [0.8, 0.2], seed=7)
    b = multilabel_stratified_split(Y, [0.8, 0.2], seed=7)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_train_val_test_split_no_report_leak(tmp_path, rng):
    # 30 reports, some shared across 2 images (same text => same group)
    records = []
    for i in range(30):
        text = f"report text {i} with cardiomegaly" if i % 3 else "no acute disease"
        vec = [0] * NUM_CLASSES
        vec[LABEL_COLS.index("cardiac") if i % 3 else LABEL_COLS.index("Normal")] = 1
        for j in range(2):
            records.append(
                {"id": f"{i}_{j}", "report_text": text, "labels": vec}
            )
    splits = train_val_test_split(records, seed=3, out_dir=str(tmp_path / "splits"))
    all_ids = splits["train"] + splits["val"] + splits["test"]
    assert len(all_ids) == len(set(all_ids))
    # same report text must land in the same split
    text_of = {r["id"]: r["report_text"] for r in records}
    split_of = {}
    for name, ids in splits.items():
        for rid in ids:
            split_of[text_of[rid]] = split_of.get(text_of[rid], name)
            assert split_of[text_of[rid]] == name
    # artifacts written
    d = tmp_path / "splits"
    assert (d / "train_ids.json").exists()
    assert (d / "split_label_counts.json").exists()
    counts = json.loads((d / "split_label_counts.json").read_text())
    assert "train" in counts and "cardiac" in counts["train"]
