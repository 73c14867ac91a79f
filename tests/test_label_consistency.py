from mmrp_tpu.data.splits import check_label_consistency


def test_label_consistency_detects_mismatch():
    records = [
        {"id": "a", "labels": [1, 0, 1]},
        {"id": "b", "labels": [0, 1, 0]},
    ]
    table = {"a": [1, 0, 1], "b": [1, 1, 0], "c": [0, 0, 0]}
    bad = check_label_consistency(records, table)
    assert bad == ["b"]


def test_label_consistency_ignores_missing():
    records = [{"id": "x", "labels": [1]}]
    assert check_label_consistency(records, {}) == []
