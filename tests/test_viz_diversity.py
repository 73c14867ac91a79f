import numpy as np
import pytest

from mmrp_tpu.train.swin_finetune import build_finetune_subset
from mmrp_tpu.utils.viz import overlay_rgb, save_query_overlays


def test_overlay_rgb_blend(rng):
    g = rng.random((16, 16))
    h = np.zeros((16, 16))
    h[4, 4] = 1.0
    rgb = overlay_rgb(g, h)
    assert rgb.shape == (16, 16, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    # heat point shows more red than blue relative to neighbors
    assert rgb[4, 4, 0] > rgb[4, 4, 2] - 0.5


def test_overlay_resizes_heatmap(rng):
    g = rng.random((32, 32))
    h = rng.random((8, 8))
    assert overlay_rgb(g, h).shape == (32, 32, 3)


def test_save_query_overlays(tmp_path, rng):
    g = rng.random((8, 8))
    maps = {"attn": rng.random((8, 8)), "ig": rng.random((8, 8))}
    written = save_query_overlays(str(tmp_path), "q1", g, maps)
    assert set(written) == {"attn", "ig"}
    for p in written.values():
        assert (tmp_path / p.split("/")[-1]).exists()
    written2 = save_query_overlays(str(tmp_path), "q1", g, maps, result_id="r9")
    assert "q1_r9_attn.png" in written2["attn"]


def test_build_finetune_subset_balances(rng):
    records = []
    C = 4
    # label 0: 500 positives; label 3: only 6
    for i in range(600):
        vec = [0] * C
        if i < 500:
            vec[0] = 1
        if i % 100 == 0:
            vec[3] = 1
        if i % 3 == 0:
            vec[1] = 1
        records.append({"id": str(i), "labels": vec})
    sub = build_finetune_subset(records, max_per_label=50, min_per_label=3, seed=0)
    labels = np.stack([r["labels"] for r in sub])
    assert labels[:, 0].sum() <= 150  # capped (with retry relaxation)
    assert labels[:, 3].sum() >= 3    # rare label retained
    assert len(sub) < len(records)
