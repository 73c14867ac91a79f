import numpy as np
import pytest

from mmrp_tpu.eval.retrieval_eval import embedding_rank_eval
from mmrp_tpu.parallel.collectives import mean_over_mesh
from mmrp_tpu.parallel.mesh import build_mesh


def test_mean_over_mesh_matches_numpy(rng):
    mesh = build_mesh(("dp",), (8,))
    vals = rng.standard_normal(37).astype(np.float32)  # not divisible by 8
    got = mean_over_mesh(mesh, vals)
    assert abs(got - vals.mean()) < 1e-5


def test_embedding_rank_eval_perfect(rng):
    # gallery contains near-duplicates of each query
    q = rng.standard_normal((5, 16)).astype(np.float32)
    g = np.concatenate([q + 1e-3, rng.standard_normal((20, 16)).astype(np.float32)])
    qids = [f"q{i}" for i in range(5)]
    gids = [f"dup{i}" for i in range(5)] + [f"g{i}" for i in range(20)]
    gt = {f"q{i}": [f"dup{i}"] for i in range(5)}
    res = embedding_rank_eval(q, qids, g, gids, gt, ks=(1, 5))
    assert res["Hit@1"] == 1.0
    assert res["MRR"] == 1.0
    assert res["R@5"] == 1.0


def test_embedding_rank_eval_excludes_self(rng):
    g = rng.standard_normal((10, 8)).astype(np.float32)
    ids = [f"i{k}" for k in range(10)]
    gt = {ids[0]: [ids[1]]}
    res = embedding_rank_eval(g[:1], ids[:1], g, ids, gt, ks=(1,))
    # self row masked; result depends on rank of i1 but must be finite
    assert 0.0 <= res["MRR"] <= 1.0
