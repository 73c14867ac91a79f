import numpy as np
import jax.numpy as jnp

from mmrp_tpu.eval import metrics as M


RETRIEVED = ["a", "b", "c", "d", "e"]
RELEVANT = {"b", "d", "z"}


def test_precision_at_k():
    assert M.precision_at_k(RETRIEVED, RELEVANT, k=5) == 2 / 5
    assert M.precision_at_k(RETRIEVED, RELEVANT, k=2) == 1 / 2


def test_recall_at_k():
    assert M.recall_at_k(RETRIEVED, RELEVANT, k=5) == 2 / 3
    assert M.recall_at_k(RETRIEVED, set(), k=5) == 0.0


def test_average_precision_hand_computed():
    # hits at ranks 2 and 4: AP = (1/2 + 2/4) / 3
    ap = M.average_precision(RETRIEVED, RELEVANT)
    assert abs(ap - (0.5 + 0.5) / 3) < 1e-12


def test_mrr():
    mrr = M.mean_reciprocal_rank([RETRIEVED, ["x", "y"]], [RELEVANT, {"q"}])
    assert abs(mrr - (0.5 + 0.0) / 2) < 1e-12


def test_ndcg_hand_computed():
    # gains [0,1,0,1,0]; dcg = 1/log2(3) + 1/log2(5); idcg = 1/log2(2)+1/log2(3)
    got = M.ndcg_at_k(RETRIEVED, RELEVANT, k=5)
    dcg = 1 / np.log2(3) + 1 / np.log2(5)
    idcg = 1 / np.log2(2) + 1 / np.log2(3)
    assert abs(got - dcg / idcg) < 1e-12
    assert M.ndcg_at_k(["x"], RELEVANT, k=5) == 0.0


def test_batch_metrics_match_list_versions(rng):
    # random relevance patterns, compare vectorized vs reference-parity impls
    Q, K = 32, 10
    rel = (rng.random((Q, K)) < 0.3).astype(np.float32)
    n_rel_total = rel.sum(axis=1) + rng.integers(0, 3, Q)  # some relevant beyond K

    retrieved = [[f"i{q}_{i}" for i in range(K)] for q in range(Q)]
    relevant = []
    for q in range(Q):
        s = {f"i{q}_{i}" for i in range(K) if rel[q, i]}
        s |= {f"extra{q}_{j}" for j in range(int(n_rel_total[q] - rel[q].sum()))}
        relevant.append(s)

    p5 = np.array([M.precision_at_k(r, s, 5) for r, s in zip(retrieved, relevant)])
    np.testing.assert_allclose(
        np.asarray(M.precision_at_k_batch(jnp.array(rel), 5)), p5, atol=1e-6
    )

    r5 = np.array([M.recall_at_k(r, s, 5) for r, s in zip(retrieved, relevant)])
    np.testing.assert_allclose(
        np.asarray(M.recall_at_k_batch(jnp.array(rel), jnp.array(n_rel_total), 5)),
        r5,
        atol=1e-6,
    )

    ap = np.array([M.average_precision(r, s) for r, s in zip(retrieved, relevant)])
    np.testing.assert_allclose(
        np.asarray(M.average_precision_batch(jnp.array(rel), jnp.array(n_rel_total))),
        ap,
        atol=1e-6,
    )

    rr = np.array(
        [M.mean_reciprocal_rank([r], [s]) for r, s in zip(retrieved, relevant)]
    )
    np.testing.assert_allclose(
        np.asarray(M.reciprocal_rank_batch(jnp.array(rel))), rr, atol=1e-6
    )

    nd = np.array([M.ndcg_at_k(r, s, 5) for r, s in zip(retrieved, relevant)])
    np.testing.assert_allclose(
        np.asarray(M.ndcg_at_k_batch(jnp.array(rel), 5)), nd, atol=1e-6
    )


def test_safe_auroc_against_sklearn(rng):
    from sklearn.metrics import roc_auc_score, average_precision_score

    y = (rng.random(200) < 0.3).astype(int)
    s = rng.random(200)
    assert abs(M.safe_roc_auc(y, s) - roc_auc_score(y, s)) < 1e-9
    assert abs(M.safe_average_precision(y, s) - average_precision_score(y, s)) < 1e-9
    # ties
    s_tied = np.round(s, 1)
    assert abs(M.safe_roc_auc(y, s_tied) - roc_auc_score(y, s_tied)) < 1e-9
    # degenerate single-class -> NaN
    assert np.isnan(M.safe_roc_auc(np.zeros(10), s[:10]))
    assert np.isnan(M.safe_average_precision(np.ones(10), s[:10]))


def test_find_best_thresholds(rng):
    N, C = 500, 4
    y = (rng.random((N, C)) < 0.3).astype(int)
    p = np.clip(y * 0.6 + rng.random((N, C)) * 0.5, 0, 1)
    th = M.find_best_thresholds(y, p)
    assert th.shape == (C,)
    # thresholds should beat the default 0.5 on F1 (or match)
    for c in range(C):
        _, _, f1_best = M.prf1(y[:, c], p[:, c] >= th[c])
        _, _, f1_half = M.prf1(y[:, c], p[:, c] >= 0.5)
        assert f1_best >= f1_half - 1e-9


def test_per_class_report_shapes(rng):
    N, C = 100, 3
    y = (rng.random((N, C)) < 0.4).astype(int)
    p = rng.random((N, C))
    rep = M.per_class_report(y, p, np.full(C, 0.5), [f"c{i}" for i in range(C)])
    assert len(rep["per_class"]) == C
    assert 0 <= rep["micro_f1"] <= 1
    assert set(rep["per_class"][0]) >= {"auroc", "ap", "f1", "support"}
