"""Entity-sharded KG eval == single-device eval, rank for rank.

Runs on the 8-device virtual CPU mesh (conftest). The sharded program
(kg/sharded_eval.py) must reproduce KGTrainer.evaluate's filtered-ranking
metrics exactly for every KGE model, including entity-count padding
(E not divisible by the mesh) and the known-positive mask.
"""

import numpy as np
import pytest

import jax

from mmrp_tpu.kg.models import KGModelConfig
from mmrp_tpu.kg.sharded_eval import evaluate_sharded, make_sharded_rank_fn
from mmrp_tpu.kg.trainer import KGTrainer, KGTrainerConfig
from mmrp_tpu.parallel.mesh import build_mesh


def _make_trainer(rng, name: str, E: int = 51, R: int = 5, n: int = 240):
    """Random graph; E=51 deliberately NOT divisible by the 8-way mesh."""
    triples = np.stack(
        [
            rng.integers(0, E, n),
            rng.integers(0, R, n),
            rng.integers(0, E, n),
        ],
        axis=1,
    ).astype(np.int32)
    # dedupe so confidence scaling is deterministic
    triples = np.unique(triples, axis=0)
    tr = KGTrainer(
        E,
        R,
        KGTrainerConfig(
            model=name, emb_dim=12, epochs=1, batch_size=64, neg_size=4,
            eval_chunk=10,  # several chunks + a padded last partial chunk
            num_layers=1,
        ),
    )
    tr.load_triples([tuple(t) for t in triples])
    return tr


@pytest.mark.parametrize("name", ["TransE", "TransH", "RotatE", "CompGCN"])
def test_sharded_eval_matches_single_device(rng, name):
    tr = _make_trainer(rng, name)
    mesh = build_mesh(("dp",), (8,))
    ref = tr.evaluate(tr.val_arr)
    got = evaluate_sharded(tr, tr.val_arr, mesh)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-6), (name, k, ref, got)


def test_sharded_eval_after_training_step(rng):
    """The sharded eval also agrees on TRAINED (non-random) tables."""
    tr = _make_trainer(rng, "TransE", E=40, n=200)
    tr.train()
    mesh = build_mesh(("dp",), (8,))
    ref = tr.evaluate(tr.val_arr)
    got = evaluate_sharded(tr, tr.val_arr, mesh)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-6)


def test_rank_fn_cached_across_calls(rng):
    """Per-epoch validation must reuse ONE jitted program (ADVICE r3:
    rebuilding it per call recompiles every epoch on real hardware)."""
    tr = _make_trainer(rng, "TransE", E=40, n=120)
    mesh = build_mesh(("dp",), (8,))
    a = make_sharded_rank_fn(tr.model_cfg, mesh, axis="dp", n_real=40,
                             tails=True)
    b = make_sharded_rank_fn(tr.model_cfg, mesh, axis="dp", n_real=40,
                             tails=True)
    assert a is b
    # and evaluate_sharded twice agrees with itself (cache reuse is safe)
    first = evaluate_sharded(tr, tr.val_arr, mesh)
    second = evaluate_sharded(tr, tr.val_arr, mesh)
    assert first == second


def test_rank_fn_brute_force():
    """Direct check of the SPMD rank program against numpy brute force,
    with hand-placed ties, filter pairs (incl. a duplicate that must not
    double-subtract), and padding rows."""
    E, D, B = 13, 4, 3  # pads to 16 rows over 8 shards (2 rows/shard)
    rng = np.random.default_rng(7)
    ent = rng.standard_normal((E, D)).astype(np.float32)
    ent[5] = ent[9]  # exact tie pair
    q = rng.standard_normal((B, D)).astype(np.float32)
    tgt = np.array([5, 0, 12], dtype=np.int32)
    # known-positive filter pairs; (1, 3) appears twice — dedup must hold
    rows_idx = np.array([0, 1, 1], dtype=np.int64)
    cols_idx = np.array([9, 3, 3], dtype=np.int64)
    mesh = build_mesh(("dp",), (8,))
    cfg = KGModelConfig(name="TransE", num_entities=E, num_relations=1,
                        emb_dim=D)
    fn = make_sharded_rank_fn(cfg, mesh, axis="dp", n_real=E, tails=True)
    ent_pad = np.concatenate([ent, np.zeros((3, D), np.float32)])
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mmrp_tpu.kg.sharded_eval import _pad_pairs

    pr, pc = _pad_pairs(rows_idx, cols_idx)
    rep = NamedSharding(mesh, P())
    ranks = np.asarray(
        fn(
            jax.device_put(q, rep),  # anchor_emb; rel fold adds zeros
            jax.device_put(np.zeros_like(q), rep),
            jax.device_put(np.zeros((B, 1), np.float32), rep),
            jax.device_put(tgt, rep),
            jax.device_put(pr, rep),
            jax.device_put(pc, rep),
            jax.device_put(ent_pad, NamedSharding(mesh, P("dp"))),
        )
    )
    # brute force (float32 throughout, same order of ops)
    scores = -np.abs(q[:, None, :] - ent[None, :, :]).sum(-1)
    mask = np.zeros((B, E), dtype=bool)
    mask[0, 9] = True  # the tie partner for row 0
    mask[1, 3] = True
    for b in range(B):
        ts = scores[b, tgt[b]]
        valid = ~mask[b]
        expect = 1 + int(((scores[b] > ts) & valid).sum())
        assert ranks[b] == expect
