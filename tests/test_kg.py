import json
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmrp_tpu.kg.builder import KGBuilder
from mmrp_tpu.kg.models import (
    KGModelConfig,
    init_params,
    make_score_all_fn,
    make_score_fn,
)
from mmrp_tpu.kg.trainer import KGTrainer, KGTrainerConfig, scale_confidences
from mmrp_tpu.kg.label_attention import LabelAttention, LabelAttentionTrainer, LabelAttentionTrainerConfig, jaccard_matrix
from mmrp_tpu.kg.ontology import OntologyMapper
from mmrp_tpu.ops.kg_ops import ccorr, compose, segment_mean_messages
from mmrp_tpu.labels import LABEL_COLS, NUM_CLASSES


# ---------------- ops ----------------


def test_ccorr_matches_naive(rng):
    a = rng.standard_normal(8).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    got = np.asarray(ccorr(jnp.asarray(a), jnp.asarray(b)))
    naive = np.array([sum(a[k] * b[(k + i) % 8] for k in range(8)) for i in range(8)])
    np.testing.assert_allclose(got, naive, atol=1e-4)


def test_compose_ops(rng):
    e = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    np.testing.assert_allclose(np.asarray(compose(e, r, "sub")), np.asarray(e - r))
    np.testing.assert_allclose(np.asarray(compose(e, r, "mult")), np.asarray(e * r))
    assert compose(e, r, "corr").shape == (4, 8)
    with pytest.raises(ValueError):
        compose(e, r, "xor")


def test_segment_mean_messages():
    msgs = jnp.asarray([[1.0, 0.0], [3.0, 0.0], [5.0, 2.0]])
    dst = jnp.asarray([0, 0, 2])
    out = np.asarray(segment_mean_messages(msgs, dst, 3))
    np.testing.assert_allclose(out[0], [2.0, 0.0])  # mean of first two
    np.testing.assert_allclose(out[1], [0.0, 0.0])  # no in-edges
    np.testing.assert_allclose(out[2], [5.0, 2.0])


# ---------------- scoring models ----------------


@pytest.mark.parametrize("name", ["TransE", "TransH", "RotatE", "CompGCN"])
def test_kge_score_shapes_and_score_all_consistency(rng, name):
    E, R, D = 20, 4, 8
    kwargs = {}
    if name == "CompGCN":
        edges = rng.integers(0, E, (30, 2)).astype(np.int32)
        rels = rng.integers(0, R, 30).astype(np.int32)
        kwargs = dict(edge_src=edges[:, 0], edge_dst=edges[:, 1], edge_rel=rels,
                      num_layers=1, opn="sub")
    cfg = KGModelConfig(name=name, num_entities=E, num_relations=R, emb_dim=D, **kwargs)
    params = init_params(cfg, jax.random.PRNGKey(0))
    score = make_score_fn(cfg)
    s = jnp.asarray([1, 2, 3])
    r = jnp.asarray([0, 1, 2])
    o = jnp.asarray([4, 5, 6])
    sc = score(params, s, r, o)
    assert sc.shape == (3,)
    assert np.isfinite(np.asarray(sc)).all()

    # score_all(tails) column o must equal direct score(s, r, o)
    score_all = make_score_all_fn(cfg, tails=True)
    allsc = np.asarray(score_all(params, s, r))
    assert allsc.shape == (3, E)
    direct = np.asarray(sc)
    picked = allsc[np.arange(3), np.asarray(o)]
    np.testing.assert_allclose(picked, direct, atol=1e-4)

    # head variant consistency
    score_all_h = make_score_all_fn(cfg, tails=False)
    allh = np.asarray(score_all_h(params, o, r))
    picked_h = allh[np.arange(3), np.asarray(s)]
    np.testing.assert_allclose(picked_h, direct, atol=1e-4)


def test_transe_translation_property():
    # perfectly translated triple scores higher than a corrupted one
    cfg = KGModelConfig("TransE", num_entities=3, num_relations=1, emb_dim=4)
    params = {
        "ent": jnp.asarray([[0.0, 0, 0, 0], [1, 1, 0, 0], [5, 5, 5, 5]]),
        "rel": jnp.asarray([[1.0, 1, 0, 0]]),
    }
    score = make_score_fn(cfg)
    good = float(score(params, jnp.array([0]), jnp.array([0]), jnp.array([1]))[0])
    bad = float(score(params, jnp.array([0]), jnp.array([0]), jnp.array([2]))[0])
    assert good == 0.0 and good > bad


# ---------------- trainer ----------------


def test_scale_confidences_reference_semantics():
    triples = [(0, 0, 1), (0, 0, 1), (2, 0, 3)]
    conf = scale_confidences(triples, [1.0, 1.0, 1.0],
                             ["curated", "extracted", "ontology"])
    # duplicate triple -> freq 2 downweight log1p(2); curated x3, extracted x0.7
    assert abs(conf[0] - 3.0 / np.log1p(2)) < 1e-6
    assert abs(conf[1] - 0.7 / np.log1p(2)) < 1e-6
    assert abs(conf[2] - 1.0 / np.log1p(1)) < 1e-6


def _toy_graph(rng, E=30, R=3, n=300):
    # structured graph: relation r maps cluster c -> cluster (c+r) mod 3
    triples = []
    for _ in range(n):
        s = int(rng.integers(0, E))
        r = int(rng.integers(0, R))
        o = (s + r * 7) % E  # deterministic structure -> learnable
        triples.append((s, r, o))
    return triples


def test_kg_trainer_learns_structure(rng):
    triples = _toy_graph(rng)
    cfg = KGTrainerConfig(model="TransE", emb_dim=16, epochs=12, batch_size=128,
                          lr=5e-2, neg_size=8, patience=12, seed=0)
    tr = KGTrainer(num_entities=30, num_relations=3, cfg=cfg)
    tr.load_triples(triples)
    before = tr.evaluate(tr.val_arr)
    best = tr.train()
    assert best["mrr"] > before["mrr"]
    assert best["mrr"] > 0.3  # structured graph should be well fit


def test_kg_trainer_inject_and_save_load(rng, tmp_path):
    triples = _toy_graph(rng, n=100)
    cfg = KGTrainerConfig(model="TransE", emb_dim=8, epochs=1, batch_size=64,
                          neg_size=4, seed=1)
    tr = KGTrainer(30, 3, cfg)
    tr.load_triples(triples)
    feats = {0: rng.standard_normal(20).astype(np.float32)}  # dim mismatch -> proj
    tr.inject_entity_features(feats)
    ent = np.asarray(tr.params["ent"])
    np.testing.assert_allclose(np.linalg.norm(ent, axis=1), 1.0, atol=1e-5)
    tr.train()
    tr.save(str(tmp_path), node_names=[f"n{i}" for i in range(30)])
    emb, meta = KGTrainer.load_embeddings(str(tmp_path))
    assert emb.shape == (30, 8)
    assert meta["model"] == "TransE"
    # pad / truncate behavior
    emb16, _ = KGTrainer.load_embeddings(str(tmp_path), expected_dim=16)
    assert emb16.shape == (30, 16)
    np.testing.assert_allclose(emb16[:, :8], emb)
    emb4, _ = KGTrainer.load_embeddings(str(tmp_path), expected_dim=4)
    assert emb4.shape == (30, 4)
    with pytest.raises(ValueError):
        KGTrainer.load_embeddings(str(tmp_path), expected_dim=16, strict_shapes=True)


# ---------------- builder ----------------


def _records():
    vec1 = [0] * NUM_CLASSES
    vec1[LABEL_COLS.index("cardiac")] = 1
    vec1[LABEL_COLS.index("pleural_findings")] = 1
    vec2 = [0] * NUM_CLASSES
    vec2[LABEL_COLS.index("Normal")] = 1
    return [
        {"id": "1_A", "report_text": "x", "labels": vec1},
        {"id": "2_B", "report_text": "y", "labels": vec2},
    ]


def test_builder_dataset_triples(tmp_path):
    b = KGBuilder(out_dir=str(tmp_path))
    b.build_from_records(_records())
    b.save()
    b2 = KGBuilder.load(str(tmp_path))
    assert b2.nodes == b.nodes
    rel_names = set(b.relations)
    assert {"REPORT_OF", "HAS_DISEASE", "HAS_FINDING", "HAS_NORMAL"} <= rel_names
    assert "report:1_A" in b.nodes and "image:1_A" in b.nodes
    assert "label:cardiac" in b.nodes
    arr, conf, src = b2.triple_arrays()
    assert arr.shape[1] == 3 and len(conf) == len(src) == arr.shape[0]
    # 2 REPORT_OF + 2 labels for rec1 + 1 label for rec2 = 5 triples
    assert arr.shape[0] == 5


def test_builder_doid_obo(tmp_path):
    obo = tmp_path / "doid.obo"
    obo.write_text(
        "format-version: 1.2\n\n[Term]\nid: DOID:1\nname: disease a\n"
        'synonym: "illness a" EXACT []\nxref: MESH:D001\n\n'
        "[Term]\nid: DOID:2\nname: disease b\nis_a: DOID:1 ! disease a\n\n"
        "[Typedef]\nid: part_of\n"
    )
    b = KGBuilder(out_dir=str(tmp_path / "kg"))
    n = b.add_doid_obo(str(obo))
    assert n == 2
    assert "doid:DOID:1" in b.nodes
    assert "doid:DOID:2" in b.nodes
    assert b.entity_meta["doid:DOID:1"]["name"] == "disease a"
    rels = {r for _, r, *_ in [(t[0], list(b.relations)[t[1]], t[2]) for t in b.triples]}
    assert "IS_A" in b.relations and "SYNONYM" in b.relations and "XREF" in b.relations


def test_builder_radlex_owl(tmp_path):
    owl = tmp_path / "radlex.owl"
    owl.write_text(
        '<?xml version="1.0"?>\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">\n'
        '<owl:Class rdf:about="http://radlex.org/RID/RID1">'
        "<rdfs:label>thorax</rdfs:label></owl:Class>\n"
        '<owl:Class rdf:about="http://radlex.org/RID/RID2">'
        '<rdfs:subClassOf rdf:resource="http://radlex.org/RID/RID1"/></owl:Class>\n'
        "</rdf:RDF>"
    )
    b = KGBuilder(out_dir=str(tmp_path / "kg"))
    n = b.add_radlex_owl(str(owl))
    assert n == 2
    assert "radlex:RID1" in b.nodes and "radlex:RID2" in b.nodes
    assert b.entity_meta["radlex:RID1"]["name"] == "thorax"


def test_builder_curated_and_mapping(tmp_path):
    csv_p = tmp_path / "curated.csv"
    csv_p.write_text("s,r,o,confidence\nlabel:cardiac,RELATED_TO,doid:DOID:9,0.9\n")
    b = KGBuilder(out_dir=str(tmp_path / "kg"))
    assert b.add_curated_csv(str(csv_p)) == 1
    assert b.triples[0][3] == 0.9 and b.triples[0][4] == "curated"
    b.add_label_ontology_mapping({"cardiac": "doid:DOID:9", "skip": "LOCAL:"})
    assert "MAPS_TO" in b.relations
    assert len(b.triples) == 2  # LOCAL: mapping skipped


def test_builder_ensure_exists(tmp_path):
    calls = []

    def build(b):
        calls.append(1)
        b.build_from_records(_records())

    b1 = KGBuilder(out_dir=str(tmp_path)).ensure_exists(build)
    b2 = KGBuilder(out_dir=str(tmp_path)).ensure_exists(build)
    assert len(calls) == 1  # second call hits the cache
    assert b2.nodes == b1.nodes


# ---------------- label attention ----------------


def test_label_attention_module(rng):
    la = LabelAttention(hidden_dim=16)
    embs = jnp.asarray(rng.standard_normal((2, 5, 8)), jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]], jnp.float32)
    params = la.init(jax.random.PRNGKey(0), embs, mask)
    pooled, w = la.apply(params, embs, mask)
    assert pooled.shape == (2, 8)
    w = np.asarray(w)
    np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-5)
    assert w[0, 3:].max() < 1e-6  # masked slots get no weight
    # single-label row pools to exactly that embedding
    np.testing.assert_allclose(np.asarray(pooled[1]), np.asarray(embs[1, 0]), atol=1e-5)


def test_label_attention_trainer_runs(rng):
    table = rng.standard_normal((NUM_CLASSES, 16)).astype(np.float32)
    label_vectors = (rng.random((40, NUM_CLASSES)) < 0.1).astype(np.float32)
    label_sets = [list(np.where(v)[0]) for v in label_vectors]
    cfg = LabelAttentionTrainerConfig(hidden_dim=16, batch_size=20, epochs=3,
                                      max_labels=8, seed=0)
    tr = LabelAttentionTrainer(table, cfg)
    best = tr.train(label_sets, label_vectors)
    assert np.isfinite(best["loss"])
    pooled = tr.pool(label_sets[:5])
    assert pooled.shape == (5, 16)
    ev = tr.eval_retrieval(label_sets, label_vectors)
    assert "recall@5" in ev


def test_label_attention_checkpoint_roundtrip(rng, tmp_path):
    table = rng.standard_normal((10, 8)).astype(np.float32)
    tr = LabelAttentionTrainer(table, LabelAttentionTrainerConfig(hidden_dim=8, max_labels=4))
    tr.init(jax.random.PRNGKey(0))
    p = str(tmp_path / "la.npz")
    tr.save(p)
    tr2 = LabelAttentionTrainer.from_checkpoint(p, table)
    sets = [[0, 1], [2]]
    np.testing.assert_allclose(tr.pool(sets), tr2.pool(sets), atol=1e-6)


def test_jaccard_matrix():
    L = np.array([[1, 1, 0], [1, 0, 0], [0, 0, 0]])
    J = jaccard_matrix(L)
    assert J[0, 1] == 0.5
    assert J[0, 0] == 1.0
    assert J[2, 2] == 0.0  # empty sets -> 0 by convention


def test_jaccard_matrix_matches_definition():
    """The matmul form must equal the direct set definition exactly."""
    rng = np.random.default_rng(0)
    L = (rng.random((17, 9)) < 0.3)
    J = jaccard_matrix(L)
    inter = (L[:, None, :] & L[None, :, :]).sum(-1)
    union = (L[:, None, :] | L[None, :, :]).sum(-1)
    want = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    np.testing.assert_allclose(J, want, atol=0)


# ---------------- ontology mapper ----------------


def test_ontology_mapper_cascade(tmp_path):
    known = {"cardiomegaly": "DOID:123", "pneumonia": "DOID:552"}
    calls = {"bp": 0, "llm": 0}

    def bioportal(term):
        calls["bp"] += 1
        return "RADLEX:999" if term == "opacity" else None

    def llm(term):
        calls["llm"] += 1
        return "pneumonia" if "pneumonias" in term else None

    m = OntologyMapper(known, cache_path=str(tmp_path / "c.json"),
                       bioportal_lookup=bioportal, llm_normalize=llm)
    assert m.map_label("Cardiomegaly") == "DOID:123"          # exact (case-insensitive)
    assert m.map_label("cardiomegalies") == "DOID:123"        # fuzzy
    assert m.map_label("opacity") == "RADLEX:999"             # bioportal
    assert m.map_label("viral pneumonias") == "DOID:552"      # llm normalize
    assert m.map_label("zzz unknown").startswith("LOCAL:")    # fallback
    # cache hit does not re-call network
    bp_before = calls["bp"]
    assert m.map_label("opacity") == "RADLEX:999"
    assert calls["bp"] == bp_before
    rep = m.coverage_report()
    assert rep["total"] >= 5 and 0 < rep["mapped_frac"] < 1
    # cache persisted
    m2 = OntologyMapper(known, cache_path=str(tmp_path / "c.json"))
    assert m2.map_label("opacity") == "RADLEX:999"


def test_ensure_label_embeddings(rng, tmp_path):
    import json as _json

    emb = rng.standard_normal((4, 6)).astype(np.float32)
    np.save(tmp_path / "node_embeddings.npy", emb)
    (tmp_path / "node2id.json").write_text(
        _json.dumps({"label:cardiac": 1, "label:Normal": 3, "report:x": 0})
    )
    table = KGTrainer.ensure_label_embeddings(
        str(tmp_path), ["cardiac", "Normal", "missing_grp"],
        out_path=str(tmp_path / "label_embs.npz"),
    )
    np.testing.assert_allclose(table["cardiac"], emb[1])
    np.testing.assert_allclose(table["missing_grp"], np.zeros(6))
    z = np.load(tmp_path / "label_embs.npz")
    np.testing.assert_allclose(z["Normal"], emb[3])


def test_compgcn_layer_math_hand_computed():
    """One CompGCN layer on a 3-node/2-edge graph, opn='sub', dropout off:
    assert the exact reference equations (compgcn_conv.py:50-108) — degree
    norm, distinct in/out/loop weights, loop relation, bias, BatchNorm
    (batch stats), relu, and the w_rel relation update."""
    import numpy as np

    from mmrp_tpu.kg.models import KGModelConfig, compgcn_propagate

    E, R, D = 3, 2, 4
    # edges: 0 -r0-> 1, 2 -r1-> 1
    src = np.array([0, 2], np.int32)
    dst = np.array([1, 1], np.int32)
    erel = np.array([0, 1], np.int32)
    cfg = KGModelConfig(
        name="CompGCN", num_entities=E, num_relations=R, emb_dim=D,
        num_layers=1, dropout=0.0, opn="sub",
        edge_src=src, edge_dst=dst, edge_rel=erel,
    )
    rng = np.random.default_rng(5)
    params = {
        "ent": rng.standard_normal((E, D)).astype(np.float32),
        "rel": rng.standard_normal((R, D)).astype(np.float32),
        "w_in_0": rng.standard_normal((D, D)).astype(np.float32),
        "w_out_0": rng.standard_normal((D, D)).astype(np.float32),
        "w_loop_0": rng.standard_normal((D, D)).astype(np.float32),
        "w_rel_0": rng.standard_normal((D, D)).astype(np.float32),
        "loop_rel_0": rng.standard_normal((1, D)).astype(np.float32),
        "bias_0": rng.standard_normal(D).astype(np.float32),
        "bn_scale_0": (1 + 0.1 * rng.standard_normal(D)).astype(np.float32),
        "bn_bias_0": rng.standard_normal(D).astype(np.float32),
    }
    jp = {k: jnp.asarray(v) for k, v in params.items()}
    got_ent, got_rel = compgcn_propagate(cfg, jp)

    ent, rel = params["ent"], params["rel"]
    # in-direction norm: deg over src -> deg[0]=1, deg[2]=1 (src counts);
    # norm_e = deg^-1/2[src_e] * deg^-1/2[dst_e] with deg from src scatter
    deg_src = np.zeros(E); np.add.at(deg_src, src, 1.0)
    with np.errstate(divide="ignore"):
        dinv = np.where(deg_src > 0, deg_src ** -0.5, 0.0)
    n_in = dinv[src] * dinv[dst]
    deg_dst = np.zeros(E); np.add.at(deg_dst, dst, 1.0)
    with np.errstate(divide="ignore"):
        dinv2 = np.where(deg_dst > 0, deg_dst ** -0.5, 0.0)
    n_out = dinv2[dst] * dinv2[src]

    agg_in = np.zeros((E, D), np.float32)
    for e in range(2):
        msg = (ent[src[e]] - rel[erel[e]]) @ params["w_in_0"] * n_in[e]
        agg_in[dst[e]] += msg
    agg_out = np.zeros((E, D), np.float32)
    for e in range(2):
        msg = (ent[dst[e]] - rel[erel[e]]) @ params["w_out_0"] * n_out[e]
        agg_out[src[e]] += msg
    loop = (ent - params["loop_rel_0"]) @ params["w_loop_0"]
    out = (agg_in + agg_out + loop) / 3.0 + params["bias_0"]
    mu, var = out.mean(0), out.var(0)
    out = (out - mu) / np.sqrt(var + 1e-5)
    out = out * params["bn_scale_0"] + params["bn_bias_0"]
    want_ent = np.maximum(out, 0.0)
    want_rel = (
        np.concatenate([rel, params["loop_rel_0"]], axis=0) @ params["w_rel_0"]
    )[:-1]

    np.testing.assert_allclose(np.asarray(got_ent), want_ent, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_rel), want_rel, rtol=1e-4, atol=1e-5)


def test_compgcn_dropout_training_mode(rng):
    """Dropout must only fire in training mode with an rng, and change the
    propagated tables stochastically."""
    from mmrp_tpu.kg.models import KGModelConfig, compgcn_propagate, init_params

    E, R = 6, 2
    edges = np.array([[0, 0, 1], [1, 1, 2], [3, 0, 4], [5, 1, 0]], np.int32)
    cfg = KGModelConfig(
        name="CompGCN", num_entities=E, num_relations=R, emb_dim=8,
        num_layers=2, dropout=0.5, opn="mult",
        edge_src=edges[:, 0], edge_dst=edges[:, 2], edge_rel=edges[:, 1],
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    e_eval, _ = compgcn_propagate(cfg, params)
    e_eval2, _ = compgcn_propagate(cfg, params)
    np.testing.assert_array_equal(np.asarray(e_eval), np.asarray(e_eval2))
    e_tr1, _ = compgcn_propagate(cfg, params, rng=jax.random.PRNGKey(1), training=True)
    e_tr2, _ = compgcn_propagate(cfg, params, rng=jax.random.PRNGKey(2), training=True)
    assert not np.allclose(np.asarray(e_tr1), np.asarray(e_tr2))


def test_filtered_ranking_csr_matches_bruteforce(rng):
    """The vectorized CSR filter mask must reproduce the per-row dict scan."""
    from mmrp_tpu.kg.trainer import KGTrainer, KGTrainerConfig

    E, R, n = 50, 4, 400
    tr = KGTrainer(E, R, KGTrainerConfig(model="TransE", emb_dim=8, epochs=1))
    trip = np.stack([
        rng.integers(0, E, n), rng.integers(0, R, n), rng.integers(0, E, n)
    ], axis=1).astype(np.int32)
    tr.load_triples(trip.tolist())

    arr = np.concatenate([tr.train_arr, tr.val_arr])
    known = {}
    for s, r, o in arr.tolist():
        known.setdefault((s, r), set()).add(o)

    anchors = rng.integers(0, E, 64).astype(np.int32)
    rels = rng.integers(0, R, 64).astype(np.int32)
    rows, cols = KGTrainer._filter_rows_cols(tr._known["sr"], anchors, rels, R)
    got = {}
    for rw, cl in zip(rows.tolist(), cols.tolist()):
        got.setdefault(rw, set()).add(cl)
    for i, (a, r) in enumerate(zip(anchors.tolist(), rels.tolist())):
        want = known.get((a, r), set())
        assert got.get(i, set()) == want


def test_kg_trainer_compgcn_end_to_end(rng):
    """CompGCN through the full trainer: jitted self-adversarial step with
    per-step dropout rng, eval with the CSR filter, finite metrics."""
    from mmrp_tpu.kg.trainer import KGTrainer, KGTrainerConfig

    E, R, n = 30, 3, 200
    cfg = KGTrainerConfig(
        model="CompGCN", emb_dim=16, epochs=2, batch_size=64, neg_size=4,
        num_layers=2, dropout=0.3, opn="corr", patience=3,
    )
    tr = KGTrainer(E, R, cfg)
    trip = np.stack([
        rng.integers(0, E, n), rng.integers(0, R, n), rng.integers(0, E, n)
    ], axis=1).astype(np.int32)
    tr.load_triples(trip.tolist())
    best = tr.train()
    assert np.isfinite(best["mrr"]) and 0.0 <= best["mrr"] <= 1.0
    assert "hits@10" in best
