"""Streaming pipeline (BASELINE config #5): embed+retrieve+predict at
batch over a (sharded) gallery, results identical to the one-at-a-time
predictor path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmrp_tpu.retrieval.gallery import RetrievalEngine
from mmrp_tpu.serve.stream import StreamingPipeline


@pytest.fixture(scope="module")
def micro():
    from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
    from mmrp_tpu.models.swin import SwinConfig
    from mmrp_tpu.models.text_encoder import TextConfig

    cfg = MultiModalConfig(
        swin=SwinConfig.micro(use_pallas=False),
        text=TextConfig.small(hidden_dim=32, num_layers=1, num_heads=2,
                              intermediate_dim=64, vocab_size=64),
        joint_dim=32, num_fusion_layers=1, num_heads=2,
        num_classes=5, max_text_len=8, dropout=0.0,
    )
    model = MultiModalRetrievalModel(cfg)
    rng = np.random.default_rng(0)
    img = rng.random((2, 28, 28, 3)).astype(np.float32)
    ids = rng.integers(0, 64, (2, 8)).astype(np.int32)
    mask = np.ones((2, 8), np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(img),
                        jnp.asarray(ids), jnp.asarray(mask))["params"]
    return model, {"model": params}


def _batches(n_batches=3, B=4, seed=1):
    rng = np.random.default_rng(seed)
    out = []
    for b in range(n_batches):
        valid = np.ones(B, np.float32)
        if b == n_batches - 1:
            valid[-1] = 0.0  # padded tail row must be dropped
        out.append({
            "image": rng.random((B, 28, 28, 3)).astype(np.float32),
            "input_ids": rng.integers(0, 64, (B, 8)).astype(np.int32),
            "attention_mask": np.ones((B, 8), np.int32),
            "valid": valid,
            "ids": [f"q{b}_{i}" for i in range(B)],
        })
    return out


def test_stream_matches_direct_forward(micro):
    model, params = micro
    rng = np.random.default_rng(2)
    gallery = rng.standard_normal((64, 32)).astype(np.float32)
    gal_ids = [f"g{i}" for i in range(64)]
    eng = RetrievalEngine(gallery, gal_ids)

    th = np.full(5, 0.4, np.float32)
    pipe = StreamingPipeline(model, params, eng,
                             label_names=[f"c{i}" for i in range(5)],
                             threshold=th, K=7)
    batches = _batches()
    results = list(pipe.run(batches))
    assert len(results) == 3
    assert pipe.stats["pairs"] == 11  # 3*4 - 1 invalid
    assert pipe.stats["pairs_per_sec"] > 0

    # last batch dropped its padded row
    assert len(results[-1]["probs"]) == 3
    assert results[-1]["ids"] == ["q2_0", "q2_1", "q2_2"]

    # identical numerics to the direct forward on batch 0
    b0 = batches[0]
    out = model.apply({"params": params["model"]},
                      jnp.asarray(b0["image"]), jnp.asarray(b0["input_ids"]),
                      jnp.asarray(b0["attention_mask"]), deterministic=True)
    np.testing.assert_allclose(
        results[0]["probs"], np.asarray(jax.nn.sigmoid(out["logits"])),
        rtol=1e-5, atol=1e-5,
    )
    # thresholded predicted labels match
    want = [[f"c{j}" for j in np.where(row >= th)[0]]
            for row in results[0]["probs"]]
    assert results[0]["predicted"] == want

    # retrieval rows are sorted top-K from the gallery
    r0 = results[0]["retrieval"][0]
    assert len(r0) == 7
    scores = [s for _, s in r0]
    assert scores == sorted(scores, reverse=True)
    assert all(rid in gal_ids for rid, _ in r0)


def test_stream_sharded_gallery_on_mesh(micro):
    from mmrp_tpu.parallel.mesh import build_mesh

    model, params = micro
    mesh = build_mesh(("dp",), (8,))
    rng = np.random.default_rng(3)
    gallery = rng.standard_normal((96, 32)).astype(np.float32)
    gal_ids = [f"g{i}" for i in range(96)]
    eng_sharded = RetrievalEngine(gallery, gal_ids, mesh=mesh, shard_axis="dp")
    eng_single = RetrievalEngine(gallery, gal_ids)

    pipe = StreamingPipeline(model, params, eng_sharded, threshold=0.5, K=5,
                             mesh=mesh)
    batches = _batches(n_batches=2, B=8, seed=4)
    results = list(pipe.run(batches))
    assert pipe.stats["mesh"] is not None

    # sharded top-K == single-device top-K on the same embeddings
    s1, i1 = eng_single.retrieve_batch(results[0]["joint_emb"], k=5)
    got = results[0]["retrieval"]
    for q in range(len(got)):
        assert [rid for rid, _ in got[q]] == [gal_ids[j] for j in i1[q]]


def test_pipelined_depths_identical(micro):
    """depth>1 (dispatch-ahead double buffering) must yield byte-identical
    results to the strictly-serial depth=1 path, in the same order."""
    model, params = micro
    rng = np.random.default_rng(7)
    gallery = rng.standard_normal((64, 32)).astype(np.float32)
    eng = RetrievalEngine(gallery, [f"g{i}" for i in range(64)])
    pipe = StreamingPipeline(model, params, eng,
                             label_names=[f"c{i}" for i in range(5)],
                             threshold=np.full(5, 0.4, np.float32), K=7)
    serial = list(pipe.run(_batches(n_batches=5), depth=1))
    piped = list(pipe.run(_batches(n_batches=5), depth=3))
    assert len(serial) == len(piped) == 5
    for a, b in zip(serial, piped):
        np.testing.assert_array_equal(a["probs"], b["probs"])
        assert a["ids"] == b["ids"]
        assert a["predicted"] == b["predicted"]
        assert a["retrieval"] == b["retrieval"]


def test_compact_u8_ingestion_matches_host_math(micro):
    """uint8 windowed pixels finished on device must equal the f32 path fed
    the identical host-computed normalization ((u8/255 - .5)/.5, 3-channel)."""
    model, params = micro
    pipe = StreamingPipeline(model, params)
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (3, 28, 28)).astype(np.uint8)
    f32 = ((u8.astype(np.float32) / 255.0 - 0.5) / 0.5)[..., None].repeat(3, -1)
    ids = rng.integers(0, 64, (3, 8)).astype(np.int32)
    mask = np.ones((3, 8), np.int32)
    ru8 = pipe.process_batch(
        {"image": u8, "input_ids": ids, "attention_mask": mask})
    rf32 = pipe.process_batch(
        {"image": f32, "input_ids": ids, "attention_mask": mask})
    np.testing.assert_allclose(ru8["probs"], rf32["probs"], atol=1e-5)
    np.testing.assert_allclose(ru8["joint_emb"], rf32["joint_emb"], atol=1e-4)


def test_compact_u16_window_ingestion_matches_host_math(micro):
    """uint16 raw + per-sample window finished on device must equal the f32
    path fed the host-side window/normalize (ops/preprocess.py math)."""
    model, params = micro
    pipe = StreamingPipeline(model, params)
    rng = np.random.default_rng(8)
    raw = rng.integers(0, 4096, (2, 28, 28)).astype(np.uint16)
    wc = np.array([1800.0, 2100.0], np.float32)
    ww = np.array([1200.0, 900.0], np.float32)
    lower, upper = wc - ww / 2, wc + ww / 2
    x = np.clip(raw.astype(np.float32), lower[:, None, None],
                upper[:, None, None])
    x = (x - lower[:, None, None]) / (upper - lower)[:, None, None]
    f32 = ((x - 0.5) / 0.5)[..., None].repeat(3, -1).astype(np.float32)
    ids = rng.integers(0, 64, (2, 8)).astype(np.int32)
    mask = np.ones((2, 8), np.int32)
    r16 = pipe.process_batch(
        {"image": raw, "input_ids": ids, "attention_mask": mask,
         "window_center": wc, "window_width": ww})
    rf32 = pipe.process_batch(
        {"image": f32, "input_ids": ids, "attention_mask": mask})
    np.testing.assert_allclose(r16["probs"], rf32["probs"], atol=1e-5)
    np.testing.assert_allclose(r16["joint_emb"], rf32["joint_emb"], atol=1e-4)
