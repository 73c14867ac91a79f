import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmrp_tpu.api import MMRPredictor
from mmrp_tpu.eval.diversity import full_diversity_report
from mmrp_tpu.eval.explain_eval import retrieval_explain_eval
from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
from mmrp_tpu.models.swin import SwinConfig
from mmrp_tpu.models.text_encoder import TextConfig
from mmrp_tpu.retrieval.gallery import RetrievalEngine


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(2709)  # module fixture: own stream
    """Tiny predictor + gallery whose items have real model embeddings."""
    swin = SwinConfig.micro(use_pallas=False)
    text = TextConfig.small(vocab_size=64, hidden_dim=16, num_layers=1,
                            num_heads=2, intermediate_dim=32, max_positions=16)
    cfg = MultiModalConfig(swin=swin, text=text, joint_dim=16,
                           num_fusion_layers=1, num_heads=2, num_classes=6,
                           max_text_len=8)
    model = MultiModalRetrievalModel(cfg)
    img0 = jnp.zeros((1, 28, 28, 3))
    ids0 = jnp.zeros((1, 8), jnp.int32)
    mask0 = jnp.ones((1, 8), jnp.int32)
    params = {"model": model.init(jax.random.PRNGKey(0), img0, ids0, mask0)["params"]}

    samples = {}
    embs, ids = [], []
    pred0 = MMRPredictor(model, params, [f"c{i}" for i in range(6)])
    for i in range(8):
        img = rng.random((1, 28, 28, 3)).astype(np.float32)
        tid = rng.integers(0, 64, (1, 8)).astype(np.int32)
        m = np.ones((1, 8), np.int32)
        samples[f"s{i}"] = {"image": img, "input_ids": tid, "attention_mask": m}
        embs.append(pred0.embed(img, tid, m)["joint_emb"][0])
        ids.append(f"s{i}")
    retriever = RetrievalEngine(np.stack(embs), ids)
    predictor = MMRPredictor(model, params, [f"c{i}" for i in range(6)],
                             retriever=retriever)
    return predictor, samples, ids


def test_retrieval_explain_eval(world, tmp_path):
    predictor, samples, ids = world
    gt = {i: [j for j in ids if j != i][:3] for i in ids[:3]}
    res = retrieval_explain_eval(
        predictor, lambda rid: samples[rid], ids[:3], gt, k=3,
        out_path=str(tmp_path / "ree.json"),
    )
    assert "P@3" in res and "MRR" in res
    assert np.isfinite(res["align_pearson"]) or np.isnan(res["align_pearson"])
    assert (tmp_path / "ree.json").exists()


def test_full_diversity_report(world, tmp_path):
    predictor, samples, ids = world
    rep = full_diversity_report(
        predictor, lambda rid: samples[rid], ids[:2], str(tmp_path), k=3,
        save_overlays=True,
    )
    assert rep["n_queries"] == 2
    assert (tmp_path / "diversity_report.json").exists()
    overlays = list((tmp_path / "overlays").glob("*.png"))
    assert len(overlays) >= 2
