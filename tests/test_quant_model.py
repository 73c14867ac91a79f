"""End-to-end int8 (W8A8) serving fidelity vs the float model.

The quantized path must preserve what retrieval/classification actually
consume: embedding direction (cosine), logit values, and neighbor ordering.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
from mmrp_tpu.models.swin import SwinConfig
from mmrp_tpu.models.text_encoder import TextConfig


def _cfg(quant: str):
    return MultiModalConfig(
        swin=SwinConfig.micro(use_pallas=False),
        text=TextConfig.small(
            hidden_dim=32, num_layers=2, num_heads=2, intermediate_dim=64,
            dropout=0.0, quant=quant,
        ),
        joint_dim=64,
        num_fusion_layers=2,
        num_heads=4,
        num_classes=7,
        dropout=0.0,
        drop_path=0.0,
        max_text_len=16,
        quant=quant,
    )


def test_int8_model_close_to_float():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((4, 28, 28, 3), dtype=np.float32))
    ids = jnp.asarray(rng.integers(0, 100, (4, 16)).astype(np.int32))
    mask = jnp.ones((4, 16), jnp.int32)

    model_f = MultiModalRetrievalModel(_cfg("none"))
    params = model_f.init(jax.random.PRNGKey(0), img, ids, mask)
    out_f = model_f.apply(params, img, ids, mask)

    model_q = MultiModalRetrievalModel(_cfg("int8"))
    # identical tree: quant is a compute-path flag, not a param change
    out_q = model_q.apply(params, img, ids, mask)

    ef = np.asarray(out_f["joint_emb"], np.float32)
    eq = np.asarray(out_q["joint_emb"], np.float32)
    cos = (ef * eq).sum(-1) / (
        np.linalg.norm(ef, axis=-1) * np.linalg.norm(eq, axis=-1))
    assert cos.min() > 0.995, cos

    lf = np.asarray(out_f["logits"], np.float32)
    lq = np.asarray(out_q["logits"], np.float32)
    assert np.abs(lf - lq).max() < 0.35, np.abs(lf - lq).max()

    # neighbor-order stability on a synthetic gallery
    g = rng.standard_normal((50, ef.shape[1])).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    for e_f, e_q in zip(ef, eq):
        top_f = np.argsort(-(g @ e_f))[:5]
        top_q = np.argsort(-(g @ e_q))[:5]
        assert len(set(top_f[:3]) & set(top_q[:5])) >= 3


def test_int8_training_path_unaffected():
    """quant only engages at inference (deterministic) — training math and
    gradients stay full precision."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((2, 28, 28, 3), dtype=np.float32))
    ids = jnp.asarray(rng.integers(0, 100, (2, 16)).astype(np.int32))
    mask = jnp.ones((2, 16), jnp.int32)
    cfg = _cfg("int8")
    # dropout>0 so deterministic=False disables quant
    cfg = MultiModalConfig(**{**cfg.__dict__, "dropout": 0.1})
    model = MultiModalRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(0), img, ids, mask)

    def loss(p):
        out = model.apply(
            p, img, ids, mask, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)})
        return (out["joint_emb"] ** 2).mean()

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
