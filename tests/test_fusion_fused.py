"""Fused fusion-stack path vs the unfused XLA path — full-model parity.

The fused path pads patches 49->56 and the sequence 51->56, masks the pad
keys, and runs the enhancer/cross/self attentions + FFN as Pallas kernels
(interpret mode on CPU via MMRP_FORCE_PALLAS — the exact production code).
Real-row outputs must match the reference XLA formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
from mmrp_tpu.models.swin import SwinConfig
from mmrp_tpu.models.text_encoder import TextConfig


def _build():
    cfg = MultiModalConfig(
        swin=SwinConfig.micro(use_pallas=False),
        text=TextConfig.small(
            hidden_dim=32, num_layers=1, num_heads=2, intermediate_dim=64,
            dropout=0.0,
        ),
        joint_dim=64,
        num_fusion_layers=2,
        num_heads=4,
        num_classes=7,
        dropout=0.0,
        drop_path=0.0,
        max_text_len=16,
    )
    model = MultiModalRetrievalModel(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 28, 28, 3), dtype=np.float32))
    ids = jnp.asarray(rng.integers(0, 100, (2, 16)).astype(np.int32))
    mask = jnp.asarray(
        (np.arange(16)[None, :] < np.array([16, 9])[:, None]).astype(np.int32))
    return model, img, ids, mask


def test_fused_stack_matches_xla(monkeypatch):
    model, img, ids, mask = _build()

    monkeypatch.delenv("MMRP_FORCE_PALLAS", raising=False)
    params = model.init(jax.random.PRNGKey(0), img, ids, mask)
    out_xla = model.apply(params, img, ids, mask)

    monkeypatch.setenv("MMRP_FORCE_PALLAS", "1")
    # init under the fused path must yield the SAME param tree
    params_f = model.init(jax.random.PRNGKey(0), img, ids, mask)
    flat_a = jax.tree_util.tree_structure(params)
    flat_b = jax.tree_util.tree_structure(params_f)
    assert flat_a == flat_b
    out_fused = model.apply(params, img, ids, mask)

    for key in ("joint_emb", "logits", "img_emb", "txt_emb"):
        np.testing.assert_allclose(
            np.asarray(out_fused[key]), np.asarray(out_xla[key]),
            rtol=5e-4, atol=5e-4, err_msg=key)


def test_attention_maps_path_still_works(monkeypatch):
    model, img, ids, mask = _build()
    monkeypatch.setenv("MMRP_FORCE_PALLAS", "1")
    params = model.init(jax.random.PRNGKey(0), img, ids, mask)
    out = model.apply(params, img, ids, mask, return_attention=True)
    attn = out["attention"]
    assert len(attn) == 2
    # reference contract: txt2img (B, h, Lt, Np), img2txt (B, h, Np, Lt)
    assert attn[0]["txt2img"].shape == (2, 4, 16, 49)
    assert attn[0]["img2txt"].shape == (2, 4, 49, 16)


def test_gradients_flow_through_fused_stack(monkeypatch):
    model, img, ids, mask = _build()
    monkeypatch.setenv("MMRP_FORCE_PALLAS", "1")
    params = model.init(jax.random.PRNGKey(0), img, ids, mask)

    def loss(p):
        out = model.apply(p, img, ids, mask)
        return (out["joint_emb"] ** 2).mean()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    total = sum(float(jnp.abs(x).sum()) for x in leaves)
    assert total > 0.0
