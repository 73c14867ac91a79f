import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmrp_tpu.models.swin import SwinConfig, SwinEncoder
from mmrp_tpu.models.text_encoder import TextConfig, TextEncoder
from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
from mmrp_tpu.models.layers import sinusoidal_positions

# smallest config that still exercises 2 stages + shifted windows + merge
TINY_SWIN = SwinConfig(
    img_size=56,
    embed_dim=16,
    depths=(2, 1),
    num_heads=(2, 2),
    window_size=7,
    use_pallas=False,
)
TINY_TEXT = TextConfig.small(
    vocab_size=128, hidden_dim=32, num_layers=1, num_heads=2,
    intermediate_dim=64, max_positions=64,
)


def _mm_cfg(mode="multimodal"):
    return MultiModalConfig(
        swin=TINY_SWIN,
        text=TINY_TEXT,
        joint_dim=32,
        num_fusion_layers=2,
        num_heads=4,
        num_classes=43,
        mode=mode,
        max_text_len=16,
    )


@pytest.fixture(scope="module")
def mm_setup():
    rng = np.random.default_rng(2709)  # module fixture: own stream
    img = jnp.asarray(rng.random((2, 56, 56, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 128, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    model = MultiModalRetrievalModel(_mm_cfg())
    params = model.init(jax.random.PRNGKey(0), img, ids, mask)
    return model, params, img, ids, mask


def test_sinusoidal_positions():
    t = sinusoidal_positions(10, 8)
    assert t.shape == (10, 8)
    np.testing.assert_allclose(t[0, 0::2], 0.0, atol=1e-7)
    np.testing.assert_allclose(t[0, 1::2], 1.0, atol=1e-7)


def test_swin_shapes_and_global_pool(rng):
    x = jnp.asarray(rng.random((2, 56, 56, 3)), jnp.float32)
    model = SwinEncoder(TINY_SWIN)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    # 56/4 = 14 -> merge -> 7x7 = 49 patches, dim 32
    assert out["patches"].shape == (2, 49, 32)
    assert out["global"].shape == (2, 32)
    np.testing.assert_allclose(
        np.asarray(out["global"]), np.asarray(out["patches"].mean(1)), atol=1e-5
    )
    assert np.isfinite(np.asarray(out["patches"])).all()


def test_text_encoder_shapes_and_mask(rng):
    ids = jnp.asarray(rng.integers(0, 128, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32).at[1, 8:].set(0)
    model = TextEncoder(TINY_TEXT)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    out = model.apply(params, ids, mask)
    assert out["tokens"].shape == (2, 16, 32)
    assert out["cls"].shape == (2, 32)
    # padded tokens must not affect the CLS of sample 1:
    ids2 = ids.at[1, 8:].set(77)
    out2 = model.apply(params, ids2, mask)
    np.testing.assert_allclose(
        np.asarray(out["cls"][1]), np.asarray(out2["cls"][1]), atol=1e-5
    )


def test_multimodal_forward_and_attention(mm_setup):
    model, params, img, ids, mask = mm_setup
    out = model.apply(params, img, ids, mask, return_attention=True)
    assert out["logits"].shape == (2, 43)
    assert out["joint_emb"].shape == (2, 32)
    assert out["img_emb"].shape == (2, 32)
    assert out["txt_emb"].shape == (2, 32)
    assert np.isfinite(np.asarray(out["logits"])).all()
    assert len(out["attention"]) == 2
    a = out["attention"][0]
    assert a["txt2img"].shape == (2, 4, 16, 49)
    assert a["img2txt"].shape == (2, 4, 49, 16)
    np.testing.assert_allclose(
        np.asarray(a["txt2img"].sum(-1)), np.ones((2, 4, 16)), atol=1e-4
    )


def test_multimodal_train_mode_dropout_rng(mm_setup):
    model, params, img, ids, mask = mm_setup
    out = model.apply(
        params, img, ids, mask, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(7)},
    )
    assert np.isfinite(np.asarray(out["logits"])).all()


# micro config: one 7x7-window stage (no shift), 1 fusion layer — cheap to
# compile a full backward pass on CPU
MICRO_SWIN = SwinConfig(
    img_size=28, embed_dim=16, depths=(1,), num_heads=(2,), window_size=7,
    use_pallas=False,
)


def _micro_cfg(mode="multimodal"):
    return MultiModalConfig(
        swin=MICRO_SWIN, text=TINY_TEXT, joint_dim=32, num_fusion_layers=1,
        num_heads=2, num_classes=43, mode=mode, max_text_len=8,
    )


def _micro_inputs(rng, B=1):
    img = jnp.asarray(rng.random((B, 28, 28, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 128, (B, 8)), jnp.int32)
    mask = jnp.ones((B, 8), jnp.int32)
    return img, ids, mask


def test_image_only_mode_ignores_text(rng):
    model = MultiModalRetrievalModel(_micro_cfg("image"))
    img, ids, mask = _micro_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), img, ids, mask)
    out = model.apply(params, img, ids, mask)
    out2 = model.apply(params, img, ids + 1, mask)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(out2["logits"]), atol=1e-5
    )


def test_unimodal_modes_skip_unused_tower(rng):
    """image mode must not build (or pay for) the text tower and vice
    versa; explain deltas for the absent modality fail loudly."""
    img, ids, mask = _micro_inputs(rng)

    m_img = MultiModalRetrievalModel(_micro_cfg("image"))
    p_img = m_img.init(jax.random.PRNGKey(0), img, ids, mask)
    assert "text" not in p_img["params"]["backbones"]
    assert "txt_proj" not in p_img["params"]
    with pytest.raises(ValueError):
        m_img.apply(p_img, img, ids, mask,
                    txt_delta=jnp.zeros((1, 1, 32)))

    m_txt = MultiModalRetrievalModel(_micro_cfg("text"))
    p_txt = m_txt.init(jax.random.PRNGKey(0), img, ids, mask)
    assert "backbones" not in p_txt["params"] \
        or "swin" not in p_txt["params"]["backbones"]
    assert "img_proj" not in p_txt["params"]
    out = m_txt.apply(p_txt, img, ids, mask)
    out2 = m_txt.apply(p_txt, jnp.zeros_like(img), ids, mask)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(out2["logits"]), atol=1e-5)
    with pytest.raises(ValueError):
        m_txt.apply(p_txt, img, ids, mask,
                    patch_delta=jnp.zeros((1, 1, 32)))


def test_multimodal_gradients_flow(rng):
    model = MultiModalRetrievalModel(_micro_cfg())
    img, ids, mask = _micro_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), img, ids, mask)

    def loss_fn(p):
        out = model.apply(p, img, ids, mask)
        return jnp.mean(out["logits"] ** 2)

    g = jax.grad(loss_fn)(params)
    norms = [float(jnp.abs(l).max()) for l in jax.tree_util.tree_leaves(g)]
    assert max(norms) > 0
    assert all(np.isfinite(n) for n in norms)
