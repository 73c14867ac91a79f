"""Weight-porting equivalence tests: random HF torch models vs our Flax
modules with converted weights must agree output-for-output."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from mmrp_tpu.models.port import convert_hf_bert, convert_hf_swin
from mmrp_tpu.models.swin import SwinConfig, SwinEncoder
from mmrp_tpu.models.text_encoder import TextConfig, TextEncoder


def test_bert_port_matches_hf(rng):
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(
        vocab_size=211, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    hf = BertModel(hf_cfg).eval()

    cfg = TextConfig(vocab_size=211, hidden_dim=32, num_layers=2, num_heads=4,
                     intermediate_dim=64, max_positions=64, dropout=0.0)
    model = TextEncoder(cfg)
    ids_np = rng.integers(0, 211, (2, 10)).astype(np.int64)
    mask_np = np.ones((2, 10), np.int64)
    mask_np[1, 6:] = 0
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids_np), jnp.asarray(mask_np))
    converted = convert_hf_bert(hf.state_dict(), num_layers=2)
    out = model.apply({"params": converted}, jnp.asarray(ids_np), jnp.asarray(mask_np))

    with torch.no_grad():
        hf_out = hf(
            input_ids=torch.tensor(ids_np), attention_mask=torch.tensor(mask_np)
        ).last_hidden_state.numpy()

    ours = np.asarray(out["tokens"])
    # compare only unmasked positions (masked positions are don't-care)
    np.testing.assert_allclose(ours[0], hf_out[0], atol=2e-4)
    np.testing.assert_allclose(ours[1, :6], hf_out[1, :6], atol=2e-4)


def test_swin_port_matches_hf(rng):
    from transformers import SwinConfig as HFSwinConfig, SwinModel

    hf_cfg = HFSwinConfig(
        image_size=56, patch_size=4, embed_dim=24, depths=[2, 2],
        num_heads=[2, 4], window_size=7, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
    )
    hf = SwinModel(hf_cfg).eval()

    cfg = SwinConfig(img_size=56, embed_dim=24, depths=(2, 2), num_heads=(2, 4),
                     window_size=7, drop_path_rate=0.0, dropout=0.0,
                     use_pallas=False)
    model = SwinEncoder(cfg)
    img_np = rng.random((2, 56, 56, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(img_np))
    converted = convert_hf_swin(hf.state_dict(), depths=(2, 2))
    out = model.apply({"params": converted}, jnp.asarray(img_np))

    with torch.no_grad():
        hf_out = hf(
            pixel_values=torch.tensor(np.transpose(img_np, (0, 3, 1, 2)))
        ).last_hidden_state.numpy()  # (B, 49, C)

    ours = np.asarray(out["patches"])
    assert ours.shape == hf_out.shape
    # f32 accumulation-order differences compound across two stages + LNs
    np.testing.assert_allclose(ours, hf_out, atol=5e-3)
    corr = np.corrcoef(ours.ravel(), hf_out.ravel())[0, 1]
    assert corr > 0.999999


def test_medclip_port_matches_reference_composition(rng):
    """MedCLIP-ViT = HF SwinModel + bias-free 512-d projection head
    (fusion.py:131-171). Build a random small HF Swin, wrap its state_dict
    in MedCLIP naming, convert, and check patches == last_hidden_state @ W
    and global == pooler_output @ W."""
    from transformers import SwinConfig as HFSwinConfig, SwinModel

    from mmrp_tpu.models.medclip import MedCLIPVisionEncoder
    from mmrp_tpu.models.port import convert_medclip_vit
    from mmrp_tpu.models.swin import SwinConfig

    hf_cfg = HFSwinConfig(
        image_size=56, patch_size=4, embed_dim=24, depths=[2, 2],
        num_heads=[2, 4], window_size=7, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
    )
    hf = SwinModel(hf_cfg, add_pooling_layer=True).eval()
    proj_dim, feat_dim = 16, hf_cfg.embed_dim * 2
    w_proj = torch.randn(proj_dim, feat_dim) * 0.1

    state = {f"vision_model.model.{k}": v for k, v in hf.state_dict().items()}
    state["vision_model.projection_head.weight"] = w_proj
    # text branch must be ignored
    state["text_model.whatever.weight"] = torch.randn(3, 3)

    converted = convert_medclip_vit(state, depths=(2, 2))

    enc = MedCLIPVisionEncoder(
        swin=SwinConfig(img_size=56, embed_dim=24, depths=(2, 2),
                        num_heads=(2, 4), window_size=7, drop_path_rate=0.0,
                        use_pallas=False),
        proj_dim=proj_dim,
    )
    x_np = rng.random((2, 56, 56, 3)).astype(np.float32)
    out = enc.apply({"params": converted}, jnp.asarray(x_np))

    with torch.no_grad():
        hf_out = hf(pixel_values=torch.tensor(
            x_np.transpose(0, 3, 1, 2)))
        want_patches = (hf_out.last_hidden_state @ w_proj.T).numpy()
        want_global = (hf_out.pooler_output @ w_proj.T).numpy()

    np.testing.assert_allclose(
        np.asarray(out["patches"]), want_patches, atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(out["global"]), want_global, atol=2e-3)


def test_medclip_converter_rejects_textonly_dict():
    from mmrp_tpu.models.port import convert_medclip_vit

    with pytest.raises(KeyError):
        convert_medclip_vit({"text_model.x": np.zeros((2, 2))})
