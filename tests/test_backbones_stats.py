import json
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmrp_tpu.data import dicom as D
from mmrp_tpu.data.stats import (
    RawStatDataset,
    ReportLookup,
    build_web_sample_set,
    find_dicom,
)
from mmrp_tpu.labels import NUM_CLASSES
from mmrp_tpu.models.resnet import ResNetConfig, ResNetEncoder
from mmrp_tpu.models.vit import ViTConfig, ViTEncoder


def test_resnet_encoder_shapes(rng):
    cfg = ResNetConfig(stage_sizes=(1, 1), width=32)
    model = ResNetEncoder(cfg)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    # 64 /4 (stem+pool) /2 (stage1) = 8x8 map, dim 32*2*4=256
    assert out["patches"].shape == (1, 64, 256)
    assert out["global"].shape == (1, 256)
    assert np.isfinite(np.asarray(out["patches"])).all()
    # no mutable collections (GroupNorm is stateless)
    assert set(params.keys()) == {"params"}


def test_vit_encoder_shapes(rng):
    cfg = ViTConfig.small(img_size=32, patch_size=8)
    model = ViTEncoder(cfg)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["patches"].shape == (2, 16, 192)
    assert out["global"].shape == (2, 192)


def test_efficientnet_b0_encoder_shapes(rng):
    from mmrp_tpu.models.efficientnet import EfficientNetConfig, EfficientNetEncoder

    model = EfficientNetEncoder(EfficientNetConfig.b0())
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    # 64 / 32 (stem + four stride-2 stages) = 2x2 map, 1280 head channels
    assert out["patches"].shape == (1, 4, 1280)
    assert out["global"].shape == (1, 1280)
    assert np.isfinite(np.asarray(out["patches"])).all()
    # stateless norms: no mutable collections
    assert set(params.keys()) == {"params"}
    # B0 stage layout: 16 MBConv blocks across 7 stages
    n_blocks = sum(1 for k in params["params"] if "_block" in k)
    assert n_blocks == 16


def test_multimodal_efficientnet_backbone_forward(rng):
    from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
    from mmrp_tpu.models.swin import SwinConfig
    from mmrp_tpu.models.text_encoder import TextConfig

    text = TextConfig.small(vocab_size=64, hidden_dim=16, num_layers=1,
                            num_heads=2, intermediate_dim=32, max_positions=16)
    img = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (1, 8)), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    cfg = MultiModalConfig(
        swin=SwinConfig.micro(img_size=64), text=text,
        vision_backbone="efficientnet",
        joint_dim=16, num_fusion_layers=1, num_heads=2, num_classes=5,
        max_text_len=8,
    )
    model = MultiModalRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(0), img, ids, mask)
    out = model.apply(params, img, ids, mask)
    assert out["logits"].shape == (1, 5)
    # Config dispatch: image_backbone="efficientnet_b0" selects this tower
    from mmrp_tpu.config import Config

    mm = MultiModalConfig.from_config(
        Config(image_backbone="efficientnet_b0"), num_classes=5
    )
    assert mm.vision_backbone == "efficientnet"


def test_multimodal_with_alternate_backbones(rng):
    from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
    from mmrp_tpu.models.swin import SwinConfig
    from mmrp_tpu.models.text_encoder import TextConfig

    text = TextConfig.small(vocab_size=64, hidden_dim=16, num_layers=1,
                            num_heads=2, intermediate_dim=32, max_positions=16)
    img = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (1, 8)), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    cfg = MultiModalConfig(
        swin=SwinConfig.micro(img_size=32), text=text, vision_backbone="vit",
        joint_dim=16, num_fusion_layers=1, num_heads=2, num_classes=5,
        max_text_len=8,
    )
    model = MultiModalRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(0), img, ids, mask)
    out = model.apply(params, img, ids, mask)
    assert out["logits"].shape == (1, 5)


def _records(tmp_path, rng, n=6):
    recs = []
    for i in range(n):
        arr = (rng.random((24, 24)) * 500).astype(np.uint16)
        p = tmp_path / f"rec{i}.dcm"
        D.write_dicom(p, arr)
        vec = [0] * NUM_CLASSES
        vec[i % 3] = 1
        recs.append({"id": f"rec{i}", "dicom_path": str(p),
                     "report_text": f"report {i}", "labels": vec})
    return recs


def test_raw_stat_dataset(tmp_path, rng):
    recs = _records(tmp_path, rng)
    recs.append({"id": "bad", "dicom_path": str(tmp_path / "missing.dcm"),
                 "report_text": "x", "labels": [0] * NUM_CLASSES})
    ds = RawStatDataset(recs, size=(16, 16))
    assert ds[0].shape == (16, 16)
    np.testing.assert_array_equal(ds[len(recs) - 1], np.zeros((16, 16)))  # fallback
    stats = ds.intensity_stats()
    assert 0 <= stats["mean"] <= 1 and stats["n"] == len(recs)


def test_report_lookup_cache(tmp_path, rng):
    recs = _records(tmp_path, rng, 3)
    cache = tmp_path / "reports.json"
    lk = ReportLookup(recs, cache_path=str(cache))
    assert lk("rec1") == "report 1"
    lk2 = ReportLookup(cache_path=str(cache))  # reload from cache only
    assert lk2("rec2") == "report 2"
    assert lk2("missing") is None


def test_find_dicom(tmp_path, rng):
    sub = tmp_path / "a" / "b"
    sub.mkdir(parents=True)
    arr = (rng.random((8, 8)) * 100).astype(np.uint16)
    D.write_dicom(sub / "77_IM-1.dcm", arr)
    assert find_dicom(str(tmp_path), "77_IM-1") is not None
    assert find_dicom(str(tmp_path), "77_IM") is not None  # prefix fallback
    assert find_dicom(str(tmp_path), "zzz") is None


def test_build_web_sample_set(tmp_path, rng):
    recs = _records(tmp_path, rng, 6)
    manifest = build_web_sample_set(recs, str(tmp_path / "web"), n_per_label=1)
    assert len(manifest) >= 3  # one per populated label
    assert (tmp_path / "web" / "web_samples.json").exists()
    loaded = json.loads((tmp_path / "web" / "web_samples.json").read_text())
    assert loaded[0]["id"].startswith("rec")


def test_multimodal_medclip_backbone_forward(rng):
    """'medclip' backbone = Swin + 512-d projection (models/medclip.py);
    micro swin here for CI speed."""
    import jax
    import jax.numpy as jnp

    from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
    from mmrp_tpu.models.swin import SwinConfig
    from mmrp_tpu.models.text_encoder import TextConfig

    text = TextConfig.small(vocab_size=64, hidden_dim=16, num_layers=1,
                            num_heads=2, intermediate_dim=32, max_positions=16)
    img = jnp.asarray(rng.random((1, 28, 28, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (1, 8)), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    cfg = MultiModalConfig(
        swin=SwinConfig.micro(img_size=28, use_pallas=False), text=text,
        vision_backbone="medclip",
        joint_dim=16, num_fusion_layers=1, num_heads=2, num_classes=5,
        max_text_len=8,
    )
    model = MultiModalRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(0), img, ids, mask)
    out = model.apply(params, img, ids, mask)
    assert out["logits"].shape == (1, 5)
    # the medclip projection subtree exists with a bias-free 512-d kernel
    proj = params["params"]["backbones"]["medclip"]["projection"]
    assert proj["kernel"].shape[-1] == 512 and "bias" not in proj
