"""Serialized serving artifacts (serve/exported.py): export -> save ->
load -> call must reproduce the live model's outputs, including batch
bucketing (pad + trim) and oversize chunking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
from mmrp_tpu.models.swin import SwinConfig
from mmrp_tpu.models.text_encoder import TextConfig
from mmrp_tpu.serve.exported import (
    ExportedPredictor,
    export_serving_programs,
    save_artifact,
)

IMG, LT = 28, 12


@pytest.fixture(scope="module")
def micro():
    cfg = MultiModalConfig(
        swin=SwinConfig.micro(),
        text=TextConfig.small(),
        joint_dim=32,
        num_fusion_layers=1,
        num_heads=2,
        num_classes=7,
        max_text_len=LT,
    )
    model = MultiModalRetrievalModel(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, IMG, IMG, 3), dtype=np.float32))
    ids = jnp.asarray(rng.integers(0, cfg.text.vocab_size, (1, LT)).astype(np.int32))
    mask = jnp.ones((1, LT), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img, ids, mask)["params"]
    return model, params, cfg


def _inputs(n, cfg, seed=1):
    rng = np.random.default_rng(seed)
    img = rng.random((n, IMG, IMG, 3)).astype(np.float32)
    ids = rng.integers(0, cfg.text.vocab_size, (n, LT)).astype(np.int32)
    mask = np.ones((n, LT), np.int32)
    return img, ids, mask


def test_export_roundtrip_matches_live_model(micro, tmp_path):
    model, params, cfg = micro
    programs = export_serving_programs(
        model, params, image_size=IMG, text_len=LT,
        batch_sizes=(1, 4), platforms=("cpu",),
    )
    assert set(programs) == {"cpu::1", "cpu::4"}
    path = tmp_path / "serving.npz"
    meta = {"image_size": IMG, "text_len": LT, "batch_sizes": [1, 4]}
    save_artifact(path, programs, params, meta)

    pred = ExportedPredictor.load(path, platform="cpu")
    assert pred.meta["image_size"] == IMG
    assert pred.batch_sizes == [1, 4]

    for n in (1, 3, 4, 9):  # exact bucket, padded bucket, chunked oversize
        img, ids, mask = _inputs(n, cfg, seed=n)
        got = pred.call(img, ids, mask)
        ref = model.apply({"params": params}, jnp.asarray(img), jnp.asarray(ids),
                          jnp.asarray(mask), deterministic=True)
        np.testing.assert_allclose(
            got["probs"], np.asarray(jax.nn.sigmoid(ref["logits"])),
            rtol=2e-4, atol=2e-5,
        )
        np.testing.assert_allclose(
            got["joint_emb"], np.asarray(ref["joint_emb"]), rtol=2e-4, atol=2e-4
        )
        assert got["probs"].shape == (n, 7)
        assert got["joint_emb"].shape[0] == n


def test_sharded_export_matches_single_device(micro, tmp_path):
    """Data-parallel export over the 8-device mesh: artifact outputs must
    equal the single-device program's (multi-chip serving pod contract)."""
    from jax.sharding import Mesh

    model, params, cfg = micro
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("dp",))
    assert mesh.size == 8
    programs = export_serving_programs(
        model, params, image_size=IMG, text_len=LT,
        batch_sizes=(8,), platforms=("cpu",), mesh=mesh,
    )
    path = tmp_path / "sharded.npz"
    save_artifact(path, programs, params, {"sharded": True})

    # single-device load must refuse
    with pytest.raises(ValueError, match="devices"):
        ExportedPredictor.load(path, platform="cpu")

    pred = ExportedPredictor.load(path, platform="cpu", mesh=mesh)
    img, ids, mask = _inputs(5, cfg, seed=5)  # padded to the 8-bucket
    got = pred.call(img, ids, mask)
    ref = model.apply({"params": params}, jnp.asarray(img), jnp.asarray(ids),
                      jnp.asarray(mask), deterministic=True)
    np.testing.assert_allclose(
        got["probs"], np.asarray(jax.nn.sigmoid(ref["logits"])),
        rtol=2e-4, atol=2e-5,
    )

    # non-divisible bucket is rejected at export time
    with pytest.raises(ValueError, match="divisible"):
        export_serving_programs(
            model, params, image_size=IMG, text_len=LT,
            batch_sizes=(4,), platforms=("cpu",), mesh=mesh,
        )


def test_multiplatform_combined_key(micro, tmp_path):
    """One multi-platform lowering is stored ONCE under a combined key;
    the loader matches platform membership (no blob duplication)."""
    model, params, cfg = micro
    programs = export_serving_programs(
        model, params, image_size=IMG, text_len=LT,
        batch_sizes=(1,), platforms=("cpu", "tpu"),
    )
    assert list(programs) == ["cpu+tpu::1"]
    path = tmp_path / "combined.npz"
    save_artifact(path, programs, params, {})
    pred = ExportedPredictor.load(path, platform="cpu")
    img, ids, mask = _inputs(1, cfg)
    out = pred.call(img, ids, mask)
    assert out["probs"].shape == (1, 7)
    with pytest.raises(ValueError, match="no programs for platform"):
        ExportedPredictor.load(path, platform="rocm")


def test_missing_platform_errors(micro, tmp_path):
    model, params, cfg = micro
    programs = export_serving_programs(
        model, params, image_size=IMG, text_len=LT,
        batch_sizes=(1,), platforms=("cpu",),
    )
    path = tmp_path / "serving.npz"
    save_artifact(path, programs, params, {})
    with pytest.raises(ValueError, match="no programs for platform"):
        ExportedPredictor.load(path, platform="tpu")
