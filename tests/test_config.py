import pytest

from mmrp_tpu.config import Config


def test_defaults_match_reference_fields():
    cfg = Config()
    # spot-check defaults mirrored from reference src/Helpers/config.py:6-70
    assert cfg.epochs == 50
    assert cfg.batch_size == 32
    assert cfg.lr == 2e-5
    assert cfg.seed == 2709
    assert cfg.num_fusion_layers == 5
    assert cfg.joint_dim == 1024
    assert cfg.kg_model == "TransE"
    assert cfg.kg_emb_dim == 300
    assert cfg.cls_weight == 3.0
    assert cfg.temperature == 0.125
    assert cfg.pos_weight_clamp_max == 1.0


def test_run_name_generated():
    cfg = Config()
    assert cfg.run_name.startswith("method=hybrid(bce_focal)_kg_model=TransE")
    cfg2 = Config(use_hybrid=False, use_focal=True)
    assert cfg2.run_name.startswith("method=focal")
    cfg3 = Config(kg_model="CompGCN")
    assert "kg_opn=corr" in cfg3.run_name


def test_validation_rejects_bad_values():
    with pytest.raises(ValueError):
        Config(kg_model="nope")
    with pytest.raises(ValueError):
        Config(batch_size=0)
    with pytest.raises(ValueError):
        Config(temperature=0.0)
    with pytest.raises(ValueError):
        Config(kg_opn="xor")


def test_yaml_load_coercion(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("lr: '3e-4'\nbatch_size: '16'\nuse_focal: 'true'\nbogus_key: 1\n")
    cfg = Config.load(str(p))
    assert cfg.lr == 3e-4
    assert cfg.batch_size == 16
    assert cfg.use_focal is True


def test_mesh_shape_parsing():
    cfg = Config()
    assert cfg.parse_mesh_shape(8) == (("dp",), (8,))
    cfg2 = Config(mesh_shape="dp=4,tp=2")
    assert cfg2.parse_mesh_shape(8) == (("dp", "tp"), (4, 2))
    with pytest.raises(ValueError):
        cfg2.parse_mesh_shape(4)


def test_kg_model_kwargs():
    assert Config().kg_model_kwargs == {}
    kw = Config(kg_model="CompGCN").kg_model_kwargs
    assert kw == {"num_layers": 2, "dropout": 0.3, "opn": "corr"}


def test_shipped_config_yaml_loads_clean(capsys):
    """The canonical configs/config.yaml must load with NO unknown keys and
    carry the flagship defaults (parity: reference configs/config.yaml)."""
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "configs" / "config.yaml"
    cfg = Config.load(str(path))
    out = capsys.readouterr().out
    assert "[WARN] Unknown keys" not in out
    assert cfg.joint_dim == 1024
    assert cfg.image_backbone == "swin"
    assert cfg.kg_model == "CompGCN"
    assert cfg.kg_opn == "corr"
    assert cfg.cls_weight == 5.0
    assert cfg.kg_weight == 0.5
    assert cfg.pos_weight_clamp_max == 5.0
    assert cfg.use_pallas_attention is True
    assert cfg.dtype_policy == "bf16"
