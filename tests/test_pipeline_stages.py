"""Staged-pipeline tests: pretrained bootstrap wiring, Swin-finetune /
LabelAttention stage functions, and full-train-state resume.

Covers the reference's stage orchestration + pretrained-backbone
consumption (reference: src/Trainner/train.py:304-360,
src/Model/fusion.py:92-99, 313-325) and the mid-training resume the
reference lacks (SURVEY §5.4)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmrp_tpu.config import Config
from mmrp_tpu.labels import LABEL_COLS


# ---------------------------------------------------------------------------
# Pretrained bootstrap
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_bert_ckpt(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    d = tmp_path_factory.mktemp("bert")
    hf = BertModel(BertConfig(
        vocab_size=96, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=48,
    )).eval()
    torch.save(hf.state_dict(), d / "bert.pt")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"tok{i}" for i in range(91)
    ]
    (d / "vocab.txt").write_text("\n".join(vocab) + "\n")
    return str(d / "bert.pt"), str(d / "vocab.txt"), hf


def test_text_config_inferred_from_state(tiny_bert_ckpt):
    from mmrp_tpu.models.port import load_pretrained_state, text_config_from_state

    path, _, hf = tiny_bert_ckpt
    sd = load_pretrained_state(path)
    tc = text_config_from_state(sd)
    assert tc.vocab_size == 96
    assert tc.hidden_dim == 32
    assert tc.num_layers == 2
    assert tc.intermediate_dim == 64
    assert tc.max_positions == 48
    # hidden//64 floor never returns 0 heads
    assert tc.num_heads >= 1


def test_swin_layout_inferred_from_state():
    pytest.importorskip("torch")
    from transformers import SwinConfig as HFSwinConfig, SwinModel

    from mmrp_tpu.models.port import swin_layout_from_state

    hf = SwinModel(HFSwinConfig(
        image_size=56, patch_size=4, embed_dim=24, depths=[2, 2],
        num_heads=[2, 4], window_size=7,
    ))
    depths, heads = swin_layout_from_state(hf.state_dict())
    assert depths == (2, 2)
    assert heads == (2, 4)


def test_bootstrap_wiring_into_joint_model(tiny_bert_ckpt):
    """cfg.pretrained_bert + vocab -> text tower built at checkpoint dims
    with the ported embedding table in place (fusion.py:92-99, 313-325)."""
    from mmrp_tpu.data.tokenizer import WordPieceTokenizer
    from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
    from mmrp_tpu.train.runner import _load_pretrained_backbones

    path, vocab_path, hf = tiny_bert_ckpt
    cfg = Config(
        image_backbone="swin_micro", image_size=28, joint_dim=32,
        num_fusion_layers=1, num_heads=2, text_dim=16,
        use_pallas_attention=False,
        pretrained_bert=path, pretrained_vocab=vocab_path,
    )
    tok = WordPieceTokenizer.from_vocab_file(vocab_path)
    mm0 = MultiModalConfig.from_config(cfg, num_classes=len(LABEL_COLS))
    text_override, bert_params, swin_params = _load_pretrained_backbones(
        cfg, mm0.swin, tok
    )
    assert swin_params is None
    assert text_override.vocab_size == 96 and text_override.hidden_dim == 32

    mm = MultiModalConfig.from_config(cfg, num_classes=len(LABEL_COLS),
                                      text_override=text_override)
    model = MultiModalRetrievalModel(mm)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 28, 28, 3), dtype=np.float32))
    ids = jnp.asarray(rng.integers(0, 96, (2, 16)).astype(np.int32))
    mask = jnp.ones((2, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img, ids, mask)["params"]

    # warm-start exactly the way the runner does
    bb = dict(params["backbones"])
    bb["text"] = jax.tree_util.tree_map(
        lambda t, s: jnp.asarray(s, t.dtype), bb["text"], bert_params
    )
    params = {**params, "backbones": bb}

    want = hf.state_dict()["embeddings.word_embeddings.weight"].numpy()
    got = np.asarray(params["backbones"]["text"]["embeddings"]["word"]["embedding"])
    np.testing.assert_allclose(got, want, atol=1e-6)

    out = model.apply({"params": params}, img, ids, mask)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_bootstrap_vocab_mismatch_rejected(tiny_bert_ckpt, tmp_path):
    from mmrp_tpu.data.tokenizer import WordPieceTokenizer
    from mmrp_tpu.models.multimodal import MultiModalConfig
    from mmrp_tpu.train.runner import _load_pretrained_backbones

    path, _, _ = tiny_bert_ckpt
    bad_vocab = tmp_path / "vocab.txt"
    bad_vocab.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "b"]) + "\n")
    cfg = Config(image_backbone="swin_micro", image_size=28,
                 pretrained_bert=path, pretrained_vocab=str(bad_vocab))
    tok = WordPieceTokenizer.from_vocab_file(str(bad_vocab))
    mm0 = MultiModalConfig.from_config(cfg, num_classes=3)
    with pytest.raises(ValueError, match="vocab"):
        _load_pretrained_backbones(cfg, mm0.swin, tok)


def test_pretrained_bert_requires_vocab():
    with pytest.raises(ValueError, match="pretrained_vocab"):
        Config(pretrained_bert="some/model")


# ---------------------------------------------------------------------------
# Resume: killed-and-resumed joint run == uninterrupted run
# ---------------------------------------------------------------------------


class _StubLoader:
    """Deterministic micro loader with the BatchIterator contract
    (.ds.records, len, iteration order a function of seed + _epoch)."""

    class _DS:
        def __init__(self, records):
            self.records = records

    def __init__(self, n=8, batch=4, seed=0, n_classes=5, img=28, lt=8):
        rng = np.random.default_rng(seed)
        self.images = rng.random((n, img, img, 3)).astype(np.float32)
        self.ids_arr = rng.integers(1, 50, (n, lt)).astype(np.int32)
        self.labels = (rng.random((n, n_classes)) < 0.4).astype(np.float32)
        self.ds = self._DS(
            [{"id": f"r{i}", "labels": self.labels[i]} for i in range(n)]
        )
        self.batch = batch
        self.seed = seed
        self._epoch = 0
        self.n = n
        self.lt = lt

    def __len__(self):
        return self.n // self.batch

    def __iter__(self):
        order = np.random.default_rng(self.seed + 1000 + self._epoch).permutation(self.n)
        self._epoch += 1
        for s in range(0, self.n, self.batch):
            idx = order[s : s + self.batch]
            yield {
                "image": self.images[idx],
                "input_ids": self.ids_arr[idx],
                "attention_mask": np.ones((len(idx), self.lt), np.int32),
                "labels": self.labels[idx],
                "valid": np.ones(len(idx), np.float32),
                "ids": [f"r{i}" for i in idx],
            }


def _micro_model(n_classes=5):
    from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
    from mmrp_tpu.models.swin import SwinConfig
    from mmrp_tpu.models.text_encoder import TextConfig

    cfg = MultiModalConfig(
        swin=SwinConfig.micro(use_pallas=False),
        text=TextConfig.small(hidden_dim=32, num_layers=1, num_heads=2,
                              intermediate_dim=64, vocab_size=64),
        joint_dim=32, num_fusion_layers=1, num_heads=2,
        num_classes=n_classes, max_text_len=8, dropout=0.1,
    )
    return MultiModalRetrievalModel(cfg)


class _KillAfterEpoch(Exception):
    pass


def _run_joint(cfg, out_dir, kill_at_epoch=None):
    from mmrp_tpu.train.pipeline import run_joint_training
    from mmrp_tpu.utils.logging import MetricWriter

    model = _micro_model()
    train_loader = _StubLoader(seed=3)
    val_loader = _StubLoader(seed=4)

    writer = MetricWriter(out_dir, "t", {})
    if kill_at_epoch is not None:
        orig = writer.log

        def log(metrics, step=None):
            orig(metrics, step=step)
            if "val/composite" in metrics and step == kill_at_epoch:
                raise _KillAfterEpoch()

        writer.log = log
    return run_joint_training(
        cfg, model, train_loader, val_loader, out_dir,
        class_names=[f"c{i}" for i in range(5)], metric_writer=writer,
    )


def test_resume_matches_uninterrupted_run(tmp_path):
    cfg = Config(
        epochs=3, patience=10, batch_size=4, lr=1e-3, seed=7,
        image_backbone="swin_micro", image_size=28, joint_dim=32,
        num_fusion_layers=1, num_heads=2, text_dim=8,
        use_pallas_attention=False,
    )

    a_dir = tmp_path / "straight"
    _run_joint(cfg, str(a_dir))

    b_dir = tmp_path / "killed"
    # killed during epoch-1 validation: epoch 0's full-state ckpt exists,
    # epoch 1 is incomplete and must be re-run by the resumed process
    with pytest.raises(_KillAfterEpoch):
        _run_joint(cfg, str(b_dir), kill_at_epoch=1)
    _run_joint(cfg.replace(resume=True), str(b_dir))

    from mmrp_tpu.train.joint import init_train_state
    from mmrp_tpu.utils.checkpoint import CheckpointManager

    model = _micro_model()
    loader = _StubLoader(seed=4)
    sample = next(iter(loader))
    sample_j = {k: jnp.asarray(v) for k, v in sample.items() if k != "ids"}
    tmpl_state = init_train_state(model, cfg, jax.random.PRNGKey(cfg.seed),
                                  sample_j, total_steps=6)
    tmpl = {"params": tmpl_state.params, "opt_state": tmpl_state.opt_state,
            "base_rng": tmpl_state.base_rng, "step": np.zeros((), np.int64),
            "epoch": np.zeros((), np.int64), "bad": np.zeros((), np.int64)}

    fin_a = CheckpointManager(str(a_dir / "ckpt")).restore(dict(tmpl))
    fin_b = CheckpointManager(str(b_dir / "ckpt")).restore(dict(tmpl))
    assert int(fin_a["epoch"]) == int(fin_b["epoch"]) == 2
    assert int(fin_a["step"]) == int(fin_b["step"])
    flat_a = jax.tree_util.tree_leaves(fin_a["params"])
    flat_b = jax.tree_util.tree_leaves(fin_b["params"])
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# LabelAttention stage function
# ---------------------------------------------------------------------------


def test_label_attention_stage_writes_servable_ckpt(tmp_path):
    from mmrp_tpu.kg.label_attention import LabelAttentionTrainer
    from mmrp_tpu.train.runner import _run_label_attention_stage

    rng = np.random.default_rng(0)
    node_emb = rng.standard_normal((20, 16)).astype(np.float32)
    node2id = {f"label:{g}": i % 20 for i, g in enumerate(LABEL_COLS)}
    recs = []
    for i in range(12):
        labels = (rng.random(len(LABEL_COLS)) < 0.1).astype(np.float32)
        recs.append({"id": f"r{i}", "labels": labels})
    cfg = Config(la_epochs=2, la_batch_size=8, epochs=1)
    _run_label_attention_stage(cfg, tmp_path, {"train": recs}, node_emb,
                               node2id, writer=None)
    assert (tmp_path / "label_attention.npz").exists()
    metrics = json.loads(
        (tmp_path / "best_label_attention_metrics.json").read_text()
    )
    assert "loss" in metrics
    # the serving reranker path: from_checkpoint + pool must round-trip
    la = LabelAttentionTrainer.from_checkpoint(
        str(tmp_path / "label_attention.npz"), node_emb
    )
    pooled = la.pool([[0, 1], [2]])
    assert pooled.shape == (2, 16)
    assert np.isfinite(pooled).all()
    # stage caching: second call is a no-op (file unchanged)
    before = (tmp_path / "label_attention.npz").stat().st_mtime_ns
    _run_label_attention_stage(cfg, tmp_path, {"train": recs}, node_emb,
                               node2id, writer=None)
    assert (tmp_path / "label_attention.npz").stat().st_mtime_ns == before


def test_serve_rebuilds_overridden_text_tower(tmp_path):
    """Serving must rebuild the EXACT trained model shape from
    model_config.json: a run trained with a pretrained-pinned text tower
    (text_override) restores into that shape, and a shape-mismatched
    checkpoint raises instead of silently serving random weights
    (regression: the ValueError fallback used to hand back fresh init)."""
    import dataclasses
    import yaml

    from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
    from mmrp_tpu.models.text_encoder import TextConfig
    from mmrp_tpu.serve.runner import build_demo_context
    from mmrp_tpu.utils.checkpoint import CheckpointManager

    run = tmp_path / "run"
    run.mkdir()
    cfg = Config(image_backbone="swin_micro", image_size=28, joint_dim=32,
                 num_fusion_layers=1, num_heads=2, text_dim=16,
                 use_pallas_attention=False)
    (run / "config.yaml").write_text(yaml.safe_dump(
        {k: v for k, v in cfg.to_dict().items() if k != "run_name"}))
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"tok{i}" for i in range(91)
    ]
    (run / "vocab.txt").write_text("\n".join(vocab) + "\n")

    # the trained tower: dims a ported checkpoint would pin (NOT the
    # TextConfig.small defaults config.yaml alone would produce)
    text_override = TextConfig(
        vocab_size=96, hidden_dim=48, num_layers=2, num_heads=2,
        intermediate_dim=80, max_positions=48, use_fused_attention=False,
    )
    mm_cfg = MultiModalConfig.from_config(
        cfg, num_classes=len(LABEL_COLS), text_override=text_override)
    model = MultiModalRetrievalModel(mm_cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 28, 28, 3)), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
    )["params"]
    (run / "model_config.json").write_text(json.dumps({
        "flagship": False,
        "vision_backbone": mm_cfg.vision_backbone,
        "text": {k: v for k, v in dataclasses.asdict(mm_cfg.text).items()
                 if k not in ("quant", "remat")},
    }))
    mgr = CheckpointManager(str(run / "joint" / "ckpt"))
    assert mgr.update_best(1.0, {"model": params}, {})

    ctx = build_demo_context(str(run))
    got = ctx["predictor"].params["model"]
    want_sum = float(sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(params)))
    got_sum = float(sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(got)))
    assert got_sum == pytest.approx(want_sum, rel=1e-6)

    # without the snapshot the rebuilt template mismatches the checkpoint:
    # that must be a loud error, not a fresh-weights fallback
    (run / "model_config.json").unlink()
    with pytest.raises(RuntimeError, match="does not match the model shape"):
        build_demo_context(str(run))
