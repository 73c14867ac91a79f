"""Staged end-to-end training runner.

Glues the pipeline the way the reference's train-everything script does
(reference: src/Trainner/train.py:209-818), with each stage skipped when
its artifact already exists (stage caching, SURVEY §5.4):

  stage 0: tokenizer — corpus-trained WordPiece, or ``cfg.pretrained_vocab``
           (a BERT vocab.txt) when bootstrapping from pretrained backbones
  stage 1: Swin finetune            -> <out>/swin/            (train.py:304-323)
  stage 2: KG build + KGE training  -> <out>/kg/              (train.py:328-360)
           + LabelAttention pooling -> <out>/label_attention.npz
             (train_label_attention.py:393-514)
  stage 3: joint multi-modal model  -> <out>/joint/ — vision tower
           warm-started from stage 1 (and/or ``cfg.pretrained_swin``), text
           tower from ``cfg.pretrained_bert`` (fusion.py:92-99, 313-325)
  stage 4: embedding dumps + label-overlap GT + retrieval eval
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from mmrp_tpu.config import Config
from mmrp_tpu.labels import LABEL_COLS


def _load_pretrained_backbones(cfg: Config, mm_swin_cfg, tok):
    """Resolve cfg.pretrained_bert / cfg.pretrained_swin into converted
    param subtrees + a TextConfig override matching the BERT checkpoint."""
    from mmrp_tpu.models import port

    text_override, bert_params, swin_params = None, None, None
    if cfg.pretrained_bert:
        sd = port.load_pretrained_state(cfg.pretrained_bert)
        text_override = port.text_config_from_state(sd)
        if text_override.vocab_size != len(tok.vocab):
            raise ValueError(
                f"pretrained_vocab has {len(tok.vocab)} tokens but the BERT "
                f"embedding table has {text_override.vocab_size} rows — the "
                "vocab file must be the checkpoint's own vocab.txt"
            )
        bert_params = port.convert_hf_bert(sd, text_override.num_layers)
    if cfg.pretrained_swin:
        sd = port.load_pretrained_state(cfg.pretrained_swin)
        depths, heads = port.swin_layout_from_state(sd)
        if tuple(depths) != tuple(mm_swin_cfg.depths):
            raise ValueError(
                f"pretrained_swin depths {depths} != configured "
                f"image_backbone depths {tuple(mm_swin_cfg.depths)} — set "
                "image_backbone to the checkpoint's variant"
            )
        if tuple(heads) != tuple(mm_swin_cfg.num_heads):
            raise ValueError(
                f"pretrained_swin heads {heads} != configured "
                f"image_backbone heads {tuple(mm_swin_cfg.num_heads)} — "
                "same depths but a different variant (e.g. Swin-S vs -B)"
            )
        swin_params = port.convert_hf_swin(sd, depths)
    return text_override, bert_params, swin_params


def _run_swin_finetune_stage(cfg: Config, out: Path, split_recs, mm_cfg, tok,
                             writer, pretrained_swin_params):
    """Stage 1 (reference train.py:304-323 -> finetune_swin.py:457-1121):
    label-aware Swin finetune on a balanced subset; cached as a param-tree
    npz + metrics JSON. Returns the finetuned backbone subtree."""
    from mmrp_tpu.utils.checkpoint import load_param_tree, save_param_tree

    swin_dir = out / "swin"
    params_path = swin_dir / "swin_backbone.npz"
    if params_path.exists():
        return load_param_tree(str(params_path))

    from mmrp_tpu.data.dataset import (
        ChestXRDataset, build_dataloader, pos_weight_from_labels,
    )
    from mmrp_tpu.models.finetune_head import SwinForFinetune
    from mmrp_tpu.train.swin_finetune import (
        SwinFinetuneConfig, build_finetune_subset, finetune,
    )

    swin_dir.mkdir(parents=True, exist_ok=True)
    sub = build_finetune_subset(split_recs["train"], seed=cfg.seed)

    # image-only stage: text length 8 keeps the (unused) token batching cheap
    train_ds = ChestXRDataset(sub, tok, max_length=8, image_size=cfg.image_size)
    val_ds = ChestXRDataset(split_recs["val"], tok, max_length=8,
                            image_size=cfg.image_size)
    train_loader = build_dataloader(train_ds, cfg.batch_size, weighted=True,
                                    seed=cfg.seed, num_workers=cfg.data_workers)
    val_loader = build_dataloader(val_ds, cfg.batch_size, shuffle=False,
                                  num_workers=cfg.data_workers)

    labels = np.stack([np.asarray(r["labels"], np.float32) for r in sub])
    pw = pos_weight_from_labels(labels, clamp_max=5.0)

    ft_cfg = SwinFinetuneConfig(
        lr=cfg.swin_finetune_lr, epochs=cfg.swin_finetune_epochs,
        seed=cfg.seed,
    )
    model = SwinForFinetune(
        swin=mm_cfg.swin,
        num_classes=len(LABEL_COLS), num_heads=mm_cfg.num_heads,
    )
    sample = train_ds[0]["image"][None]
    res = finetune(
        model, ft_cfg,
        train_batches=lambda: iter(train_loader),
        val_batches=lambda: iter(val_loader),
        base_pos_weight=pw, sample_image=sample,
        metric_writer=writer, class_names=LABEL_COLS,
        init_backbone=pretrained_swin_params,
    )
    save_param_tree(str(params_path), res["params"]["swin"])
    np.save(swin_dir / "thresholds.npy", res["thresholds"])
    (swin_dir / "best_swin_finetune_metrics.json").write_text(json.dumps(
        {"best_epoch": res["best_epoch"], "temperature": res["temperature"],
         "macro_f1": res["report"]["macro_f1"],
         "macro_auroc": res["report"]["macro_auroc"]},
        indent=1, default=float,
    ))
    print(f"[runner] Swin finetune done: epoch {res['best_epoch']}, "
          f"macro_f1 {res['report']['macro_f1']:.4f}")
    return res["params"]["swin"]


def _run_label_attention_stage(cfg: Config, out: Path, split_recs,
                               node_emb, node2id, writer):
    """LabelAttention pooling head (reference train_label_attention.py:
    393-514): trains on per-record label-node sets over the KG embedding
    table and writes the ``label_attention.npz`` the serving reranker
    consumes (serve/runner.py, reference reranker.py:61-86)."""
    la_path = out / "label_attention.npz"
    if la_path.exists():
        return
    from mmrp_tpu.kg.label_attention import (
        LabelAttentionTrainer, LabelAttentionTrainerConfig,
    )

    label_sets, vecs = [], []
    for r in split_recs["train"]:
        idxs = [
            node2id.get(f"label:{g}")
            for g, on in zip(LABEL_COLS, r["labels"]) if on
        ]
        label_sets.append([i for i in idxs if i is not None])
        vecs.append(np.asarray(r["labels"], np.float32))
    la_cfg = LabelAttentionTrainerConfig(
        hidden_dim=cfg.la_hidden_dim, batch_size=cfg.la_batch_size,
        epochs=cfg.la_epochs, lr=cfg.la_lr, patience=cfg.la_patience,
        ice_weight=cfg.la_ice_weight, tpl_weight=cfg.la_tpl_weight,
        bce_weight=cfg.la_bce_weight, seed=cfg.seed,
    )
    la = LabelAttentionTrainer(node_emb, la_cfg)
    best = la.train(label_sets, np.stack(vecs), metric_writer=writer)
    rec = la.eval_retrieval(label_sets, np.stack(vecs))
    la.save(str(la_path))
    (out / "best_label_attention_metrics.json").write_text(
        json.dumps({**best, **rec}, indent=1, default=float)
    )
    print(f"[runner] LabelAttention stage done: {best} {rec}")


def run_training_pipeline(
    cfg: Config,
    data_dir: str,
    out_dir: str,
    flagship: bool = False,
    max_records: Optional[int] = None,
) -> Dict:
    import jax

    from mmrp_tpu.data.dataset import ChestXRDataset, build_dataloader
    from mmrp_tpu.data.tokenizer import load_or_train_tokenizer
    from mmrp_tpu.eval.gt import build_label_overlap_gt
    from mmrp_tpu.eval.retrieval_eval import dual_gallery_eval
    from mmrp_tpu.kg.builder import KGBuilder
    from mmrp_tpu.kg.trainer import KGTrainer, KGTrainerConfig
    from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
    from mmrp_tpu.retrieval.gallery import RetrievalEngine
    from mmrp_tpu.train.pipeline import dump_embeddings, run_joint_training
    from mmrp_tpu.utils.logging import MetricWriter

    import yaml

    data = Path(data_dir)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    # snapshot the config so serving can rebuild the exact model shape
    cfg_dict = {k: v for k, v in cfg.to_dict().items() if k != "run_name"}
    (out / "config.yaml").write_text(yaml.safe_dump(cfg_dict))
    writer = MetricWriter(str(out), cfg.run_name, cfg.to_dict())

    records = json.loads((data / "records_cache.json").read_text())["records"]
    if max_records:
        records = records[:max_records]
    splits = {
        name: json.loads((data / "splits" / f"{name}_ids.json").read_text())
        for name in ("train", "val", "test")
    }
    by_id = {r["id"]: r for r in records}
    split_recs = {
        name: [by_id[i] for i in ids if i in by_id] for name, ids in splits.items()
    }
    for name, recs in split_recs.items():
        # fail fast: an empty split (e.g. max_records truncating a cache
        # ordered by split) would otherwise crash stage 4's embedding
        # dump with an obscure np.concatenate error after hours of
        # training
        if not recs:
            raise ValueError(
                f"split {name!r} has no records in records_cache.json"
                + (f" (max_records={max_records} truncation?)"
                   if max_records else "")
            )

    # ---- stage 0: tokenizer -------------------------------------------------
    if cfg.pretrained_vocab:
        # the checkpoint's own vocab.txt: token ids line up with a ported
        # ClinicalBERT embedding table (fusion.py:313-325). Copy is
        # unconditional: a vocab.txt left by an earlier corpus-trained
        # run in the same out_dir must not shadow the pinned file.
        shutil.copyfile(cfg.pretrained_vocab, out / "vocab.txt")
        tok = load_or_train_tokenizer(str(out / "vocab.txt"))
    else:
        tok = load_or_train_tokenizer(
            str(out / "vocab.txt"), corpus=(r["report_text"] for r in records)
        )

    # ---- pretrained bootstrap (fusion.py:92-99, 313-325) -------------------
    # train-time model config: plain-XLA attention (measured faster than the
    # Pallas custom-VJP recompute in training — Config.train_use_pallas_attention,
    # docs/ROOFLINE.md §7). Serving rebuilds from config.yaml, which keeps
    # the Pallas serving default; the params are interchangeable (same tree).
    import dataclasses as _dc

    train_cfg = _dc.replace(
        cfg, use_pallas_attention=cfg.train_use_pallas_attention)
    mm_cfg0 = MultiModalConfig.from_config(train_cfg,
                                           num_classes=len(LABEL_COLS),
                                           flagship=flagship)
    text_override, bert_params, swin_pre_params = _load_pretrained_backbones(
        cfg, mm_cfg0.swin, tok
    )

    # ---- stage 1: Swin finetune (train.py:304-323) -------------------------
    swin_ft_params = None
    if cfg.run_swin_finetune and mm_cfg0.vision_backbone == "swin":
        swin_ft_params = _run_swin_finetune_stage(
            cfg, out, split_recs, mm_cfg0, tok, writer, swin_pre_params
        )

    # ---- stage 2: KG (before joint so alignment targets exist) -------------
    kg_dir = out / "kg"
    if not (kg_dir / "node_embeddings.npy").exists():
        builder = KGBuilder(out_dir=str(kg_dir), mode=cfg.kg_mode)
        builder = builder.ensure_exists(
            lambda b: b.build_from_records(split_recs["train"], LABEL_COLS)
        )
        arr, conf, src = builder.triple_arrays()
        kg_cfg = KGTrainerConfig(
            model=cfg.kg_model, emb_dim=cfg.kg_emb_dim, epochs=cfg.kg_epochs,
            lr=cfg.kg_lr, neg_size=cfg.kg_neg_size, adv_temp=cfg.kg_adv_temp,
            use_bf16=cfg.kg_use_amp and jax.default_backend() == "tpu",
            seed=cfg.seed, **(
                dict(num_layers=cfg.kg_num_layers, dropout=cfg.kg_dropout,
                     opn=cfg.kg_opn) if cfg.kg_model == "CompGCN" else {}
            ),
        )
        kgt = KGTrainer(len(builder.nodes), len(builder.relations), kg_cfg)
        kgt.load_triples(arr.tolist(), conf.tolist(), src)
        best = kgt.train()
        kgt.save(str(kg_dir), node_names=list(builder.nodes))
        print(f"[runner] KG stage done: {best}")
    node_emb = np.load(kg_dir / "node_embeddings.npy")
    node2id = json.loads((kg_dir / "node2id.json").read_text())

    if cfg.run_label_attention:
        _run_label_attention_stage(cfg, out, split_recs, node_emb, node2id,
                                   writer)

    # per-record KG targets for the alignment loss
    def kg_target_for(rec):
        idx = node2id.get(f"report:{rec['id']}")
        if idx is not None:
            return node_emb[idx], 1.0
        rows = [node2id.get(f"label:{g}") for g, on in zip(LABEL_COLS, rec["labels"]) if on]
        rows = [r for r in rows if r is not None]
        if rows:
            return node_emb[np.asarray(rows)].mean(0), 1.0
        return np.zeros(node_emb.shape[1], np.float32), 0.0

    # ---- stage 3: joint model -----------------------------------------------
    mm_cfg = MultiModalConfig.from_config(train_cfg,
                                          num_classes=len(LABEL_COLS),
                                          flagship=flagship,
                                          text_override=text_override)
    model = MultiModalRetrievalModel(mm_cfg)

    # persist the RESOLVED model shape: config.yaml alone cannot reproduce
    # the text tower when it was pinned to a ported checkpoint's dims
    # (text_override) or when flagship=True was passed programmatically —
    # serving (serve/runner.py) rebuilds from this, otherwise the orbax
    # restore shape-mismatches and the demo would silently serve random
    # weights (reference keeps architecture with the ckpt the same way:
    # train_label_attention.py:365-374)
    (out / "model_config.json").write_text(json.dumps({
        "flagship": flagship,
        "vision_backbone": mm_cfg.vision_backbone,
        "text": {k: v for k, v in _dc.asdict(mm_cfg.text).items()
                 if k not in ("quant", "remat")},
    }, indent=1))

    # warm-start the joint towers: finetuned Swin (stage 1) takes priority
    # over the raw pretrained checkpoint; text from the ported BERT
    # (reference fusion.py:92-99 — joint training always starts from
    # pretrained/finetuned backbones, never random init)
    warm_subtrees = {}
    vision_warm = swin_ft_params if swin_ft_params is not None else swin_pre_params
    if vision_warm is not None and mm_cfg.vision_backbone == "swin":
        warm_subtrees["swin"] = vision_warm
    if bert_params is not None:
        warm_subtrees["text"] = bert_params

    warm_start = None
    if warm_subtrees:
        import jax.numpy as jnp

        def warm_start(params):
            bb = dict(params["model"]["backbones"])
            for k, sub in warm_subtrees.items():
                bb[k] = jax.tree_util.tree_map(
                    lambda t, s: jnp.asarray(s, t.dtype), bb[k], sub
                )
            m = dict(params["model"])
            m["backbones"] = bb
            return {**params, "model": m}

    class KGDataset(ChestXRDataset):
        def __getitem__(self, idx):
            s = super().__getitem__(idx)
            tgt, valid = kg_target_for(self.records[idx])
            s["kg_target"] = np.asarray(tgt, np.float32)
            s["kg_target_valid"] = np.float32(valid)
            return s

    train_ds = KGDataset(split_recs["train"], tok, max_length=cfg.text_dim,
                         image_size=cfg.image_size)
    val_ds = KGDataset(split_recs["val"], tok, max_length=cfg.text_dim,
                       image_size=cfg.image_size)
    train_loader = build_dataloader(train_ds, cfg.batch_size, weighted=True,
                                    seed=cfg.seed, num_workers=cfg.data_workers)
    val_loader = build_dataloader(val_ds, cfg.batch_size, shuffle=False,
                                  num_workers=cfg.data_workers)

    result = run_joint_training(
        cfg, model, train_loader, val_loader, str(out / "joint"),
        kg_dim=node_emb.shape[1], class_names=LABEL_COLS,
        metric_writer=writer, warm_start=warm_start,
    )

    # ---- stage 4: embedding dumps + GT + retrieval eval ----------------------
    test_ds = KGDataset(split_recs["test"], tok, max_length=cfg.text_dim,
                        image_size=cfg.image_size)
    test_loader = build_dataloader(test_ds, cfg.batch_size, shuffle=False,
                                   num_workers=cfg.data_workers)
    dump_embeddings(model, result.state.params, test_loader, str(out / "test"))
    # NOT train_loader: the weighted sampler draws with replacement, which
    # would put duplicate rows in (and drop rows from) the gallery dump
    train_dump_loader = build_dataloader(train_ds, cfg.batch_size, shuffle=False,
                                         num_workers=cfg.data_workers)
    dump_embeddings(model, result.state.params, train_dump_loader, str(out / "train"))

    test_emb = np.load(out / "test_embeddings.npy")
    test_ids = json.loads((out / "test_ids.json").read_text())
    train_emb = np.load(out / "train_embeddings.npy")
    train_ids = json.loads((out / "train_ids.json").read_text())

    lbl = lambda ids: np.stack([by_id[i]["labels"] for i in ids])
    gt_test = build_label_overlap_gt(test_ids, lbl(test_ids), test_ids, lbl(test_ids))
    gt_train = build_label_overlap_gt(test_ids, lbl(test_ids), train_ids, lbl(train_ids))
    ret = dual_gallery_eval(
        RetrievalEngine(test_emb, test_ids),
        RetrievalEngine(train_emb, train_ids),
        test_emb, test_ids, gt_test, gt_train,
        out_dir=str(out / "retrieval_eval"),
    )
    summary = {"joint": result.best_metrics, "retrieval": ret}
    (out / "pipeline_summary.json").write_text(json.dumps(summary, indent=1, default=float))
    return summary
