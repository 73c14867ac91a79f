"""Staged end-to-end training runner.

Glues the pipeline the way the reference's train-everything script does
(reference: src/Trainner/train.py:209-818), with each stage skipped when
its artifact already exists (stage caching, SURVEY §5.4):

  stage 0: tokenizer (train WordPiece vocab from the report corpus)
  stage 1: Swin finetune            -> <out>/swin/            (train.py:304-323)
  stage 2: KG build + KGE training  -> <out>/kg/              (train.py:328-360)
  stage 3: joint multi-modal model  -> <out>/joint/           (train.py:389-739)
  stage 4: embedding dumps + label-overlap GT + retrieval eval
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from mmrp_tpu.config import Config
from mmrp_tpu.labels import LABEL_COLS


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

    import yaml

    data = Path(data_dir)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    # snapshot the config so serving can rebuild the exact model shape
    cfg_dict = {k: v for k, v in cfg.to_dict().items() if k != "run_name"}
    (out / "config.yaml").write_text(yaml.safe_dump(cfg_dict))

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

    # ---- stage 0: tokenizer -------------------------------------------------
    tok = load_or_train_tokenizer(
        str(out / "vocab.txt"), corpus=(r["report_text"] for r in records)
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
    mm_cfg = MultiModalConfig.from_config(cfg, num_classes=len(LABEL_COLS),
                                          flagship=flagship)
    model = MultiModalRetrievalModel(mm_cfg)

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
                                    seed=cfg.seed)
    val_loader = build_dataloader(val_ds, cfg.batch_size, shuffle=False)

    result = run_joint_training(
        cfg, model, train_loader, val_loader, str(out / "joint"),
        kg_dim=node_emb.shape[1], class_names=LABEL_COLS,
    )

    # ---- stage 4: embedding dumps + GT + retrieval eval ----------------------
    test_ds = KGDataset(split_recs["test"], tok, max_length=cfg.text_dim,
                        image_size=cfg.image_size)
    test_loader = build_dataloader(test_ds, cfg.batch_size, shuffle=False)
    dump_embeddings(model, result.state.params, test_loader, str(out / "test"))
    # NOT train_loader: the weighted sampler draws with replacement, which
    # would put duplicate rows in (and drop rows from) the gallery dump
    train_dump_loader = build_dataloader(train_ds, cfg.batch_size, shuffle=False)
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
