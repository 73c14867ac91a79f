"""End-to-end training orchestration: swin finetune -> KG -> joint model.

Mirrors the reference's stage structure and caching discipline
(reference: src/Trainner/train.py:209-818):

- stage 1: Swin finetune if no cached checkpoint (:304-323);
- stage 2: KG build + KG embedding training if no cached node embeddings
  (:328-360);
- stage 3: joint training with weighted sampling, hybrid+contrastive+KG
  losses, per-epoch validation with per-class F1-optimal thresholds, and
  composite 0.5*F1 + 0.5*AUROC early stopping (:555-739);
- artifacts: best checkpoint, val/train joint embeddings + ids (:730-816),
  per-stage best-metric JSONs.

Each stage checks its artifact and skips when present — the reference's
pipeline-resume pattern (SURVEY §5.4) — and the full train state
(params + optimizer + step) is checkpointed through orbax.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mmrp_tpu.config import Config
from mmrp_tpu.data.dataset import (
    BatchIterator,
    ChestXRDataset,
    build_dataloader,
    pos_weight_from_labels,
)
from mmrp_tpu.eval.metrics import (
    composite_score,
    find_best_thresholds,
    per_class_report,
)
from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
from mmrp_tpu.train.joint import compute_losses, init_train_state, make_eval_step, make_train_step
from mmrp_tpu.utils.logging import MetricWriter


@dataclass
class JointTrainResult:
    state: object
    thresholds: np.ndarray
    best_metrics: Dict
    val_embeddings: np.ndarray
    val_ids: List[str]


def run_joint_training(
    cfg: Config,
    model: MultiModalRetrievalModel,
    train_loader,
    val_loader,
    out_dir: str,
    kg_dim: Optional[int] = None,
    class_names: Optional[Sequence[str]] = None,
    metric_writer: Optional[MetricWriter] = None,
    mesh=None,
    warm_start: Optional[Callable] = None,
) -> JointTrainResult:
    """``warm_start``: optional fn(params) -> params applied once after init
    (pretrained/finetuned backbone injection, reference fusion.py:92-99).
    With ``cfg.resume`` and an existing full-state checkpoint, training
    continues from the last saved epoch instead (params + optimizer + step
    + data order restored — the mid-training resume the reference lacks,
    SURVEY §5.4)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    writer = metric_writer or MetricWriter(out_dir, cfg.run_name, cfg.to_dict())

    # pos_weight from the training labels (train.py:463-468)
    train_labels = np.stack(
        [np.asarray(r["labels"], np.float32) for r in train_loader.ds.records]
    )
    pw = pos_weight_from_labels(train_labels, cfg.pos_weight_clamp_max)

    sample = next(iter(val_loader))
    sample_j = {k: jnp.asarray(v) for k, v in sample.items() if k != "ids"}
    steps_per_epoch = max(1, len(train_loader))
    state = init_train_state(
        model, cfg, jax.random.PRNGKey(cfg.seed), sample_j,
        total_steps=cfg.epochs * steps_per_epoch, kg_dim=kg_dim,
    )
    if warm_start is not None:
        state = state.replace(params=warm_start(state.params))
    if mesh is not None:
        from mmrp_tpu.parallel.mesh import shard_params

        sharded = shard_params(state.params, mesh)
        state = state.replace(params=sharded, opt_state=state.tx.init(sharded))

    train_step = make_train_step(model, cfg, pw, donate=False)
    eval_step = make_eval_step(model, return_attention=True)

    from mmrp_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(out / "ckpt"))
    best = {"composite": -1.0}
    best_state = state
    bad = 0
    step = 0
    start_epoch = 0
    if getattr(cfg, "resume", False) and mgr.latest_step() is not None:
        tmpl = {"params": state.params, "opt_state": state.opt_state,
                "base_rng": state.base_rng,
                "step": np.zeros((), np.int64), "epoch": np.zeros((), np.int64),
                "bad": np.zeros((), np.int64)}
        r = mgr.restore(tmpl)
        state = state.replace(params=r["params"], opt_state=r["opt_state"],
                              base_rng=r["base_rng"], step=int(r["step"]))
        start_epoch = int(r["epoch"]) + 1
        bad = int(r["bad"])
        step = int(r["step"])
        bm = mgr.best_metrics()
        if bm:
            best = {k: v for k, v in bm.items() if k != "_best_value"}
            try:
                best_model = mgr.restore_best({"model": state.params["model"]})
                bp = dict(state.params)
                bp["model"] = best_model["model"]
                best_state = state.replace(params=bp)
            except (FileNotFoundError, ValueError):
                pass
        print(f"[resume] continuing from epoch {start_epoch} (step {step})")
    # deterministic data order across resume: BatchIterator reseeds per
    # epoch from (seed + _epoch)
    if hasattr(train_loader, "_epoch"):
        train_loader._epoch = start_epoch

    for epoch in range(start_epoch, cfg.epochs):
        for batch in train_loader:
            jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "ids"}
            if mesh is not None:
                from mmrp_tpu.data.pipeline import device_put_sharded_batch

                jb = device_put_sharded_batch(jb, mesh)
            state, metrics = train_step(state, jb)
            if step % 20 == 0:
                writer.log({k: float(v) for k, v in metrics.items()}, step=step)
            step += 1

        # ---- validation (train.py:620-704) ----
        probs, ys, embs, ids, attns = [], [], [], [], []
        for batch in val_loader:
            jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "ids"}
            out_b = eval_step(state.params, jb)
            keep = np.asarray(batch["valid"]) > 0
            probs.append(np.asarray(out_b["probs"])[keep])
            ys.append(np.asarray(batch["labels"])[keep])
            embs.append(np.asarray(out_b["joint_emb"])[keep])
            attns.append(np.asarray(out_b["patch_attention"])[keep])
            ids.extend([i for i, k in zip(batch["ids"], keep) if k])
        probs_a, ys_a, embs_a, attn_a = map(
            np.concatenate, (probs, ys, embs, attns)
        )
        th = find_best_thresholds(ys_a, probs_a)
        names = list(class_names or [f"c{i}" for i in range(ys_a.shape[1])])
        rep = per_class_report(ys_a, probs_a, th, names)
        composite = composite_score(rep)
        writer.log(
            {"val/macro_f1": rep["macro_f1"], "val/macro_auroc": rep["macro_auroc"],
             "val/micro_f1": rep["micro_f1"], "val/composite": composite},
            step=epoch,
        )
        if composite > best["composite"]:
            best = {"composite": composite, "epoch": epoch,
                    "macro_f1": rep["macro_f1"], "macro_auroc": rep["macro_auroc"]}
            best_state = state
            bad = 0
            np.save(out / "val_embeddings.npy", embs_a)
            np.save(out / "val_attention.npy", attn_a)  # train.py:730-734
            (out / "val_ids.json").write_text(json.dumps(ids))
            np.save(out / "thresholds.npy", th)
            (out / "val_per_class.json").write_text(
                json.dumps(rep["per_class"], indent=1, default=float)
            )
            mgr.update_best(
                composite, {"model": best_state.params["model"]}, best
            )
        else:
            bad += 1
        # full train state every epoch -> killed runs resume mid-training
        mgr.save(epoch, {"params": state.params, "opt_state": state.opt_state,
                         "base_rng": state.base_rng,
                         "step": np.asarray(step, np.int64),
                         "epoch": np.asarray(epoch, np.int64),
                         "bad": np.asarray(bad, np.int64)})
        if bad >= cfg.patience:
            break

    (out / "best_multimodal_metrics.json").write_text(json.dumps(best, indent=1))
    return JointTrainResult(
        state=best_state,
        thresholds=np.load(out / "thresholds.npy"),
        best_metrics=best,
        val_embeddings=np.load(out / "val_embeddings.npy"),
        val_ids=json.loads((out / "val_ids.json").read_text()),
    )


def dump_embeddings(
    model: MultiModalRetrievalModel,
    params,
    loader,
    out_prefix: str,
) -> None:
    """Gallery embedding dump (reference contruct_test_db.py:46-148,
    dumpEmbedding.py:8-42): <prefix>_embeddings.npy + <prefix>_ids.json."""
    eval_step = make_eval_step(model)
    embs, ids = [], []
    for batch in loader:
        jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "ids"}
        out_b = eval_step(params, jb)
        keep = np.asarray(batch["valid"]) > 0
        embs.append(np.asarray(out_b["joint_emb"])[keep])
        ids.extend([i for i, k in zip(batch["ids"], keep) if k])
    np.save(out_prefix + "_embeddings.npy", np.concatenate(embs))
    Path(out_prefix + "_ids.json").write_text(json.dumps(ids))
