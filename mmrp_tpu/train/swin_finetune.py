"""Swin finetuning task: label-aware classifier with the reference's
training refinements.

Parity targets (reference: src/Trainner/finetune_swin.py:457-1121):
- loss choices: hybrid / focal / BCE / ASL with quick auto-search over ASL
  settings (:43-158, 388-429, 673-699);
- LR range finder: short exponential LR sweep, pick the steepest-descent
  region (:343-386, 704-723);
- discriminative learning rates: head at full LR, backbone scaled by
  ``backbone_lr_scale`` (x0.005, :726-730) via optax.multi_transform;
- progressive unfreezing at configured epochs (:769-774) — implemented as
  optax masks (frozen params get zero updates), so the SAME jitted step
  serves every phase: the mask is an input, not a recompile;
- dynamic pos_weight ramp (:776-787) and label smoothing (:194-196);
- post-training temperature calibration (:834-858) — scalar T minimizing
  val NLL by gradient descent (the reference uses LBFGS; same objective);
- per-class threshold calibration persisted (:869-879, 1019-1048);
- single-batch overfit debug check (:570-660) lives in tests.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mmrp_tpu.eval.metrics import (
    composite_score,
    find_best_thresholds,
    per_class_report,
)
from mmrp_tpu.models.finetune_head import SwinForFinetune
from mmrp_tpu.train import losses as L


@dataclass
class SwinFinetuneConfig:
    lr: float = 1e-4
    backbone_lr_scale: float = 0.005
    epochs: int = 12
    unfreeze_epochs: Tuple[int, ...] = (1, 5, 10)  # stage-wise unfreeze points
    loss: str = "hybrid"  # hybrid | focal | bce | asl
    focal_ratio: float = 0.3
    gamma_focal: float = 1.0
    asl_gamma_neg: float = 4.0
    asl_clip: float = 0.05
    label_smoothing: float = 0.05
    pos_weight_clamp: float = 5.0
    pos_weight_ramp_epochs: int = 5
    patience: int = 4
    seed: int = 2709


def smooth_labels(y: jnp.ndarray, eps: float) -> jnp.ndarray:
    return y * (1.0 - eps) + 0.5 * eps


def classification_loss(cfg: SwinFinetuneConfig, logits, targets, pos_weight, valid):
    t = smooth_labels(targets, cfg.label_smoothing)
    if cfg.loss == "hybrid":
        return L.hybrid_bce_focal(logits, t, cfg.focal_ratio, cfg.gamma_focal,
                                  pos_weight, valid)
    if cfg.loss == "focal":
        return L.focal_loss(logits, t, cfg.gamma_focal, valid)
    if cfg.loss == "asl":
        return L.asymmetric_loss(logits, t, gamma_neg=cfg.asl_gamma_neg,
                                 clip=cfg.asl_clip, valid=valid)
    return L.bce_with_logits(logits, t, pos_weight, valid)


# ---------------------------------------------------------------------------
# Optimizer: discriminative LRs + maskable freezing
# ---------------------------------------------------------------------------


def _is_backbone(path: Tuple) -> bool:
    return any(getattr(p, "key", None) == "swin" for p in path)


def make_finetune_optimizer(cfg: SwinFinetuneConfig, params) -> optax.GradientTransformation:
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "backbone" if _is_backbone(path) else "head", params
    )
    return optax.multi_transform(
        {
            "head": optax.adamw(cfg.lr),
            "backbone": optax.adamw(cfg.lr * cfg.backbone_lr_scale),
        },
        labels,
    )


def freeze_mask_for_epoch(cfg: SwinFinetuneConfig, params, epoch: int):
    """1.0/0.0 multiplier per param: backbone stages unfreeze progressively
    (epoch >= unfreeze_epochs[i] unlocks deeper stage i... shallowest last,
    mirroring the reference's 3-phase schedule, finetune_swin.py:769-774)."""
    n_phases = len(cfg.unfreeze_epochs)
    unlocked = sum(1 for e in cfg.unfreeze_epochs if epoch >= e)

    # number of Swin stages actually present in this model
    stage_ids = set()
    for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]:
        for p in path:
            k = getattr(p, "key", "")
            if isinstance(k, str) and k.startswith("stage"):
                stage_ids.add(int(k[5]))
    total_stages = max(stage_ids) + 1 if stage_ids else 1

    def mask(path, leaf):
        if not _is_backbone(path):
            return jnp.ones((), jnp.float32)
        # stage index from the param path (stage{N}_... module names)
        stage = None
        for p in path:
            k = getattr(p, "key", "")
            if isinstance(k, str) and k.startswith("stage"):
                stage = int(k[5])
                break
            if isinstance(k, str) and k.startswith("merge"):
                stage = int(k[5])
                break
        if stage is None:  # patch embed / final norm follow the last phase
            return jnp.asarray(1.0 if unlocked >= n_phases else 0.0, jnp.float32)
        # deepest stages unlock first
        depth_rank = total_stages - 1 - stage  # 0 = deepest
        phase_needed = min(depth_rank + 1, n_phases)
        return jnp.asarray(1.0 if unlocked >= phase_needed else 0.0, jnp.float32)

    return jax.tree_util.tree_map_with_path(mask, params)


def pos_weight_ramp(base_pw: np.ndarray, epoch: int, ramp_epochs: int,
                    clamp: float) -> np.ndarray:
    """Linear ramp from all-ones to the clamped inverse-frequency weights
    (finetune_swin.py:776-787)."""
    frac = min(1.0, (epoch + 1) / max(ramp_epochs, 1))
    pw = 1.0 + frac * (np.minimum(base_pw, clamp) - 1.0)
    return pw.astype(np.float32)


# ---------------------------------------------------------------------------
# Balanced finetune subset (finetune_swin.py:253-311)
# ---------------------------------------------------------------------------


def build_finetune_subset(
    records,
    max_per_label: int = 200,
    min_per_label: int = 5,
    max_retries: int = 3,
    seed: int = 2709,
):
    """Balanced subset: cap each label's positives at ``max_per_label``;
    retry with a relaxed cap when rare labels end up under-represented
    (the reference's rebalance-retry loop)."""
    rng = np.random.default_rng(seed)
    labels = np.stack([np.asarray(r["labels"]) for r in records]).astype(bool)
    n, C = labels.shape
    for attempt in range(max_retries):
        cap = max_per_label * (attempt + 1)
        chosen = np.zeros(n, dtype=bool)
        per_label = labels.sum(axis=0)
        order = np.argsort(per_label)  # rarest labels pick first
        for c in order:
            # seed from positives already pulled in by rarer labels, then
            # admit only unchosen holders up to the cap (one O(n) count
            # per label instead of a full recount per candidate)
            have = int(labels[chosen, c].sum())
            if have >= cap:
                continue
            holders = np.where(labels[:, c] & ~chosen)[0]
            rng.shuffle(holders)
            chosen[holders[: cap - have]] = True
        sub_counts = labels[chosen].sum(axis=0)
        rare_ok = all(
            sub_counts[c] >= min(min_per_label, per_label[c]) for c in range(C)
        )
        if rare_ok:
            break
    return [records[i] for i in np.where(chosen)[0]]


# ---------------------------------------------------------------------------
# LR range finder (finetune_swin.py:343-386)
# ---------------------------------------------------------------------------


def lr_range_test(
    loss_at_lr: Callable[[float], float],
    lr_min: float = 1e-6,
    lr_max: float = 1.0,
    steps: int = 30,
) -> float:
    """Exponential sweep; returns the LR one decade below the loss blow-up
    point (standard LR-finder heuristic)."""
    lrs = np.logspace(np.log10(lr_min), np.log10(lr_max), steps)
    losses = np.array([loss_at_lr(float(lr)) for lr in lrs])
    finite = np.isfinite(losses)
    if not finite.any():
        return 1e-4
    # first index where loss goes non-finite OR exceeds 4x the running
    # minimum -> diverged (NaN > x is False, so NaN tails need their own
    # test or the blow point is missed entirely)
    run_min = np.minimum.accumulate(np.where(finite, losses, np.inf))
    bad = ~finite | (losses > 4 * run_min)
    blow = int(np.argmax(bad)) if bad.any() else len(lrs) - 1
    head = losses[: max(blow, 1)]
    if not np.isfinite(head).any():  # diverged from the very first LR
        return 1e-4
    best = np.nanargmin(head)
    return float(lrs[best] / 10.0) if blow > 0 else float(lrs[best])


# ---------------------------------------------------------------------------
# ASL auto-search (finetune_swin.py:388-429, 673-699)
# ---------------------------------------------------------------------------


def auto_select_asl(
    model,
    cfg: SwinFinetuneConfig,
    train_batches,
    val_batches,
    base_pos_weight,
    sample_image,
    candidates=((2.0, 0.0), (4.0, 0.05), (6.0, 0.1)),
    quick_epochs: int = 2,
) -> Tuple[float, float, Dict]:
    """Short-horizon training per (gamma_neg, clip) candidate; returns the
    settings with the best composite metric (the reference's quick_eval)."""
    import dataclasses

    best = (None, None, {"composite": -1.0})
    for gamma_neg, clip in candidates:
        trial_cfg = dataclasses.replace(
            cfg, loss="asl", asl_gamma_neg=gamma_neg, asl_clip=clip,
            epochs=quick_epochs, patience=quick_epochs + 1,
        )
        res = finetune(model, trial_cfg, train_batches, val_batches,
                       base_pos_weight, sample_image)
        comp = composite_score(res["report"])
        if comp > best[2]["composite"]:
            best = (gamma_neg, clip, {"composite": comp})
    return best


# ---------------------------------------------------------------------------
# Temperature calibration (finetune_swin.py:834-858)
# ---------------------------------------------------------------------------


def calibrate_temperature(
    logits: np.ndarray, labels: np.ndarray, steps: int = 200, lr: float = 0.05
) -> float:
    """Scalar T minimizing BCE(logits / T, labels) on the validation set."""
    logits_j = jnp.asarray(logits)
    labels_j = jnp.asarray(labels)

    def nll(log_t):
        return L.bce_with_logits(logits_j / jnp.exp(log_t), labels_j)

    log_t = jnp.zeros(())
    g = jax.jit(jax.grad(nll))
    for _ in range(steps):
        log_t = log_t - lr * g(log_t)
    return float(jnp.exp(log_t))


# ---------------------------------------------------------------------------
# Train step + loop
# ---------------------------------------------------------------------------


def make_finetune_step(model: SwinForFinetune, cfg: SwinFinetuneConfig, tx):
    def train_step(params, opt_state, batch, pos_weight, freeze, rng):
        def loss_fn(p):
            out = model.apply(
                {"params": p}, batch["image"], deterministic=False,
                rngs={"dropout": rng},
            )
            return classification_loss(
                cfg, out["logits"], batch["labels"], pos_weight, batch.get("valid")
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, freeze)
        updates, opt_state = tx.update(grads, opt_state, params)
        # mask the UPDATES too: adamw's weight-decay term is
        # gradient-independent, so zeroed grads alone would still shrink
        # "frozen" params by lr*wd each step — the module contract is
        # zero updates for frozen params
        updates = jax.tree_util.tree_map(lambda u, m: u * m, updates, freeze)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(train_step)


def finetune(
    model: SwinForFinetune,
    cfg: SwinFinetuneConfig,
    train_batches: Callable[[], Iterable[Dict[str, np.ndarray]]],
    val_batches: Callable[[], Iterable[Dict[str, np.ndarray]]],
    base_pos_weight: np.ndarray,
    sample_image: np.ndarray,
    metric_writer=None,
    class_names=None,
    init_backbone=None,
) -> Dict:
    """Full finetune loop -> dict(params, thresholds, temperature, report).

    ``init_backbone``: optional pretrained Swin param subtree (models/port.py
    converters) replacing the random-init backbone before training — the
    reference always finetunes FROM pretrained weights
    (finetune_swin.py:585-590)."""
    rng = jax.random.PRNGKey(cfg.seed)
    params = model.init(rng, jnp.asarray(sample_image))["params"]
    if init_backbone is not None:
        def _inject(path, t, s):
            # fail fast on width mismatch (e.g. a Swin-S checkpoint into
            # a Swin-B config passes a depths-only guard but dies with an
            # opaque matmul error mid-train if installed unchecked)
            if tuple(t.shape) != tuple(np.shape(s)):
                raise ValueError(
                    f"pretrained backbone leaf {jax.tree_util.keystr(path)}"
                    f" shape {tuple(np.shape(s))} != model {tuple(t.shape)}"
                )
            return jnp.asarray(s, t.dtype)

        params = dict(params)
        params["swin"] = jax.tree_util.tree_map_with_path(
            _inject, params["swin"], init_backbone
        )
    tx = make_finetune_optimizer(cfg, params)
    opt_state = tx.init(params)
    step_fn = make_finetune_step(model, cfg, tx)
    eval_fn = jax.jit(
        lambda p, img: model.apply({"params": p}, img)["logits"]
    )

    best = {"composite": -1.0}
    best_params = params
    bad = 0
    for epoch in range(cfg.epochs):
        freeze = freeze_mask_for_epoch(cfg, params, epoch)
        pw = jnp.asarray(pos_weight_ramp(base_pos_weight, epoch,
                                         cfg.pos_weight_ramp_epochs,
                                         cfg.pos_weight_clamp))
        losses = []
        for batch in train_batches():
            rng, sub = jax.random.split(rng)
            jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "ids"}
            params, opt_state, loss = step_fn(params, opt_state, jb, pw, freeze, sub)
            losses.append(float(loss))

        # validation: jitted logits -> thresholds -> composite metric
        logits_ep, ys = [], []
        for batch in val_batches():
            lg = np.asarray(eval_fn(params, jnp.asarray(batch["image"])))
            v = batch.get("valid")
            keep = slice(None) if v is None else np.asarray(v) > 0
            logits_ep.append(lg[keep])
            ys.append(np.asarray(batch["labels"])[keep])
        logits_ep = np.concatenate(logits_ep)
        ys = np.concatenate(ys)
        probs = 1.0 / (1.0 + np.exp(-logits_ep))
        th = find_best_thresholds(ys, probs)
        names = class_names or [f"c{i}" for i in range(ys.shape[1])]
        rep = per_class_report(ys, probs, th, names)
        composite = composite_score(rep)
        if metric_writer is not None:
            metric_writer.log(
                {"swin/loss": np.mean(losses), "swin/macro_f1": rep["macro_f1"],
                 "swin/macro_auroc": rep["macro_auroc"], "swin/composite": composite},
                step=epoch,
            )
        if composite > best["composite"]:
            best = {"composite": composite, "epoch": epoch, "report": rep,
                    "thresholds": th}
            best_params = params
            best_logits, best_ys = logits_ep, ys  # reused for calibration
            bad = 0
        else:
            bad += 1
            if bad >= cfg.patience:
                break

    # temperature calibration on the best epoch's cached val logits
    # (probs above are just sigmoid(logits), so re-inferring the whole
    # val set with best_params would be a pure waste of a second pass)
    temperature = calibrate_temperature(best_logits, best_ys)

    return {
        "params": best_params,
        "thresholds": best["thresholds"],
        "temperature": temperature,
        "report": best["report"],
        "best_epoch": best["epoch"],
    }
