"""Loss functions for the joint multi-modal trainer.

Parity targets:
- focal loss + hybrid BCE/focal mix (reference: src/Trainner/train.py:108-122,
  486-496) with per-class pos_weight clamped at config.pos_weight_clamp_max
  (train.py:463-468);
- symmetric InfoNCE contrastive loss (reference: src/Helpers/helper.py:677-686);
- KG alignment loss: joint embedding -> linear projection into KG space,
  cosine (or MSE) against per-sample target KG vectors (reference:
  src/Helpers/helper.py:566-612). The reference does per-sample Python dict
  lookups inside the loss; here targets are a dense (B, Dk) array gathered
  host-side by the pipeline, so the loss is one fused matmul + reduction;
- asymmetric loss (ASL) used by the Swin finetuner
  (src/Trainner/finetune_swin.py:43-158).

Everything takes an optional ``valid`` (B,) mask so padded batch rows drop
out of the means (fixed-shape batches, see data/dataset.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, valid: Optional[jnp.ndarray], axis=None) -> jnp.ndarray:
    if valid is None:
        return jnp.mean(x, axis=axis)
    while valid.ndim < x.ndim:
        valid = valid[..., None]
    total = jnp.sum(x * valid, axis=axis)
    count = jnp.sum(jnp.broadcast_to(valid, x.shape), axis=axis)
    return total / jnp.maximum(count, 1.0)


def bce_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pos_weight: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Numerically-stable weighted binary cross entropy with logits."""
    log_p = -jax.nn.softplus(-logits)
    log_not_p = -jax.nn.softplus(logits)
    w_pos = pos_weight if pos_weight is not None else 1.0
    loss = -(w_pos * targets * log_p + (1.0 - targets) * log_not_p)
    return _masked_mean(loss, valid)


def focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 1.0,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Multi-label focal loss (train.py:108-122): BCE scaled by (1-p_t)^gamma."""
    p = jax.nn.sigmoid(logits)
    ce = targets * jax.nn.softplus(-logits) + (1 - targets) * jax.nn.softplus(logits)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    return _masked_mean(loss, valid)


def hybrid_bce_focal(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    focal_ratio: float = 0.3,
    gamma: float = 1.0,
    pos_weight: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(1-r)*BCE + r*focal — the reference's default classification loss
    (train.py:486-496)."""
    return (1.0 - focal_ratio) * bce_with_logits(
        logits, targets, pos_weight, valid
    ) + focal_ratio * focal_loss(logits, targets, gamma, valid)


def asymmetric_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma_pos: float = 0.0,
    gamma_neg: float = 4.0,
    clip: float = 0.05,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """ASL (finetune_swin.py:43-158): shifted negative probabilities +
    asymmetric focusing."""
    p = jax.nn.sigmoid(logits)
    p_neg = jnp.clip(p - clip, 0.0, 1.0) if clip and clip > 0 else p
    loss_pos = targets * jnp.log(jnp.clip(p, 1e-8)) * (1 - p) ** gamma_pos
    loss_neg = (1 - targets) * jnp.log(jnp.clip(1 - p_neg, 1e-8)) * p_neg**gamma_neg
    return _masked_mean(-(loss_pos + loss_neg), valid)


def info_nce(
    a: jnp.ndarray,  # (B, D)
    b: jnp.ndarray,  # (B, D)
    temperature: float = 0.125,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Symmetric InfoNCE over in-batch negatives (helper.py:677-686).

    Padded rows (valid==0) are excluded both as anchors and as negatives.
    """
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-8)
    sim = a @ b.T / temperature  # (B, B)
    if valid is not None:
        col_mask = jnp.where(valid > 0, 0.0, -1e9)
    else:
        col_mask = jnp.zeros(a.shape[0], dtype=sim.dtype)
    labels = jnp.arange(a.shape[0])
    # mask padded candidates in BOTH directions
    ce_ab = -jax.nn.log_softmax(sim + col_mask[None, :], axis=1)[labels, labels]
    ce_ba = -jax.nn.log_softmax(sim.T + col_mask[None, :], axis=1)[labels, labels]
    per_row = 0.5 * (ce_ab + ce_ba)
    return _masked_mean(per_row, valid)


def kg_alignment_loss(
    joint_emb: jnp.ndarray,  # (B, D)
    kg_proj_w: jnp.ndarray,  # (D, Dk) learned projection (KGTrainer.proj_to_kg)
    kg_targets: jnp.ndarray,  # (B, Dk) per-sample KG vectors (report/label nodes)
    target_valid: jnp.ndarray,  # (B,) 1 where a KG target exists
    method: str = "cosine",
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Align joint embeddings to their KG node vectors (helper.py:566-612)."""
    proj = joint_emb @ kg_proj_w  # (B, Dk)
    both_valid = target_valid if valid is None else target_valid * valid
    if method == "mse":
        per = jnp.mean((proj - kg_targets) ** 2, axis=-1)
    else:
        p = proj / jnp.maximum(jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-8)
        t = kg_targets / jnp.maximum(
            jnp.linalg.norm(kg_targets, axis=-1, keepdims=True), 1e-8
        )
        per = 1.0 - jnp.sum(p * t, axis=-1)
    return _masked_mean(per, both_valid)
