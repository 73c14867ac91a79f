"""LabelAttention: attention pooling of label embeddings -> report vector.

Parity with the reference module + trainer (reference:
src/KnowledgeGraph/label_attention.py:5-27, src/Trainner/
train_label_attention.py:133-514): an MLP scores each label embedding,
softmax over the (masked) label set, weighted sum produces the pooled
report embedding. Training uses pseudo positive/negative pairs by label
overlap with InfoNCE (learnable temperature) + triplet + pairwise-BCE
losses, pad-and-mask batching, and recall@K/mAP retrieval eval.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


class LabelAttention(nn.Module):
    """scores = MLP(label_embs) -> masked softmax -> weighted sum."""

    hidden_dim: int = 256

    @nn.compact
    def __call__(self, label_embs: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        # label_embs: (B, L, D); mask: (B, L) 1 = real label
        h = nn.Dense(self.hidden_dim)(label_embs)
        h = nn.tanh(h)
        scores = nn.Dense(1)(h)[..., 0]  # (B, L)
        if mask is not None:
            scores = jnp.where(mask > 0, scores, -1e9)
        w = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bl,bld->bd", w, label_embs), w


@dataclass
class LabelAttentionTrainerConfig:
    hidden_dim: int = 256
    batch_size: int = 128
    epochs: int = 30
    lr: float = 5e-4
    patience: int = 5
    ice_weight: float = 1.0   # InfoNCE
    tpl_weight: float = 0.5   # triplet
    bce_weight: float = 0.1   # pairwise BCE
    margin: float = 0.2
    pos_jaccard: float = 0.5  # pairs with overlap >= this are positives
    seed: int = 2709
    max_labels: int = 16      # pad-and-mask length


def _pad_label_embs(
    label_sets: Sequence[Sequence[int]],
    label_table: np.ndarray,
    max_labels: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-sample label index sets -> (B, Lmax, D) embeddings + (B, Lmax) mask."""
    B, D = len(label_sets), label_table.shape[1]
    embs = np.zeros((B, max_labels, D), np.float32)
    mask = np.zeros((B, max_labels), np.float32)
    for i, idxs in enumerate(label_sets):
        idxs = list(idxs)[:max_labels]
        if idxs:
            embs[i, : len(idxs)] = label_table[idxs]
            mask[i, : len(idxs)] = 1.0
    return embs, mask


def jaccard_matrix(labels: np.ndarray) -> np.ndarray:
    """(N, C) binary -> (N, N) pairwise Jaccard.

    One (N, C) @ (C, N) matmul — the broadcast form would materialize an
    (N, N, C) tensor, gigabytes at train-split scale (N~6k, C=43)."""
    lf = labels.astype(bool).astype(np.float32)
    inter = lf @ lf.T
    counts = lf.sum(axis=1)
    union = counts[:, None] + counts[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


class LabelAttentionTrainer:
    def __init__(self, label_table: np.ndarray, cfg: Optional[LabelAttentionTrainerConfig] = None):
        self.cfg = cfg or LabelAttentionTrainerConfig()
        self.label_table = np.asarray(label_table, np.float32)
        self.model = LabelAttention(self.cfg.hidden_dim)
        self.params = None
        self.log_temp = None

    def init(self, rng: jax.Array) -> None:
        D = self.label_table.shape[1]
        dummy = jnp.zeros((1, self.cfg.max_labels, D))
        self.params = self.model.init(rng, dummy, jnp.ones((1, self.cfg.max_labels)))
        self.log_temp = jnp.asarray(np.log(0.07), jnp.float32)

    def pool(self, label_sets: Sequence[Sequence[int]]) -> np.ndarray:
        embs, mask = _pad_label_embs(label_sets, self.label_table, self.cfg.max_labels)
        out, _ = self.model.apply(self.params, jnp.asarray(embs), jnp.asarray(mask))
        return np.asarray(out)

    def _make_step(self):
        cfg = self.cfg
        model = self.model

        def loss_fn(variables, embs, mask, pos_pair, rng):
            params, log_temp = variables
            emb, _ = model.apply(params, embs, mask)  # (B, D)
            emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
            sim = emb @ emb.T  # (B, B)
            temp = jnp.exp(log_temp)
            B = emb.shape[0]
            eye = jnp.eye(B, dtype=bool)

            # InfoNCE over pseudo-positive pairs (multi-positive form)
            logits = sim / temp + jnp.where(eye, -1e9, 0.0)
            pos_mask = pos_pair & ~eye
            log_p = jax.nn.log_softmax(logits, axis=1)
            has_pos = pos_mask.any(axis=1)
            ice = -jnp.where(
                has_pos,
                (log_p * pos_mask).sum(1) / jnp.maximum(pos_mask.sum(1), 1),
                0.0,
            )
            ice = ice.sum() / jnp.maximum(has_pos.sum(), 1)

            # triplet: hardest positive vs hardest negative
            pos_sim = jnp.where(pos_mask, sim, jnp.inf).min(axis=1)
            neg_sim = jnp.where(~pos_mask & ~eye, sim, -jnp.inf).max(axis=1)
            tpl = jnp.where(
                has_pos & jnp.isfinite(pos_sim) & jnp.isfinite(neg_sim),
                jnp.maximum(0.0, cfg.margin + neg_sim - pos_sim),
                0.0,
            )
            tpl = tpl.sum() / jnp.maximum(has_pos.sum(), 1)

            # pairwise BCE on similarities vs pair labels
            pair_logit = sim / temp
            target = pos_pair.astype(jnp.float32)
            bce = optax.sigmoid_binary_cross_entropy(pair_logit, target)
            bce = jnp.where(eye, 0.0, bce).mean()

            loss = cfg.ice_weight * ice + cfg.tpl_weight * tpl + cfg.bce_weight * bce
            return loss, {"ice": ice, "tpl": tpl, "bce": bce}

        tx = optax.adam(cfg.lr)

        @jax.jit
        def step(variables, opt_state, embs, mask, pos_pair, rng):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                variables, embs, mask, pos_pair, rng
            )
            updates, opt_state = tx.update(grads, opt_state)
            variables = optax.apply_updates(variables, updates)
            aux["loss"] = loss
            return variables, opt_state, aux

        return tx, step

    def train(
        self,
        label_sets: Sequence[Sequence[int]],
        label_vectors: np.ndarray,  # (N, C) binary, for pair construction
        metric_writer=None,
    ) -> Dict[str, float]:
        cfg = self.cfg
        if self.params is None:
            self.init(jax.random.PRNGKey(cfg.seed))
        tx, step = self._make_step()
        variables = (self.params, self.log_temp)
        opt_state = tx.init(variables)
        rng = np.random.default_rng(cfg.seed)
        jrng = jax.random.PRNGKey(cfg.seed)
        N = len(label_sets)
        B = min(cfg.batch_size, N)
        jac = jaccard_matrix(label_vectors)
        best = {"loss": float("inf")}
        bad = 0
        for epoch in range(cfg.epochs):
            order = rng.permutation(N)
            ep_loss = []
            for s in range(0, N - B + 1, B):
                idx = order[s : s + B]
                embs, mask = _pad_label_embs(
                    [label_sets[i] for i in idx], self.label_table, cfg.max_labels
                )
                pos = jac[np.ix_(idx, idx)] >= cfg.pos_jaccard
                jrng, sub = jax.random.split(jrng)
                variables, opt_state, aux = step(
                    variables, opt_state, jnp.asarray(embs), jnp.asarray(mask),
                    jnp.asarray(pos), sub,
                )
                ep_loss.append(float(aux["loss"]))
            mean_loss = float(np.mean(ep_loss)) if ep_loss else 0.0
            if metric_writer is not None:
                metric_writer.log({"la/loss": mean_loss}, step=epoch)
            if mean_loss < best["loss"] - 1e-5:
                best = {"loss": mean_loss, "epoch": epoch}
                self.params, self.log_temp = variables
                bad = 0
            else:
                bad += 1
                if bad >= cfg.patience:
                    break
        return best

    # -- retrieval eval (train_label_attention.py:94-131) -----------------------

    def eval_retrieval(
        self,
        label_sets: Sequence[Sequence[int]],
        label_vectors: np.ndarray,
        ks: Tuple[int, ...] = (5, 10),
    ) -> Dict[str, float]:
        emb = self.pool(label_sets)
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-8)
        sim = emb @ emb.T
        np.fill_diagonal(sim, -np.inf)
        jac = jaccard_matrix(label_vectors)
        np.fill_diagonal(jac, 0.0)
        rel = jac >= self.cfg.pos_jaccard
        out = {}
        order = np.argsort(-sim, axis=1)
        for k in ks:
            topk = order[:, :k]
            hits = rel[np.arange(len(emb))[:, None], topk]
            n_rel = rel.sum(1)
            recall = np.where(n_rel > 0, hits.sum(1) / np.maximum(n_rel, 1), 0.0)
            out[f"recall@{k}"] = float(recall[n_rel > 0].mean()) if (n_rel > 0).any() else 0.0
        return out

    # -- persistence (ckpt bundles arch config, reranker.py:64-83) ---------------

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            hidden_dim=self.cfg.hidden_dim,
            log_temp=np.asarray(self.log_temp),
            **{
                f"param::{'/'.join(str(getattr(kp, 'key', getattr(kp, 'idx', kp))) for kp in kpath)}": np.asarray(leaf)
                for kpath, leaf in jax.tree_util.tree_flatten_with_path(self.params)[0]
            },
        )

    @classmethod
    def from_checkpoint(cls, path: str, label_table: np.ndarray) -> "LabelAttentionTrainer":
        z = np.load(path)
        cfg = LabelAttentionTrainerConfig(hidden_dim=int(z["hidden_dim"]))
        t = cls(label_table, cfg)
        t.init(jax.random.PRNGKey(0))
        flat = jax.tree_util.tree_flatten_with_path(t.params)
        rebuilt = []
        for kpath, leaf in flat[0]:
            key = f"param::{'/'.join(str(getattr(kp, 'key', getattr(kp, 'idx', kp))) for kp in kpath)}"
            rebuilt.append(jnp.asarray(z[key]))
        t.params = jax.tree_util.tree_unflatten(flat[1], rebuilt)
        t.log_temp = jnp.asarray(z["log_temp"])
        return t
