"""KG embedding trainer: self-adversarial negative sampling on TPU.

Behavior parity with the reference KGTrainer (reference:
src/KnowledgeGraph/KG_Trainer.py:136-1358):

- triple loading with source reliability scaling (curated x3, extracted
  x0.7, ontology x1) and frequency downweighting 1/log1p(freq)
  (KG_Trainer.py:216-230);
- seeded 90/10 train/val split (:235-238);
- image-feature injection into the entity table with projection on dim
  mismatch + global L2 renorm (:311-431);
- self-adversarial negative sampling: per positive, ``neg_size`` random
  entity corruptions (heads or tails), softmax(neg_score / adv_temp)
  weights treated as constants, logsigmoid loss scaled by confidence
  (:578-622);
- per-epoch L2 renormalization of entity embeddings (:705-715);
- early stopping on validation MRR (:758-768);
- filtered-ranking MRR / Hits@{1,5,10} over heads+tails (:1088-1219);
- checkpoint save/load with meta, pad/truncate on shape mismatch
  (:1221-1358).

TPU-first differences: the train step is ONE jitted program (sampling via
jax.random inside the step, no host negatives); candidate scoring against
all entities is a static-shape batched computation (kg/models.py) instead
of the reference's CUDA-OOM-probing autotuner (:814-957) — shapes are
planned at trace time, as XLA requires.
"""

from __future__ import annotations

import functools
import json
import math
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mmrp_tpu.kg.models import (
    KGModelConfig,
    final_entity_table,
    init_params,
    make_score_all_fn,
)

SOURCE_FACTORS = {"curated": 3.0, "extracted": 0.7}


def scale_confidences(
    triples: Sequence[Tuple[int, int, int]],
    confidences: Sequence[float],
    sources: Sequence[str],
    curated_factor: float = 3.0,
) -> np.ndarray:
    """Reference confidence scaling (KG_Trainer.py:216-230)."""
    counts: Dict[Tuple[int, int, int], int] = {}
    for t in triples:
        counts[t] = counts.get(t, 0) + 1
    out = np.empty(len(triples), dtype=np.float32)
    for i, (t, c, s) in enumerate(zip(triples, confidences, sources)):
        f = curated_factor if s == "curated" else SOURCE_FACTORS.get(s, 1.0)
        out[i] = c * f / math.log1p(counts[t])
    return out


@dataclass
class KGTrainerConfig:
    model: str = "TransE"
    emb_dim: int = 300
    epochs: int = 30
    batch_size: int = 1024
    lr: float = 1e-3
    neg_size: int = 32
    adv_temp: float = 0.1
    patience: int = 5
    seed: int = 2709
    val_frac: float = 0.1
    # CompGCN
    num_layers: int = 2
    dropout: float = 0.3
    opn: str = "corr"
    eval_chunk: int = 256  # triples scored against all entities per device pass
    use_bf16: bool = False  # bf16 scoring (TPU analog of the reference's CUDA
    #                         AMP, KG_Trainer.py:484-488); params stay f32


class KGTrainer:
    def __init__(
        self,
        num_entities: int,
        num_relations: int,
        cfg: Optional[KGTrainerConfig] = None,
    ):
        self.cfg = cfg or KGTrainerConfig()
        self.num_entities = num_entities
        self.num_relations = num_relations
        self.model_cfg: Optional[KGModelConfig] = None
        self.params: Optional[Dict[str, jnp.ndarray]] = None
        self.train_arr: Optional[np.ndarray] = None
        self.val_arr: Optional[np.ndarray] = None
        self.train_conf: Optional[np.ndarray] = None
        self._known: Optional[Dict] = None

    # -- data ------------------------------------------------------------------

    def load_triples(
        self,
        triples: Sequence[Tuple[int, int, int]],
        confidences: Optional[Sequence[float]] = None,
        sources: Optional[Sequence[str]] = None,
    ) -> None:
        n = len(triples)
        confidences = list(confidences) if confidences is not None else [1.0] * n
        sources = list(sources) if sources is not None else ["extracted"] * n
        conf = scale_confidences([tuple(t) for t in triples], confidences, sources)

        rng = np.random.default_rng(self.cfg.seed)
        order = rng.permutation(n)
        arr = np.asarray(triples, dtype=np.int32)[order]
        conf = conf[order]
        split = int((1.0 - self.cfg.val_frac) * n)
        self.train_arr, self.val_arr = arr[:split], arr[split:]
        self.train_conf = conf[:split]

        cg_kwargs = {}
        if self.cfg.model == "CompGCN":
            cg_kwargs = dict(
                num_layers=self.cfg.num_layers,
                dropout=self.cfg.dropout,
                opn=self.cfg.opn,
                edge_src=self.train_arr[:, 0].copy(),
                edge_dst=self.train_arr[:, 2].copy(),
                edge_rel=self.train_arr[:, 1].copy(),
            )
        self.model_cfg = KGModelConfig(
            name=self.cfg.model,
            num_entities=self.num_entities,
            num_relations=self.num_relations,
            emb_dim=self.cfg.emb_dim,
            **cg_kwargs,
        )
        self.params = init_params(self.model_cfg, jax.random.PRNGKey(self.cfg.seed))

        # filtered-ranking index of ALL known triples, as a CSR keyed by
        # anchor*R + rel: one vectorized gather per eval chunk instead of a
        # per-row Python loop (O(n_triples * avg_degree) host work per eval)
        self._known = {
            "sr": self._build_filter_csr(arr[:, 0], arr[:, 1], arr[:, 2]),
            "or": self._build_filter_csr(arr[:, 2], arr[:, 1], arr[:, 0]),
        }

    def _build_filter_csr(
        self, anchors: np.ndarray, rels: np.ndarray, targets: np.ndarray
    ):
        """-> (unique_keys sorted, indptr, targets_sorted) with
        key = anchor * num_relations + rel."""
        keys = anchors.astype(np.int64) * self.num_relations + rels.astype(np.int64)
        order = np.argsort(keys, kind="stable")
        keys_sorted = keys[order]
        targets_sorted = targets.astype(np.int64)[order]
        unique_keys, counts = np.unique(keys_sorted, return_counts=True)
        indptr = np.concatenate([[0], np.cumsum(counts)])
        return unique_keys, indptr, targets_sorted

    @staticmethod
    def _filter_rows_cols(
        csr, anchors: np.ndarray, rels: np.ndarray, num_relations: int
    ):
        """Vectorized (row, col) pairs of known positives for a chunk."""
        unique_keys, indptr, targets_sorted = csr
        keys = anchors.astype(np.int64) * num_relations + rels.astype(np.int64)
        pos = np.searchsorted(unique_keys, keys)
        pos_c = np.minimum(pos, len(unique_keys) - 1)
        found = (len(unique_keys) > 0) & (unique_keys[pos_c] == keys)
        starts = indptr[pos_c]
        counts = np.where(found, indptr[pos_c + 1] - starts, 0)
        total = int(counts.sum())
        if total == 0:
            return (np.empty(0, np.int64),) * 2
        rows = np.repeat(np.arange(len(keys), dtype=np.int64), counts)
        # ragged range gather: offsets within each run, then absolute index
        run_ends = np.cumsum(counts)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            run_ends - counts, counts
        )
        cols = targets_sorted[np.repeat(starts, counts) + within]
        return rows, cols

    # -- image feature injection (KG_Trainer.py:311-431) -------------------------

    def inject_entity_features(
        self, features: Dict[int, np.ndarray], renorm: bool = True
    ) -> None:
        if not features:
            return
        ent = np.array(self.params["ent"])  # writable copy
        dim = ent.shape[1]
        feats = np.stack(list(features.values())).astype(np.float32)
        if feats.shape[1] != dim:
            rng = np.random.default_rng(self.cfg.seed)
            proj = rng.standard_normal((feats.shape[1], dim)).astype(np.float32)
            proj /= np.sqrt(feats.shape[1])
            feats = feats @ proj
        for row, idx in enumerate(features.keys()):
            ent[idx] = feats[row]
        self.params = dict(self.params)
        self.params["ent"] = jnp.asarray(ent)
        if renorm:
            # via _renorm_entities so RotatE's complex-pair modulus
            # structure is preserved here exactly as in the per-epoch
            # renorm (a raw L2 over concatenated re/im would corrupt it)
            self._renorm_entities()

    # -- training -----------------------------------------------------------------

    def _make_train_step(self):
        cfg = self.cfg
        from mmrp_tpu.kg.models import make_tables_fn, score_from_tables

        tables = make_tables_fn(self.model_cfg)
        model_cfg = self.model_cfg
        E = self.num_entities

        def loss_fn(params, batch, conf, rng):
            if cfg.use_bf16:
                params = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), params
                )
            s, r, o = batch[:, 0], batch[:, 1], batch[:, 2]
            B = s.shape[0]
            k_ent, k_side, k_drop = jax.random.split(rng, 3)
            neg_ent = jax.random.randint(k_ent, (B, cfg.neg_size), 0, E)
            corrupt_head = jax.random.bernoulli(k_side, 0.5, (B, 1))
            neg_s = jnp.where(corrupt_head, neg_ent, s[:, None])
            neg_o = jnp.where(corrupt_head, o[:, None], neg_ent)
            # ONE propagation per step (CompGCN): positives and negatives
            # score from the same tables (KG_Trainer.py:561), with dropout
            # active in training mode (compgcn_conv.py:48,78)
            ent_t, rel_t = tables(params, rng=k_drop, training=True)
            pos_score = score_from_tables(model_cfg, params, ent_t, rel_t, s, r, o)
            neg_score = score_from_tables(
                model_cfg, params, ent_t, rel_t,
                neg_s.reshape(-1),
                jnp.repeat(r, cfg.neg_size),
                neg_o.reshape(-1),
            ).reshape(B, cfg.neg_size)
            # self-adversarial weights are constants (KG_Trainer.py:578-614)
            w = jax.lax.stop_gradient(
                jax.nn.softmax(neg_score / cfg.adv_temp, axis=1)
            )
            pos_term = jax.nn.log_sigmoid(pos_score)
            neg_term = jnp.sum(w * jax.nn.log_sigmoid(-neg_score), axis=1)
            per = (-(pos_term + neg_term) * conf).astype(jnp.float32)
            metrics = {
                "pos_score": pos_score.mean(),
                "neg_score": neg_score.mean(),
            }
            return per.mean(), metrics

        tx = optax.adam(cfg.lr)

        # donation lets XLA update the (E, dim) tables and adam moments in
        # place — without it every step allocates a fresh params+opt tree
        # (3x table bytes peak). Callers must not hold references to the
        # passed-in buffers (train() copies best_params for this reason).
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, conf, rng):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, conf, rng
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics["loss"] = loss
            return params, opt_state, metrics

        return tx, train_step

    def _renorm_entities(self) -> None:
        """Per-epoch L2 renorm (KG_Trainer.py:705-715); skipped for RotatE
        (phases/complex pairs must keep their modulus structure)."""
        if self.cfg.model == "RotatE":
            return
        ent = self.params["ent"]
        norm = jnp.maximum(jnp.linalg.norm(ent, axis=1, keepdims=True), 1e-8)
        self.params = dict(self.params)
        self.params["ent"] = ent / norm

    def train(
        self,
        log_every: int = 0,
        metric_writer=None,
    ) -> Dict[str, float]:
        cfg = self.cfg
        tx, train_step = self._make_train_step()
        opt_state = tx.init(self.params)
        rng = jax.random.PRNGKey(cfg.seed)
        n = self.train_arr.shape[0]
        B = min(cfg.batch_size, n)
        # ceil: the final partial step wraps around (static shapes) so the
        # n mod B remainder triples train every epoch instead of dropping
        steps_per_epoch = -(-n // B)

        best = {"mrr": -1.0, "epoch": -1}
        # real copy, not an alias: the first train_step donates
        # self.params' buffers, which would leave an aliased best_params
        # pointing at deleted arrays if no epoch ever improves (e.g. NaN
        # val MRR after divergence)
        best_params = jax.tree_util.tree_map(jnp.copy, self.params)
        bad_epochs = 0
        np_rng = np.random.default_rng(cfg.seed)

        for epoch in range(cfg.epochs):
            order = np_rng.permutation(n)
            step_losses = []  # device scalars; ONE sync at epoch end
            for step in range(steps_per_epoch):
                idx = order[step * B : (step + 1) * B]
                if len(idx) < B:  # keep shapes static
                    idx = np.concatenate([idx, order[: B - len(idx)]])
                rng, sub = jax.random.split(rng)
                self.params, opt_state, metrics = train_step(
                    self.params,
                    opt_state,
                    jnp.asarray(self.train_arr[idx]),
                    jnp.asarray(self.train_conf[idx]),
                    sub,
                )
                step_losses.append(metrics["loss"])
            self._renorm_entities()
            epoch_loss = float(np.mean([float(x) for x in step_losses]))
            val = self.evaluate(self.val_arr)
            if metric_writer is not None:
                metric_writer.log(
                    {"kg/loss": epoch_loss, **{f"kg/{k}": v for k, v in val.items()}},
                    step=epoch,
                )
            if log_every and epoch % log_every == 0:
                print(f"[KGTrainer] epoch {epoch} loss={epoch_loss:.4f} val={val}")
            if val["mrr"] > best["mrr"]:
                best = {**val, "epoch": epoch}
                # real device copy, not an alias: train_step donates its
                # params input, which would invalidate aliased buffers here
                best_params = jax.tree_util.tree_map(jnp.copy, self.params)
                bad_epochs = 0
            else:
                bad_epochs += 1
                if bad_epochs >= cfg.patience:
                    break
        self.params = best_params
        return best

    # -- evaluation -----------------------------------------------------------------

    def evaluate(self, triples: np.ndarray, ks: Tuple[int, ...] = (1, 5, 10)) -> Dict[str, float]:
        """Filtered MRR / Hits@K, head+tail replacement (KG_Trainer.py:1088-1219)."""
        if triples is None or len(triples) == 0:
            return {"mrr": 0.0, **{f"hits@{k}": 0.0 for k in ks}}
        # jitted score-all programs are cached across evaluate() calls:
        # per-call jax.jit wrappers would retrace/recompile every epoch
        # (minutes per compile on the tunneled TPU, CLAUDE.md)
        if getattr(self, "_eval_score_fns", None) is None:
            self._eval_score_fns = {
                True: jax.jit(make_score_all_fn(self.model_cfg, tails=True)),
                False: jax.jit(make_score_all_fn(self.model_cfg, tails=False)),
            }
        chunk = self.cfg.eval_chunk
        ranks: List[float] = []
        for tails in (True, False):
            fn = self._eval_score_fns[tails]
            for start in range(0, len(triples), chunk):
                part = triples[start : start + chunk]
                s, r, o = part[:, 0], part[:, 1], part[:, 2]
                anchor = s if tails else o
                target = o if tails else s
                # pad the last partial chunk to the static shape (one
                # compiled program per direction, not per chunk size) and
                # slice the pad rows back off
                b_real = len(part)
                a_in, r_in = anchor, r
                if b_real < chunk:
                    pad = chunk - b_real
                    a_in = np.concatenate([anchor, np.repeat(anchor[-1:], pad)])
                    r_in = np.concatenate([r, np.repeat(r[-1:], pad)])
                scores = np.array(  # writable copy — masked in place below
                    fn(self.params, jnp.asarray(a_in), jnp.asarray(r_in))
                )[:b_real]  # (b, E)
                # vectorized filtered ranking: mask all known positives,
                # then rank = 1 + #entities scoring above the target
                b = len(part)
                tgt = target.astype(np.int64)
                tscores = scores[np.arange(b), tgt].copy()
                rows_idx, cols_idx = self._filter_rows_cols(
                    self._known["sr" if tails else "or"],
                    s if tails else o, r, self.num_relations,
                )
                if len(rows_idx):
                    scores[rows_idx, cols_idx] = -np.inf
                ranks.extend(
                    (1 + (scores > tscores[:, None]).sum(axis=1)).tolist()
                )
        ranks_arr = np.asarray(ranks, dtype=np.float64)
        out = {"mrr": float(np.mean(1.0 / ranks_arr))}
        for k in ks:
            out[f"hits@{k}"] = float(np.mean(ranks_arr <= k))
        return out

    # -- persistence ---------------------------------------------------------------

    def save(self, out_dir: str, node_names: Optional[Sequence[str]] = None) -> None:
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        ent = final_entity_table(self.model_cfg, self.params)
        np.save(out / "node_embeddings.npy", ent)
        np.save(out / "rel_embeddings.npy", np.asarray(self.params["rel"]))
        meta = {
            "model": self.cfg.model,
            "emb_dim": self.cfg.emb_dim,
            "num_entities": self.num_entities,
            "num_relations": self.num_relations,
            "entity_table_dim": int(ent.shape[1]),
            "higher_better": True,
        }
        (out / "embeddings_meta.json").write_text(json.dumps(meta, indent=1))
        if node_names is not None:
            (out / "node2id.json").write_text(
                json.dumps({n: i for i, n in enumerate(node_names)}, indent=1)
            )

    @staticmethod
    def ensure_label_embeddings(
        kg_dir: str,
        label_names: Sequence[str],
        out_path: Optional[str] = None,
    ) -> Dict[str, np.ndarray]:
        """label group -> embedding vector from the trained node table, with
        a zero-vector fallback for labels missing from the graph (reference
        kg_label_create.py:38-111; npz instead of .pt)."""
        kg = Path(kg_dir)
        emb = np.load(kg / "node_embeddings.npy")
        node2id = json.loads((kg / "node2id.json").read_text())
        out: Dict[str, np.ndarray] = {}
        missing = []
        for name in label_names:
            idx = node2id.get(f"label:{name}")
            if idx is None:
                missing.append(name)
                out[name] = np.zeros(emb.shape[1], np.float32)
            else:
                out[name] = np.asarray(emb[idx], np.float32)
        if missing:
            print(f"[KGTrainer] zero-filled {len(missing)} label embeddings: "
                  f"{missing[:5]}...")
        if out_path:
            np.savez_compressed(out_path, **out)
        return out

    @staticmethod
    def load_embeddings(
        out_dir: str,
        expected_dim: Optional[int] = None,
        strict_shapes: bool = False,
        seed: int = 0,
    ) -> Tuple[np.ndarray, dict]:
        """Load node embeddings; pad/truncate on dim mismatch with
        Xavier-filled padding unless strict (KG_Trainer.py:1282-1358)."""
        out = Path(out_dir)
        emb = np.load(out / "node_embeddings.npy")
        meta = json.loads((out / "embeddings_meta.json").read_text())
        if expected_dim is not None and emb.shape[1] != expected_dim:
            if strict_shapes:
                raise ValueError(
                    f"embedding dim {emb.shape[1]} != expected {expected_dim}"
                )
            if emb.shape[1] > expected_dim:
                emb = emb[:, :expected_dim]
            else:
                rng = np.random.default_rng(seed)
                bound = math.sqrt(6.0 / (emb.shape[0] + expected_dim))
                pad = rng.uniform(
                    -bound, bound, (emb.shape[0], expected_dim - emb.shape[1])
                ).astype(emb.dtype)
                emb = np.concatenate([emb, pad], axis=1)
        return emb, meta
