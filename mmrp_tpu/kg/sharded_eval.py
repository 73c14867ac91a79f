"""Entity-sharded KG link-prediction evaluation over a device mesh.

The single-device eval (kg/trainer.py::evaluate) materializes a
(chunk, num_entities) score matrix per direction and ranks on the host.
That is the right shape for OpenI-scale graphs, but the filtered-ranking
protocol itself (reference: src/KnowledgeGraph/KG_Trainer.py:959-1219 —
chunked candidate scoring with an OOM-probing autotuner) is the part of
the KG subsystem that outgrows one chip first: scoring B triples against
E entities is O(B*E*D) FLOPs and O(B*E) memory.

TPU-native scaling (SURVEY §5.8(d): "KG entity-table sharding if the node
count grows"): shard the ENTITY TABLE by rows over a mesh axis and keep
queries replicated. Each device scores the chunk against its E/n slice,
masks its slice's known positives, and computes two partial reductions —

- the target's score (the one device whose slice holds the target
  contributes; ``psum`` broadcasts it), and
- the count of candidates strictly above the target score,

so the cross-device traffic is O(B) scalars per chunk, never the
(B, E) score matrix, and per-device memory is O(B * E/n). rank =
1 + count, exactly the single-device semantics (ties, pre-mask target
capture, padding exclusion), which tests/test_kg_sharded.py asserts
rank-for-rank against ``KGTrainer.evaluate``.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmrp_tpu.kg.models import KGModelConfig, make_tables_fn


def _make_row_scorer(cfg: KGModelConfig) -> Callable:
    """(query_row, aux_row, candidates (M, D*)) -> scores (M,).

    The query row folds the relation in, so ONE row form covers both
    replacement directions per model (distance norms are symmetric):

    - TransE/CompGCN: q = anchor ± r;            score = -||q - cand||
    - TransH:         q = proj_w(anchor) ± r;    score = -||q - proj_w(cand)||
      (aux_row = the relation's unit hyperplane normal w)
    - RotatE:         q = rot^{±1}(anchor, r);   score = gamma - d(q, cand)
    """
    if cfg.name in ("TransE", "CompGCN"):

        def row(q, w, cand):
            diff = q[None, :] - cand
            if cfg.p_norm == 1:
                return -jnp.sum(jnp.abs(diff), axis=-1)
            return -jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)

        return row
    if cfg.name == "TransH":

        def row(q, w, cand):
            cand_p = cand - (cand @ w)[:, None] * w[None, :]
            diff = q[None, :] - cand_p
            if cfg.p_norm == 1:
                return -jnp.sum(jnp.abs(diff), axis=-1)
            return -jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)

        return row
    if cfg.name == "RotatE":
        D = cfg.emb_dim

        def row(q, w, cand):
            d = jnp.sqrt(
                (q[None, :D] - cand[:, :D]) ** 2
                + (q[None, D:] - cand[:, D:]) ** 2
                + 1e-12
            ).sum(-1)
            return cfg.gamma - d

        return row
    raise ValueError(cfg.name)


def make_sharded_rank_fn(
    cfg: KGModelConfig,
    mesh: Mesh,
    axis: str = "dp",
    n_real: Optional[int] = None,
    map_batch: int = 64,
):
    """Build the jitted SPMD rank program.

    fn(queries (B, Dq) rep, aux (B, D) rep, tgt (B,) rep,
       ent (E_pad, D*) sharded by rows, known_mask (B, E_pad) sharded on
       the entity axis) -> ranks (B,) int32, replicated.

    ``known_mask`` True = known-positive candidate to exclude (filtered
    ranking). ``n_real`` is the un-padded entity count; padding rows are
    excluded from the count in-kernel.
    """
    row_scorer = _make_row_scorer(cfg)

    def local(queries, aux, tgt, ent_shard, mask_shard):
        rows = ent_shard.shape[0]
        shard_id = jax.lax.axis_index(axis)

        scores = jax.lax.map(
            lambda args: row_scorer(args[0], args[1], ent_shard),
            (queries, aux),
            batch_size=min(map_batch, queries.shape[0]),
        )  # (B, rows)

        # target score: contributed by the one shard holding the target
        tloc = tgt - shard_id * rows
        in_range = (tloc >= 0) & (tloc < rows)
        tl = jnp.clip(tloc, 0, rows - 1)
        ts_local = jnp.where(
            in_range, scores[jnp.arange(scores.shape[0]), tl], 0.0
        )
        ts = jax.lax.psum(ts_local, axis)  # (B,)

        grow = shard_id * rows + jnp.arange(rows)
        valid = ~mask_shard
        if n_real is not None:
            valid = valid & (grow[None, :] < n_real)
        cnt_local = jnp.sum(
            (scores > ts[:, None]) & valid, axis=1, dtype=jnp.int32
        )
        return 1 + jax.lax.psum(cnt_local, axis)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(None, axis)),
        out_specs=P(),
        check_vma=False,  # outputs are replicated by the trailing psums
    )
    return jax.jit(fn)


def _host_queries(
    cfg: KGModelConfig,
    ent: np.ndarray,
    rel: np.ndarray,
    norm: Optional[np.ndarray],
    anchor: np.ndarray,
    r: np.ndarray,
    tails: bool,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fold anchors + relations into per-row queries (numpy, host-side).

    Returns (queries (B, Dq), aux (B, D)); aux is the TransH hyperplane
    normal (zeros for other models — unused by their row scorers).
    """
    a_e = ent[anchor]
    if cfg.name in ("TransE", "CompGCN"):
        q = a_e + rel[r] if tails else a_e - rel[r]
        return q.astype(np.float32), np.zeros_like(q, dtype=np.float32)
    if cfg.name == "TransH":
        w = norm[r]
        w = w / np.maximum(np.linalg.norm(w, axis=-1, keepdims=True), 1e-8)
        a_p = a_e - np.sum(a_e * w, axis=-1, keepdims=True) * w
        q = a_p + rel[r] if tails else a_p - rel[r]
        return q.astype(np.float32), w.astype(np.float32)
    if cfg.name == "RotatE":
        D = cfg.emb_dim
        a_re, a_im = a_e[:, :D], a_e[:, D:]
        ph = rel[r]
        r_re, r_im = np.cos(ph), np.sin(ph)
        if tails:
            q_re = a_re * r_re - a_im * r_im
            q_im = a_re * r_im + a_im * r_re
        else:  # inverse rotation applied to the tail anchor
            q_re = a_re * r_re + a_im * r_im
            q_im = a_im * r_re - a_re * r_im
        q = np.concatenate([q_re, q_im], axis=1)
        return q.astype(np.float32), np.zeros(
            (len(r), D), dtype=np.float32
        )
    raise ValueError(cfg.name)


def evaluate_sharded(
    trainer,
    triples: np.ndarray,
    mesh: Mesh,
    axis: str = "dp",
    ks: Tuple[int, ...] = (1, 5, 10),
) -> Dict[str, float]:
    """Filtered MRR / Hits@K with the entity table sharded over ``mesh``.

    Drop-in replacement for ``KGTrainer.evaluate`` (same protocol, same
    numbers); ``trainer`` is a fitted KGTrainer. Compiles one program per
    model/direction-independent shape and reuses it across chunks.
    """
    if triples is None or len(triples) == 0:
        return {"mrr": 0.0, **{f"hits@{k}": 0.0 for k in ks}}
    cfg = trainer.model_cfg
    params = trainer.params
    # one propagation (CompGCN) / table fetch, shared by every chunk
    tables = make_tables_fn(cfg)
    ent_t, rel_t = tables(params)
    ent = np.asarray(ent_t, dtype=np.float32)
    rel = np.asarray(rel_t, dtype=np.float32)
    norm = (
        np.asarray(params["norm"], dtype=np.float32)
        if cfg.name == "TransH"
        else None
    )

    n_shards = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    E = ent.shape[0]
    pad_rows = (-E) % n_shards
    ent_pad = (
        np.concatenate([ent, np.zeros((pad_rows, ent.shape[1]), ent.dtype)])
        if pad_rows
        else ent
    )
    E_pad = ent_pad.shape[0]
    ent_dev = jax.device_put(ent_pad, NamedSharding(mesh, P(axis)))
    mask_sharding = NamedSharding(mesh, P(None, axis))
    rep = NamedSharding(mesh, P())

    chunk = min(trainer.cfg.eval_chunk, len(triples))
    rank_fn = make_sharded_rank_fn(cfg, mesh, axis=axis, n_real=E)

    ranks: list = []
    for tails in (True, False):
        csr = trainer._known["sr" if tails else "or"]
        for start in range(0, len(triples), chunk):
            part = triples[start : start + chunk]
            b_real = len(part)
            if b_real < chunk:  # pad to the static shape, slice off after
                part = np.concatenate(
                    [part, np.repeat(part[-1:], chunk - b_real, axis=0)]
                )
            s, r, o = part[:, 0], part[:, 1], part[:, 2]
            anchor = s if tails else o
            target = o if tails else s
            q, aux = _host_queries(cfg, ent, rel, norm, anchor, r, tails)
            mask = np.zeros((chunk, E_pad), dtype=bool)
            rows_idx, cols_idx = trainer._filter_rows_cols(
                csr, anchor, r, trainer.num_relations
            )
            if len(rows_idx):
                mask[rows_idx, cols_idx] = True
            out = rank_fn(
                jax.device_put(q, rep),
                jax.device_put(aux, rep),
                jax.device_put(target.astype(np.int32), rep),
                ent_dev,
                jax.device_put(mask, mask_sharding),
            )
            ranks.extend(np.asarray(out)[:b_real].tolist())
    ranks_arr = np.asarray(ranks, dtype=np.float64)
    out = {"mrr": float(np.mean(1.0 / ranks_arr))}
    for k in ks:
        out[f"hits@{k}"] = float(np.mean(ranks_arr <= k))
    return out
