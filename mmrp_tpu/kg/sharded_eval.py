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
queries replicated. Each device scores the chunk against its E/n slice
and computes two partial reductions —

- the target's score (the one device whose slice holds the target
  contributes; ``psum`` broadcasts it), and
- the count of candidates strictly above the target score, with known
  positives (filtered ranking) subtracted via a ragged (row, col) pair
  list scattered in-kernel — never a dense (B, E) mask on the host,

so the cross-device traffic is O(B) scalars per chunk plus the O(pairs)
replicated filter list, and per-device memory is O(B * E/n). rank =
1 + count, exactly the single-device semantics (ties, pre-mask target
capture, padding exclusion), which tests/test_kg_sharded.py asserts
rank-for-rank against ``KGTrainer.evaluate``.

Numerics: the anchor+relation query fold runs INSIDE the jitted program
using the same expressions as ``make_score_all_fn`` (kg/models.py), so
rank parity with the single-device eval does not depend on host-numpy
vs device op-order agreement for transcendentals (RotatE cos/sin) or
operand order (TransH) — the two programs execute the same jaxprs on
the candidate axis. Tie semantics are optimistic rank (1 + strict-
greater count); see docs/PARITY.md for the divergence note vs the
reference's argsort-position ranking.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmrp_tpu.kg.models import KGModelConfig, make_tables_fn

# Jitted rank programs cached across evaluate_sharded calls (a per-epoch
# validation loop must NOT recompile; compiles cost minutes on the
# tunneled TPU). jax.jit's own cache handles shape variation (chunk and
# filter-pair capacity); this dict handles fn identity.
_RANK_FN_CACHE: Dict[tuple, Callable] = {}


def _cfg_cache_key(cfg: KGModelConfig) -> tuple:
    # edge_* arrays are irrelevant to ranking (tables are precomputed)
    return (
        cfg.name, cfg.num_entities, cfg.num_relations, cfg.emb_dim,
        cfg.p_norm, cfg.gamma,
    )


def make_sharded_rank_fn(
    cfg: KGModelConfig,
    mesh: Mesh,
    axis: str = "dp",
    n_real: Optional[int] = None,
    map_batch: int = 64,
    tails: bool = True,
):
    """Build (or fetch from cache) the jitted SPMD rank program.

    fn(anchor_emb (B, De) rep, rel_row (B, Dr) rep, w_row (B, Dw) rep,
       tgt (B,) rep, pair_rows (K,) rep, pair_cols (K,) rep,
       ent (E_pad, De) sharded by rows) -> ranks (B,) int32, replicated.

    ``anchor_emb`` is the head embedding for tail replacement, the tail
    embedding for head replacement; the relation fold happens in-kernel
    with the same ops as ``make_score_all_fn``. ``(pair_rows, pair_cols)``
    are the known-positive (filtered-ranking) pairs, padded to a static
    capacity with col = -1 sentinels; each shard subtracts the pairs
    whose column lands in its slice. ``n_real`` is the un-padded entity
    count; padding rows are excluded from the count in-kernel.
    """
    key = (_cfg_cache_key(cfg), mesh, axis, n_real, map_batch, tails)
    hit = _RANK_FN_CACHE.get(key)
    if hit is not None:
        return hit

    def local(anchor_emb, rel_row, w_row, tgt, pair_rows, pair_cols,
              ent_shard):
        rows = ent_shard.shape[0]
        B = anchor_emb.shape[0]
        shard_id = jax.lax.axis_index(axis)

        # Per-row scorer: query fold + candidate distances, mirroring
        # make_score_all_fn's per_row bodies on the shard slice (per-
        # candidate ops only, so slicing preserves bitwise results).
        if cfg.name in ("TransE", "CompGCN"):

            def per_row(args):
                ae, qr, _ = args
                q = ae + qr if tails else ae - qr
                diff = q[None, :] - ent_shard
                if cfg.p_norm == 1:
                    return -jnp.sum(jnp.abs(diff), axis=-1)
                return -jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)

        elif cfg.name == "TransH":

            def per_row(args):
                qe, qr, qw_raw = args
                qw = qw_raw / jnp.maximum(
                    jnp.linalg.norm(qw_raw, axis=-1, keepdims=True), 1e-8
                )
                ent_p = ent_shard - (ent_shard @ qw)[:, None] * qw[None, :]
                q_p = qe - jnp.sum(qe * qw) * qw
                diff = (
                    (q_p + qr)[None, :] - ent_p
                    if tails
                    else ent_p + qr[None, :] - (q_p)[None, :]
                )
                if cfg.p_norm == 1:
                    return -jnp.sum(jnp.abs(diff), axis=-1)
                return -jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)

        elif cfg.name == "RotatE":
            D = cfg.emb_dim

            def per_row(args):
                ae, ph, _ = args
                re_all, im_all = ent_shard[:, :D], ent_shard[:, D:]
                a_re, a_im = ae[:D], ae[D:]
                r_re, r_im = jnp.cos(ph), jnp.sin(ph)
                if tails:
                    rot_re = a_re * r_re - a_im * r_im
                    rot_im = a_re * r_im + a_im * r_re
                else:  # inverse rotation applied to the (tail) anchor
                    rot_re = a_re * r_re + a_im * r_im
                    rot_im = a_im * r_re - a_re * r_im
                d = jnp.sqrt(
                    (rot_re[None, :] - re_all) ** 2
                    + (rot_im[None, :] - im_all) ** 2
                    + 1e-12
                ).sum(-1)
                return cfg.gamma - d

        else:
            raise ValueError(cfg.name)

        scores = jax.lax.map(
            per_row,
            (anchor_emb, rel_row, w_row),
            batch_size=min(map_batch, B),
        )  # (B, rows)

        # target score: contributed by the one shard holding the target
        tloc = tgt - shard_id * rows
        in_range = (tloc >= 0) & (tloc < rows)
        tl = jnp.clip(tloc, 0, rows - 1)
        ts_local = jnp.where(in_range, scores[jnp.arange(B), tl], 0.0)
        ts = jax.lax.psum(ts_local, axis)  # (B,)

        grow = shard_id * rows + jnp.arange(rows)
        valid = (
            grow[None, :] < n_real
            if n_real is not None
            else jnp.ones((1, rows), dtype=bool)
        )
        cnt_local = jnp.sum(
            (scores > ts[:, None]) & valid, axis=1, dtype=jnp.int32
        )

        # filtered ranking: subtract known positives scoring above the
        # target — ragged pairs, scattered per shard (ADVICE r3: no
        # dense (B, E) host mask)
        ploc = pair_cols - shard_id * rows
        p_in = (pair_cols >= 0) & (ploc >= 0) & (ploc < rows)
        pl = jnp.clip(ploc, 0, rows - 1)
        pr = jnp.clip(pair_rows, 0, B - 1)
        psc = scores[pr, pl]
        above = p_in & (psc > ts[pr])
        sub = jax.ops.segment_sum(
            above.astype(jnp.int32), pr, num_segments=B
        )
        return 1 + jax.lax.psum(cnt_local - sub, axis)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(axis)),
        out_specs=P(),
        check_vma=False,  # outputs are replicated by the trailing psums
    )
    jitted = jax.jit(fn)
    _RANK_FN_CACHE[key] = jitted
    return jitted


def _pad_pairs(
    rows_idx: np.ndarray, cols_idx: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Dedup + pad filter pairs to a power-of-two capacity (col = -1
    sentinel) so chunk-to-chunk pair counts reuse a handful of compiled
    shapes instead of one per count."""
    if len(rows_idx):
        # dedup: duplicate triples in the source data would otherwise
        # double-subtract (the dense-mask formulation dedup'd for free)
        key = rows_idx.astype(np.int64) * (1 << 32) + cols_idx.astype(np.int64)
        _, keep = np.unique(key, return_index=True)
        rows_idx, cols_idx = rows_idx[keep], cols_idx[keep]
    cap = max(256, 1 << int(max(len(rows_idx), 1) - 1).bit_length())
    pr = np.zeros(cap, dtype=np.int32)
    pc = np.full(cap, -1, dtype=np.int32)
    pr[: len(rows_idx)] = rows_idx
    pc[: len(cols_idx)] = cols_idx
    return pr, pc


def evaluate_sharded(
    trainer,
    triples: np.ndarray,
    mesh: Mesh,
    axis: str = "dp",
    ks: Tuple[int, ...] = (1, 5, 10),
) -> Dict[str, float]:
    """Filtered MRR / Hits@K with the entity table sharded over ``mesh``.

    Drop-in replacement for ``KGTrainer.evaluate`` (same protocol, same
    numbers); ``trainer`` is a fitted KGTrainer. The rank programs are
    cached across calls (module-level), so per-epoch validation loops
    compile once.
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
    ent_dev = jax.device_put(ent_pad, NamedSharding(mesh, P(axis)))
    rep = NamedSharding(mesh, P())

    chunk = min(trainer.cfg.eval_chunk, len(triples))

    ranks: list = []
    for tails in (True, False):
        rank_fn = make_sharded_rank_fn(
            cfg, mesh, axis=axis, n_real=E, tails=tails
        )
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
            anchor_emb = ent[anchor]
            rel_row = rel[r]
            w_row = (
                norm[r]
                if norm is not None
                else np.zeros((chunk, 1), dtype=np.float32)
            )
            rows_idx, cols_idx = trainer._filter_rows_cols(
                csr, anchor, r, trainer.num_relations
            )
            pr, pc = _pad_pairs(np.asarray(rows_idx), np.asarray(cols_idx))
            out = rank_fn(
                jax.device_put(anchor_emb, rep),
                jax.device_put(rel_row, rep),
                jax.device_put(w_row, rep),
                jax.device_put(target.astype(np.int32), rep),
                jax.device_put(pr, rep),
                jax.device_put(pc, rep),
                ent_dev,
            )
            ranks.extend(np.asarray(out)[:b_real].tolist())
    ranks_arr = np.asarray(ranks, dtype=np.float64)
    out = {"mrr": float(np.mean(1.0 / ranks_arr))}
    for k in ks:
        out[f"hits@{k}"] = float(np.mean(ranks_arr <= k))
    return out
