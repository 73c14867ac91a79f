"""Knowledge-graph embedding models: TransE / TransH / RotatE / CompGCN.

Functional JAX redesign of the reference's torch KGE models (reference:
src/KnowledgeGraph/KG_Trainer.py:23-134):

- every model is (init_params, score) where ``score(params, s, r, o)`` maps
  index arrays to plausibility scores (higher = more plausible) — the same
  convention the reference uses (negative distances for TransE/H/RotatE);
- ``score_against_all`` scores (s, r) against EVERY entity in one matmul-
  shaped pass for filtered ranking — replacing the reference's chunked
  loop + OOM autotuner (KG_Trainer.py:814-1086) with a static-shape batched
  computation;
- CompGCN propagates entity/relation embeddings through message-passing
  layers built on jax.ops.segment_sum (mmrp_tpu/ops/kg_ops.py), then scores
  TransE-style (KG_Trainer.py:85-134, compgcn_conv.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmrp_tpu.ops.kg_ops import compose


@dataclass(frozen=True)
class KGModelConfig:
    name: str  # TransE | TransH | RotatE | CompGCN
    num_entities: int
    num_relations: int
    emb_dim: int = 300
    p_norm: int = 1  # TransE/H distance norm
    gamma: float = 12.0  # RotatE margin for embedding range init
    # CompGCN
    num_layers: int = 2
    dropout: float = 0.3
    opn: str = "corr"
    # edges for CompGCN propagation (static arrays, set by the trainer)
    edge_src: Optional[np.ndarray] = None
    edge_dst: Optional[np.ndarray] = None
    edge_rel: Optional[np.ndarray] = None


def init_params(cfg: KGModelConfig, rng: jax.Array) -> Dict[str, jnp.ndarray]:
    ke, kr, kw = jax.random.split(rng, 3)
    E, R, D = cfg.num_entities, cfg.num_relations, cfg.emb_dim
    if cfg.name == "RotatE":
        # entities are complex: 2*D real dims; relations are phases in D dims
        rng_range = cfg.gamma / D
        params = {
            "ent": jax.random.uniform(ke, (E, 2 * D), minval=-rng_range, maxval=rng_range),
            "rel": jax.random.uniform(kr, (R, D), minval=-np.pi, maxval=np.pi),
        }
    elif cfg.name == "TransH":
        init = jax.nn.initializers.glorot_uniform()
        params = {
            "ent": init(ke, (E, D)),
            "rel": init(kr, (R, D)),
            "norm": init(kw, (R, D)),
        }
    elif cfg.name == "CompGCN":
        init = jax.nn.initializers.glorot_uniform()
        keys = jax.random.split(kw, 5 * cfg.num_layers)
        params = {
            "ent": init(ke, (E, D)),
            "rel": init(kr, (R, D)),
        }
        # per-layer parameter set mirrors the reference conv
        # (compgcn_conv.py:37-47): distinct in/out/loop/rel weights, a
        # learned self-loop relation, bias, and BatchNorm scale/offset
        for layer in range(cfg.num_layers):
            k = keys[5 * layer : 5 * layer + 5]
            params[f"w_in_{layer}"] = init(k[0], (D, D))
            params[f"w_out_{layer}"] = init(k[1], (D, D))
            params[f"w_loop_{layer}"] = init(k[2], (D, D))
            params[f"w_rel_{layer}"] = init(k[3], (D, D))
            params[f"loop_rel_{layer}"] = init(k[4], (1, D))
            params[f"bias_{layer}"] = jnp.zeros((D,))
            params[f"bn_scale_{layer}"] = jnp.ones((D,))
            params[f"bn_bias_{layer}"] = jnp.zeros((D,))
    else:  # TransE
        init = jax.nn.initializers.glorot_uniform()
        params = {"ent": init(ke, (E, D)), "rel": init(kr, (R, D))}
    return jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), params)


# ---------------------------------------------------------------------------
# Scoring
# ---------------------------------------------------------------------------


def _transe_score(s_e, r_e, o_e, p_norm):
    diff = s_e + r_e - o_e
    if p_norm == 1:
        d = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    return -d


def _transh_project(e, w):
    w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-8)
    return e - jnp.sum(e * w, axis=-1, keepdims=True) * w


def _rotate_score(s_e, r_phase, o_e, gamma):
    D = r_phase.shape[-1]
    s_re, s_im = s_e[..., :D], s_e[..., D:]
    o_re, o_im = o_e[..., :D], o_e[..., D:]
    r_re, r_im = jnp.cos(r_phase), jnp.sin(r_phase)
    rot_re = s_re * r_re - s_im * r_im
    rot_im = s_re * r_im + s_im * r_re
    d = jnp.sqrt((rot_re - o_re) ** 2 + (rot_im - o_im) ** 2 + 1e-12).sum(-1)
    return gamma - d


def compgcn_propagate(
    cfg: KGModelConfig,
    params: Dict[str, jnp.ndarray],
    rng: Optional[jax.Array] = None,
    training: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the CompGCN conv stack -> (entity_table, relation_table).

    Per-layer math follows the reference conv (compgcn_conv.py:50-108):

        in_res   = scatter_add(norm_in  * compose(x[src], rel[er]) @ W_in,  dst)
        out_res  = scatter_add(norm_out * compose(x[dst], rel[er]) @ W_out, src)
        loop_res = compose(x, loop_rel) @ W_loop                (no norm)
        x'  = relu(BN(drop(in_res)/3 + drop(out_res)/3 + loop_res/3 + bias))
        rel' = concat(rel, loop_rel) @ W_rel   [loop row dropped]

    with norm = deg^-1/2[row] * deg^-1/2[col] (compute_norm). The out
    direction runs over PROPER inverse edges (dst -> src, aggregated at
    src) — the conv's documented contract; the reference trainer actually
    feeds un-mirrored edges and silently halves them (KG_Trainer.py:242-252),
    which we treat as a caller bug, not model semantics. BatchNorm uses
    batch statistics in both modes: the "batch" is the full entity table on
    every call, so eval-time batch stats are deterministic and exactly
    normalize the eval input (there is no train/eval batch distribution
    shift for running stats to bridge).
    """
    from mmrp_tpu.ops.kg_ops import compute_norm

    ent, rel = params["ent"], params["rel"]
    src = jnp.asarray(cfg.edge_src)
    dst = jnp.asarray(cfg.edge_dst)
    erel = jnp.asarray(cfg.edge_rel)
    E = cfg.num_entities
    use_dropout = training and cfg.dropout > 0.0 and rng is not None
    if use_dropout:
        drop_keys = jax.random.split(rng, 2 * cfg.num_layers)

    def dropout(x, key):
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)

    norm_in = compute_norm(src, dst, E)   # original edges, aggregated at dst
    norm_out = compute_norm(dst, src, E)  # inverse edges, aggregated at src
    for layer in range(cfg.num_layers):
        loop_rel = params[f"loop_rel_{layer}"]
        msg_in = compose(ent[src], rel[erel], cfg.opn) @ params[f"w_in_{layer}"]
        agg_in = jax.ops.segment_sum(
            msg_in * norm_in[:, None], dst, num_segments=E
        )
        msg_out = compose(ent[dst], rel[erel], cfg.opn) @ params[f"w_out_{layer}"]
        agg_out = jax.ops.segment_sum(
            msg_out * norm_out[:, None], src, num_segments=E
        )
        loop = compose(
            ent, jnp.broadcast_to(loop_rel, ent.shape), cfg.opn
        ) @ params[f"w_loop_{layer}"]
        if use_dropout:
            agg_in = dropout(agg_in, drop_keys[2 * layer])
            agg_out = dropout(agg_out, drop_keys[2 * layer + 1])
        out = (agg_in + agg_out + loop) / 3.0 + params[f"bias_{layer}"]
        # BatchNorm1d over the entity axis (batch statistics; see docstring)
        mu = out.mean(axis=0, keepdims=True)
        var = out.var(axis=0, keepdims=True)
        out = (out - mu) * jax.lax.rsqrt(var + 1e-5)
        out = out * params[f"bn_scale_{layer}"] + params[f"bn_bias_{layer}"]
        ent = jax.nn.relu(out)
        rel_ext = jnp.concatenate([rel, loop_rel], axis=0)
        rel = (rel_ext @ params[f"w_rel_{layer}"])[:-1]
    return ent, rel


def make_tables_fn(cfg: KGModelConfig) -> Callable:
    """tables(params, rng=None, training=False) -> (ent_table, rel_table).

    For CompGCN this runs the conv stack ONCE; the trainer scores positives
    and negatives from the same propagated tables, matching the reference's
    per-step single forward (KG_Trainer.py:561)."""

    def tables(params, rng=None, training=False):
        if cfg.name == "CompGCN":
            return compgcn_propagate(cfg, params, rng=rng, training=training)
        return params["ent"], params["rel"]

    return tables


def score_from_tables(
    cfg: KGModelConfig, params, ent, rel, s, r, o
) -> jnp.ndarray:
    """Score triples given precomputed tables; higher = more plausible."""
    if cfg.name in ("TransE", "CompGCN"):
        return _transe_score(ent[s], rel[r], ent[o], cfg.p_norm)
    if cfg.name == "TransH":
        w = params["norm"][r]
        return _transe_score(
            _transh_project(ent[s], w), rel[r], _transh_project(ent[o], w),
            cfg.p_norm,
        )
    if cfg.name == "RotatE":
        return _rotate_score(ent[s], rel[r], ent[o], cfg.gamma)
    raise ValueError(cfg.name)


def make_score_fn(cfg: KGModelConfig) -> Callable:
    """score(params, s_idx, r_idx, o_idx, rng=None, training=False) ->
    scores; higher = better."""
    tables = make_tables_fn(cfg)

    def score(params, s, r, o, rng=None, training=False):
        ent, rel = tables(params, rng=rng, training=training)
        return score_from_tables(cfg, params, ent, rel, s, r, o)

    return score


def make_score_all_fn(cfg: KGModelConfig, tails: bool = True) -> Callable:
    """score_all(params, s, r) -> (B, num_entities) scores vs every entity
    (tail replacement) or every head when tails=False.

    One batched computation — no candidate chunking; the (B, E, D) diff for
    distance models is avoided by algebraic expansion where possible, else
    computed blockwise under vmap for memory safety.
    """

    def tables(params):
        if cfg.name == "CompGCN":
            return compgcn_propagate(cfg, params)
        return params["ent"], params["rel"]

    def score_all(params, anchor, r):
        """``anchor`` is the head for tail-replacement, the tail for
        head-replacement (distance norms are symmetric)."""
        ent, rel = tables(params)
        if cfg.name in ("TransE", "CompGCN"):
            # tails: ||(s + r) - o'||  ==  heads: ||(o - r) - s'||
            query = ent[anchor] + rel[r] if tails else ent[anchor] - rel[r]

            def per_row(qrow):
                diff = qrow[None, :] - ent
                if cfg.p_norm == 1:
                    return -jnp.sum(jnp.abs(diff), axis=-1)
                return -jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)

            return jax.lax.map(per_row, query, batch_size=64)
        if cfg.name == "TransH":
            w = params["norm"][r]
            w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-8)

            def per_row(args):
                qe, qr, qw = args
                ent_p = ent - (ent @ qw)[:, None] * qw[None, :]
                q_p = qe - jnp.sum(qe * qw) * qw
                diff = (q_p + qr)[None, :] - ent_p if tails else ent_p + qr[None, :] - (
                    q_p
                )[None, :]
                if cfg.p_norm == 1:
                    return -jnp.sum(jnp.abs(diff), axis=-1)
                return -jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)

            return jax.lax.map(per_row, (ent[anchor], rel[r], w), batch_size=16)
        if cfg.name == "RotatE":
            D = cfg.emb_dim
            re_all, im_all = ent[:, :D], ent[:, D:]

            def per_row(args):
                ae, ph = args  # anchor embedding (2D,), relation phases (D,)
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

            return jax.lax.map(per_row, (ent[anchor], rel[r]), batch_size=16)
        raise ValueError(cfg.name)

    return score_all


def final_entity_table(cfg: KGModelConfig, params) -> np.ndarray:
    """Entity table to persist: CompGCN saves the PROPAGATED embeddings,
    RotatE the complex (2D) ones (KG_Trainer.py:1229-1262)."""
    if cfg.name == "CompGCN":
        ent, _ = compgcn_propagate(cfg, params)
        return np.asarray(ent)
    return np.asarray(params["ent"])
