"""Exact sharded-gallery retrieval: cosine top-K as one SPMD program.

This is the TPU-native replacement for the reference's DenseLinkSearch
engine (reference: src/Retrieval/retrieval.py:53-271) — an approximate,
seeded CPU graph walk over a pickled O(N^2) link graph. On TPU, exact
search is faster at the target scale (SURVEY §3.4): one fused
``q @ gallery.T`` + ``lax.top_k`` per shard, a gather across the mesh, and
a global re-top-K. No index build, no approximation, deterministic.

Two paths:
- ``topk_single``: single-device jitted matmul + top_k;
- ``topk_sharded``: gallery rows sharded over a mesh axis via shard_map;
  each device computes local scores + local top-K (k per shard), results
  are all-gathered over ICI and re-ranked globally. Communication is
  O(devices * k) scores, not O(N).

The engine keeps embeddings L2-normalized at load so cosine == dot.
``RetrievalEngine`` mirrors the reference ABC surface (embeddings + ids,
id->index map, ``get_embeddings_for_ids`` zero-fill, retrieval.py:18-50).
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def l2_normalize(x: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(n, eps)


@functools.partial(jax.jit, static_argnames=("k",))
def topk_single(queries: jnp.ndarray, gallery: jnp.ndarray, k: int = 10):
    """(Q, D) x (N, D) -> (scores (Q, k), indices (Q, k)). Cosine == dot on
    normalized inputs."""
    scores = jnp.dot(
        queries, gallery.T, preferred_element_type=jnp.float32
    )  # (Q, N)
    return jax.lax.top_k(scores, k)


def make_sharded_topk(mesh: Mesh, axis: str, k: int, n_real: Optional[int] = None):
    """Build a jitted sharded top-K: gallery sharded by rows over ``axis``.

    Returns fn(queries (Q, D) replicated, gallery (N, D) sharded) ->
    (scores (Q, k), global indices (Q, k)). ``n_real`` is the un-padded
    gallery row count: padding rows are masked to -inf ON DEVICE — their
    raw dot score is 0, which would otherwise beat real rows with
    negative cosine similarity.
    """
    n_shards = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def local_topk(q, g_shard):
        # q: (Q, D) replicated; g_shard: (N/s, D) this device's rows
        scores = jnp.dot(q, g_shard.T, preferred_element_type=jnp.float32)
        shard_id = jax.lax.axis_index(axis)
        rows = g_shard.shape[0]
        if n_real is not None:
            grow = shard_id * rows + jnp.arange(rows)
            scores = jnp.where(grow[None, :] < n_real, scores, -jnp.inf)
        # a shard can hold fewer than k rows (tiny gallery on a wide mesh);
        # lax.top_k requires k <= rows. The union still covers >= k real
        # rows because shards*rows >= N >= k (callers clamp k to N).
        k_loc = min(k, rows)
        s, i = jax.lax.top_k(scores, k_loc)  # (Q, k_loc) local
        gi = i + shard_id * rows  # global row index
        # gather candidates from every shard: (Q, s*k_loc)
        all_s = jax.lax.all_gather(s, axis, axis=1).reshape(s.shape[0], -1)
        all_i = jax.lax.all_gather(gi, axis, axis=1).reshape(s.shape[0], -1)
        top_s, pos = jax.lax.top_k(all_s, min(k, n_shards * k_loc))
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        return top_s, top_i

    spec_rep = P()
    spec_shard = P(axis)
    fn = shard_map(
        local_topk,
        mesh=mesh,
        in_specs=(spec_rep, spec_shard),
        out_specs=(spec_rep, spec_rep),
        check_vma=False,  # outputs are replicated by the trailing all_gather
    )
    return jax.jit(fn)


class RetrievalEngine:
    """Embedding-gallery engine with the reference's data contract.

    Loads (or takes) an (N, D) float32 matrix + aligned id list; provides
    id->index lookup and zero-filled ``get_embeddings_for_ids``
    (reference retrieval.py:18-50), plus exact ``retrieve``.
    """

    def __init__(
        self,
        embeddings: np.ndarray,
        ids: Sequence[str],
        mesh: Optional[Mesh] = None,
        shard_axis: str = "dp",
        normalize: bool = True,
    ):
        embeddings = np.asarray(embeddings, dtype=np.float32)
        if embeddings.ndim != 2:
            raise ValueError("embeddings must be (N, D)")
        if embeddings.shape[0] != len(ids):
            raise ValueError(
                f"embeddings rows {embeddings.shape[0]} != ids {len(ids)}"
            )
        self.ids = list(ids)
        self.id2idx = {r: i for i, r in enumerate(self.ids)}
        self.raw_embeddings = embeddings
        self.embeddings = l2_normalize(embeddings) if normalize else embeddings
        self.mesh = mesh
        self.shard_axis = shard_axis
        self._n_real = embeddings.shape[0]
        self._device_gallery = None
        self._sharded_topk_cache: Dict[int, callable] = {}

    # -- constructors ---------------------------------------------------------

    @classmethod
    def from_files(cls, emb_path: str, ids_path: str, **kw) -> "RetrievalEngine":
        emb = np.load(emb_path)
        ids = json.loads(Path(ids_path).read_text())
        return cls(emb, ids, **kw)

    # -- reference-parity accessors -----------------------------------------

    def get_embeddings_for_ids(self, ids: Sequence[str]) -> np.ndarray:
        """(len(ids), D); zero vector for unknown ids (retrieval.py:41-50)."""
        D = self.embeddings.shape[1]
        out = np.zeros((len(ids), D), dtype=np.float32)
        for i, rid in enumerate(ids):
            j = self.id2idx.get(rid)
            if j is not None:
                out[i] = self.embeddings[j]
        return out

    # -- device placement ------------------------------------------------------

    def _gallery_on_device(self):
        if self._device_gallery is not None:
            return self._device_gallery
        g = self.embeddings
        if self.mesh is not None:
            n_shards = dict(
                zip(self.mesh.axis_names, self.mesh.devices.shape)
            )[self.shard_axis]
            pad = (-g.shape[0]) % n_shards
            if pad:
                g = np.concatenate([g, np.zeros((pad, g.shape[1]), g.dtype)])
            sharding = NamedSharding(self.mesh, P(self.shard_axis))
            self._device_gallery = jax.device_put(g, sharding)
        else:
            self._device_gallery = jax.device_put(g)
        return self._device_gallery

    # -- retrieval ---------------------------------------------------------------

    def retrieve_batch_device(
        self, queries_dev: jnp.ndarray, k: int = 10
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Device (Q, D) -> DEVICE (scores (Q, kk), indices (Q, kk)).

        No host sync: normalization runs in-graph, so a pipelined caller
        (serve/stream.py) can dispatch retrieval for batch i+1 before
        materializing batch i. Pair with ``finalize_batch`` for the
        padding-row cleanup that ``retrieve_batch`` applies.
        """
        qf = queries_dev.astype(jnp.float32)
        q = qf / jnp.maximum(
            jnp.linalg.norm(qf, axis=-1, keepdims=True), 1e-8
        )
        g = self._gallery_on_device()
        kk = min(k, self._n_real)
        if self.mesh is not None:
            if kk not in self._sharded_topk_cache:
                self._sharded_topk_cache[kk] = make_sharded_topk(
                    self.mesh, self.shard_axis, kk, n_real=self._n_real
                )
            q = jax.device_put(q, NamedSharding(self.mesh, P()))
            return self._sharded_topk_cache[kk](q, g)
        return topk_single(q, g, kk)

    def finalize_batch(
        self, s: jnp.ndarray, i: jnp.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Materialize device top-K results; mask gallery padding rows."""
        kk = min(s.shape[1], self._n_real)
        s, i = np.asarray(s), np.asarray(i)
        # padding rows (zero vectors) score 0; with k <= N they only appear
        # when the gallery is tiny — mask them to -inf and drop via re-sort
        invalid = i >= self._n_real
        if invalid.any():
            s = np.where(invalid, -np.inf, s)
            order = np.argsort(-s, axis=1, kind="stable")
            s = np.take_along_axis(s, order, axis=1)
            i = np.take_along_axis(i, order, axis=1)
        return s[:, :kk], i[:, :kk]

    def retrieve_batch(
        self, queries: np.ndarray, k: int = 10
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(Q, D) -> (scores (Q, k), indices (Q, k)) over the gallery.
        Normalization happens in-graph (retrieve_batch_device)."""
        q = jnp.asarray(np.asarray(queries, dtype=np.float32))
        return self.finalize_batch(*self.retrieve_batch_device(q, k))

    def retrieve(
        self, query_emb: np.ndarray, K: int = 10, query_id: Optional[str] = None
    ) -> List[Tuple[str, float]]:
        """Single query -> [(id, score)] sorted desc; excludes the query's
        own gallery row when query_id is present (self-match)."""
        extra = 1 if query_id is not None and query_id in self.id2idx else 0
        s, i = self.retrieve_batch(query_emb[None, :], k=min(K + extra, self._n_real))
        out = []
        for score, idx in zip(s[0], i[0]):
            rid = self.ids[int(idx)]
            if query_id is not None and rid == query_id:
                continue
            out.append((rid, float(score)))
            if len(out) == K:
                break
        return out
