"""DenseLinkSearch (DLS) parity engine.

A faithful re-implementation of the reference's approximate retrieval walk
(reference: src/Retrieval/retrieval.py:53-271) kept for metric-equivalence
checks against the reference stack. The **product path** is the exact
sharded engine in mmrp_tpu/retrieval/gallery.py — exact search beats this
walk on TPU at the benchmark scale (SURVEY §3.4).

Semantics preserved:
- offline link graph: per-node top ``max_links`` cosine neighbors with
  similarity >= ``link_threshold`` (retrieval.py:121-138) — built here with
  a blocked on-device matmul instead of sklearn's O(N^2) host
  cosine_similarity;
- cached to disk, rebuilt on shape mismatch (retrieval.py:85-119) — npz
  with atomic replace instead of pickle;
- query walk: RNG seeded from the query id hash, ``seed_size`` random entry
  nodes, greedy best-first expansion bounded by ``max_steps`` and a result
  heap of R = heap_mult * K (retrieval.py:188-237), final top-K by cosine.
"""

from __future__ import annotations

import hashlib
import heapq
import os
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from mmrp_tpu.retrieval.gallery import l2_normalize


def build_link_graph(
    embeddings: np.ndarray,
    max_links: int = 10,
    threshold: float = 0.3,
    block: int = 1024,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (neighbors (N, max_links) int32, sims (N, max_links) float32).

    Missing links (below threshold) are -1 / 0.0. Blocked device matmul keeps
    peak memory at O(block * N).
    """
    import jax
    import jax.numpy as jnp

    g = l2_normalize(np.asarray(embeddings, np.float32))
    N = g.shape[0]
    k = min(max_links + 1, N)  # +1: self column removed below
    g_dev = jax.device_put(g)

    @jax.jit
    def block_topk(q):
        s = jnp.dot(q, g_dev.T, preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, k)

    nbrs = np.full((N, max_links), -1, dtype=np.int32)
    sims = np.zeros((N, max_links), dtype=np.float32)
    for start in range(0, N, block):
        q = g_dev[start : start + block]
        s, i = jax.device_get(block_topk(q))
        for r in range(s.shape[0]):
            row = start + r
            cnt = 0
            for c in range(k):
                j = int(i[r, c])
                if j == row:
                    continue
                if s[r, c] < threshold:
                    break  # sorted desc — nothing below passes
                nbrs[row, cnt] = j
                sims[row, cnt] = s[r, c]
                cnt += 1
                if cnt == max_links:
                    break
    return nbrs, sims


class DLSRetrievalEngine:
    def __init__(
        self,
        embeddings: np.ndarray,
        ids: Sequence[str],
        max_links: int = 10,
        link_threshold: float = 0.3,
        seed_size: int = 5,
        max_steps: int = 100,
        heap_mult: int = 10,
        cache_path: Optional[str] = None,
    ):
        self.embeddings = l2_normalize(np.asarray(embeddings, np.float32))
        self.ids = list(ids)
        if self.embeddings.shape[0] != len(self.ids):
            raise ValueError("embeddings/ids length mismatch")
        self.id2idx = {r: i for i, r in enumerate(self.ids)}
        self.max_links = max_links
        self.link_threshold = link_threshold
        self.seed_size = seed_size
        self.max_steps = max_steps
        self.heap_mult = heap_mult
        self.neighbors, self.link_sims = self._load_or_build(cache_path)

    def _load_or_build(self, cache_path):
        N = self.embeddings.shape[0]
        if cache_path and Path(cache_path).exists():
            try:
                z = np.load(cache_path)
                nbrs, sims = z["neighbors"], z["sims"]
                if nbrs.shape == (N, self.max_links):
                    return nbrs, sims
            except (OSError, KeyError, ValueError):
                pass  # corrupt cache -> rebuild (retrieval.py:85-119)
        nbrs, sims = build_link_graph(
            self.embeddings, self.max_links, self.link_threshold
        )
        if cache_path:
            tmp = str(cache_path) + ".tmp.npz"
            np.savez_compressed(tmp, neighbors=nbrs, sims=sims)
            os.replace(tmp, cache_path)
        return nbrs, sims

    # -- query ---------------------------------------------------------------

    def _seed_rng(self, query_id: Optional[str]) -> np.random.Generator:
        if query_id is None:
            return np.random.default_rng(0)
        h = int(hashlib.sha256(str(query_id).encode()).hexdigest()[:8], 16)
        return np.random.default_rng(h)

    def retrieve(
        self, query_emb: np.ndarray, K: int = 10, query_id: Optional[str] = None
    ) -> List[Tuple[str, float]]:
        q = np.asarray(query_emb, np.float32)
        q = q / max(float(np.linalg.norm(q)), 1e-8)
        N = self.embeddings.shape[0]
        rng = self._seed_rng(query_id)
        seeds = rng.choice(N, size=min(self.seed_size, N), replace=False)

        R = self.heap_mult * K
        visited = set()
        frontier: List[Tuple[float, int]] = []  # min-heap of (-sim, idx)
        results: List[Tuple[float, int]] = []  # min-heap of (sim, idx), size<=R

        def visit(idx: int):
            if idx in visited:
                return
            visited.add(idx)
            sim = float(self.embeddings[idx] @ q)
            heapq.heappush(frontier, (-sim, idx))
            heapq.heappush(results, (sim, idx))
            if len(results) > R:
                heapq.heappop(results)

        for s in seeds:
            visit(int(s))
        for _ in range(self.max_steps):
            if not frontier:
                break
            _, best = heapq.heappop(frontier)
            for nb in self.neighbors[best]:
                if nb < 0:
                    break
                visit(int(nb))

        ranked = sorted(results, key=lambda t: -t[0])
        out = []
        for sim, idx in ranked:
            rid = self.ids[idx]
            if query_id is not None and rid == query_id:
                continue
            out.append((rid, sim))
            if len(out) == K:
                break
        return out


def make_retrieval_engine(
    backend: str,
    embeddings: np.ndarray,
    ids: Sequence[str],
    **kw,
):
    """Factory mirroring reference make_retrieval_engine (retrieval.py:273-304)."""
    if backend == "dls":
        allowed = {
            "max_links", "link_threshold", "seed_size", "max_steps",
            "heap_mult", "cache_path",
        }
        return DLSRetrievalEngine(
            embeddings, ids, **{k: v for k, v in kw.items() if k in allowed}
        )
    if backend == "exact":
        from mmrp_tpu.retrieval.gallery import RetrievalEngine

        allowed = {"mesh", "shard_axis", "normalize"}
        return RetrievalEngine(
            embeddings, ids, **{k: v for k, v in kw.items() if k in allowed}
        )
    raise ValueError(f"unknown retrieval backend {backend!r}")
