"""High-level inference API: embed / retrieve / predict / explain.

The reference exposes these through the torch module itself
(reference: src/Model/model.py:281-309 retriever ownership, :491-582
predict, :584-668 explain, :715-796 web schema). Here they compose a pure
jitted model with the retrieval engine and explanation engine explicitly —
``MMRPredictor`` is the single object a reference user would reach for.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmrp_tpu.models.explain import ExplanationEngine
from mmrp_tpu.models.multimodal import MultiModalRetrievalModel
from mmrp_tpu.retrieval.gallery import RetrievalEngine
from mmrp_tpu.retrieval.rerank import Reranker


def serving_variables(params) -> Dict[str, Any]:
    """Serving params blob -> flax variables dict. Accepts a raw param
    tree or {"model": tree[, "quant_cache": cache]} — the optional cache
    carries pre-quantized int8 Swin weights (models/quant_calib.py::
    build_quant_cache) so dispatch-per-batch serving never re-quantizes."""
    if hasattr(params, "get") and "model" in params:
        variables = {"params": params["model"]}
        if "quant_cache" in params:
            variables["quant_cache"] = params["quant_cache"]
        return variables
    return {"params": params}


def serving_forward(model: MultiModalRetrievalModel):
    """The serving forward contract: params (raw tree or {"model": tree})
    + (image, ids, mask) -> {probs, joint_emb, img_emb, txt_emb}.

    Single definition shared by the live predictor below and the
    serialized-artifact exporter (serve/exported.py) so artifacts cannot
    silently diverge from live serving outputs.
    """

    def fwd(params, image, ids, mask):
        out = model.apply(
            serving_variables(params),
            image, ids, mask, deterministic=True,
        )
        return {
            "probs": jax.nn.sigmoid(out["logits"]),
            "joint_emb": out["joint_emb"],
            "img_emb": out["img_emb"],
            "txt_emb": out["txt_emb"],
        }

    return fwd


class MMRPredictor:
    def __init__(
        self,
        model: MultiModalRetrievalModel,
        params: Dict[str, Any],
        label_names: Sequence[str],
        retriever: Optional[RetrievalEngine] = None,
        reranker: Optional[Reranker] = None,
        threshold: "float | np.ndarray" = 0.5,
    ):
        # threshold may be a scalar or the per-class calibrated vector the
        # trainer saves (thresholds.npy; reference train.py:620-704)
        self.model = model
        # int8_static serving: pre-quantize the Swin weights ONCE here so
        # per-request dispatches skip the in-graph weight quantization
        # (models/quant_calib.py::build_quant_cache)
        sw = getattr(getattr(model, "config", None), "swin", None)
        if (sw is not None and getattr(sw, "quant", "none") == "int8_static"
                and hasattr(params, "get") and "model" in params
                and "quant_cache" not in params):
            from mmrp_tpu.models.quant_calib import build_quant_cache

            qc = build_quant_cache(params["model"])
            if qc:
                params = {**params, "quant_cache": qc}
        self.params = params
        self.label_names = list(label_names)
        self.retriever = retriever
        self.reranker = reranker
        self.threshold = threshold

        self._fwd = jax.jit(serving_forward(model))
        self._explainer: Optional[ExplanationEngine] = None

    # -- embed ----------------------------------------------------------------

    def embed(
        self, image: np.ndarray, input_ids: np.ndarray, attention_mask: np.ndarray
    ) -> Dict[str, np.ndarray]:
        out = self._fwd(
            self.params, jnp.asarray(image), jnp.asarray(input_ids),
            jnp.asarray(attention_mask),
        )
        return {k: np.asarray(v) for k, v in out.items()}

    # -- retrieve ---------------------------------------------------------------

    def retrieve(
        self,
        joint_emb: np.ndarray,
        K: int = 5,
        query_id: Optional[str] = None,
        rerank: bool = True,
    ) -> List[Tuple[str, float]]:
        if self.retriever is None:
            raise RuntimeError("no retrieval engine attached")
        # over-fetch only when a reranker will actually reorder the pool
        extra = K * 3 if (rerank and self.reranker is not None) else K
        hits = self.retriever.retrieve(joint_emb, K=extra, query_id=query_id)
        if rerank and self.reranker is not None and hits:
            cand_ids = [h[0] for h in hits]
            cand_embs = self.retriever.get_embeddings_for_ids(cand_ids)
            ranked = self.reranker.rerank(
                query_id or "", cand_ids, cand_embs, joint_emb, topk=K
            )
            return [(r[0], r[1]) for r in ranked]
        return hits[:K]

    # -- predict (model.py:491-582) -----------------------------------------------

    def predict(
        self,
        image: np.ndarray,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        K: int = 5,
        threshold: Optional[float] = None,
        top_k_labels: int = 5,
        query_id: Optional[str] = None,
        retrieve: bool = True,
        explain: bool = False,
        explain_targets: Optional[Sequence[int]] = None,
    ) -> Dict[str, Any]:
        thr = self.threshold if threshold is None else threshold
        thr = np.asarray(thr)
        out = self.embed(image, input_ids, attention_mask)
        probs = out["probs"]
        B = probs.shape[0]
        results: Dict[str, Any] = {
            "probs": probs,
            "joint_emb": out["joint_emb"],
            "predicted": [],
            "top_labels": [],
        }
        for b in range(B):
            p = probs[b]
            pred_idx = np.where(p >= thr)[0]
            order = np.argsort(-p)[:top_k_labels]
            results["predicted"].append(
                [(self.label_names[i], float(p[i])) for i in pred_idx]
            )
            results["top_labels"].append(
                [(self.label_names[i], float(p[i])) for i in order]
            )
        if retrieve and self.retriever is not None:
            # query_id names ONE gallery row; applying it (self-exclusion +
            # reranker keying) to every element of a batch would corrupt
            # the other samples' results
            qid = query_id if B == 1 else None
            results["retrieval"] = [
                self.retrieve(out["joint_emb"][b], K=K, query_id=qid)
                for b in range(B)
            ]
        if explain:
            targets = explain_targets
            if targets is None:
                if B == 1:
                    targets = np.argsort(-probs[0])[:top_k_labels].tolist()
                else:
                    # per-sample auto targets: one (B,) vector per rank
                    # slot, so every sample is explained for its OWN
                    # top-k classes (keyed "rank{j}" in per_target)
                    order = np.argsort(-probs, axis=1)[:, :top_k_labels]
                    targets = [order[:, j] for j in range(order.shape[1])]
            results["explanation"] = self.explainer.explain(
                image, input_ids, attention_mask, targets
            )
        return results

    # -- explain -----------------------------------------------------------------

    @property
    def explainer(self) -> ExplanationEngine:
        if self._explainer is None:  # lazy, like the reference (model.py:628-635)
            self._explainer = ExplanationEngine(self.model, self.params)
        return self._explainer

    def explain(
        self,
        image: np.ndarray,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        targets: Sequence[int],
        **kw,
    ) -> Dict[str, Any]:
        return self.explainer.explain(image, input_ids, attention_mask, targets, **kw)

    # -- construction from a trained run -------------------------------------

    @classmethod
    def from_run_dir(cls, run_dir: str) -> "MMRPredictor":
        """Load a predictor from a training-run directory (checkpoint,
        gallery, reranker inputs) — the reference's inference constructor
        (model.py:281-309) as a one-liner."""
        from mmrp_tpu.serve.runner import build_demo_context

        return build_demo_context(run_dir)["predictor"]
