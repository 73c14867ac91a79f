"""Demo-context builder: wire a trained run directory into MMRPredictor.

Equivalent of the reference's init_heavy_resources (reference:
src/web/app.py:99-142): loads tokenizer, model checkpoint, train-gallery
retrieval engine, reranker inputs, and the DICOM preprocessor.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

import numpy as np


def load_rerank_inputs(run_dir, data_dir=None, warn=True):
    """Reranker inputs from a run: per-record labels (records_cache.json)
    and KG node embeddings. Shared by serving and ``cli eval-ret``.

    records_cache.json lives in the DATA pipeline's output dir — pass
    ``data_dir`` when the run dir is not nested inside it (the
    ``run.parent`` fallback matches the ``cli train --data D --out
    D/train`` layout). A missing cache is warned about loudly: with empty
    ``labels_by_id`` the reranker's label-overlap term silently vanishes
    and ablation variants collapse toward the baseline.
    """
    run = Path(run_dir)
    candidates = [Path(data_dir)] if data_dir else [run.parent, run]
    labels_by_id: Dict[str, Any] = {}
    records_by_id: Dict[str, Any] = {}
    for c in candidates:
        p = c / "records_cache.json"
        if p.exists():
            recs = json.loads(p.read_text())["records"]
            labels_by_id = {r["id"]: np.asarray(r["labels"]) for r in recs}
            records_by_id = {r["id"]: r for r in recs}
            break
    if warn and not labels_by_id:
        print(
            "[serve] WARNING: records_cache.json not found under "
            f"{[str(c) for c in candidates]} — the reranker's label-overlap "
            "term is disabled (point --data at the data pipeline output)"
        )
    kg_kwargs: Dict[str, Any] = {}
    kg_dir = run / "kg"
    # both files or neither: KGTrainer.save only writes node2id.json when
    # given node_names, and an embeddings table without the id map is
    # unusable — serve without the KG term instead of 500ing per request
    if ((kg_dir / "node_embeddings.npy").exists()
            and (kg_dir / "node2id.json").exists()):
        kg_kwargs = dict(
            kg_node_embeddings=np.load(kg_dir / "node_embeddings.npy"),
            kg_node2id=json.loads((kg_dir / "node2id.json").read_text()),
        )
    elif (kg_dir / "node_embeddings.npy").exists():
        print(
            "[serve] WARNING: kg/node_embeddings.npy present but "
            "node2id.json missing — KG rerank term disabled"
        )
    return labels_by_id, records_by_id, kg_kwargs


def build_demo_context(run_dir: str, data_dir: str = None) -> Dict[str, Any]:
    import jax

    from mmrp_tpu.api import MMRPredictor
    from mmrp_tpu.config import Config
    from mmrp_tpu.data.dicom import DICOMImagePreprocessor
    from mmrp_tpu.data.tokenizer import WordPieceTokenizer
    from mmrp_tpu.labels import LABEL_COLS
    from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
    from mmrp_tpu.retrieval.gallery import RetrievalEngine
    from mmrp_tpu.retrieval.rerank import Reranker
    from mmrp_tpu.utils.checkpoint import CheckpointManager

    run = Path(run_dir)
    cfg_path = run / "config.yaml"
    cfg = Config.load(str(cfg_path)) if cfg_path.exists() else Config()

    tok = WordPieceTokenizer.from_vocab_file(str(run / "vocab.txt"))

    # rebuild the EXACT trained model shape. config.yaml alone is not
    # enough when training pinned the text tower to a ported checkpoint
    # (pretrained_bert) or ran flagship=True — train/runner.py snapshots
    # the resolved shape into model_config.json; without honoring it the
    # orbax restore below shape-mismatches and the fallback would serve
    # random weights against a real-model gallery.
    text_override, flagship = None, False
    mc_path = run / "model_config.json"
    if mc_path.exists():
        from mmrp_tpu.models.text_encoder import TextConfig

        mc = json.loads(mc_path.read_text())
        flagship = bool(mc.get("flagship", False))
        tdict = {k: v for k, v in mc.get("text", {}).items()
                 if k not in ("quant", "remat")}
        if tdict:
            text_override = TextConfig(**tdict)
    # int8_static serving: auto-pick the calibration artifact written by
    # `cli calibrate` when the config doesn't name one explicitly
    if (getattr(cfg, "serve_quant", "none") == "int8_static"
            and not getattr(cfg, "swin_act_amax_path", None)
            and (run / "swin_act_amax.json").exists()):
        cfg.swin_act_amax_path = str(run / "swin_act_amax.json")
    mm_cfg = MultiModalConfig.from_config(cfg, num_classes=len(LABEL_COLS),
                                          flagship=flagship,
                                          text_override=text_override)
    model = MultiModalRetrievalModel(mm_cfg)

    # parameter template for orbax restore
    import jax.numpy as jnp

    dummy = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
        jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
    )["params"]
    mgr = CheckpointManager(str(run / "joint" / "ckpt"))
    try:
        params = {"model": mgr.restore_best({"model": dummy})["model"]}
    except FileNotFoundError:
        params = {"model": dummy}  # no checkpoint yet — demo still functions
    except (ValueError, KeyError) as e:
        # a checkpoint EXISTS but does not fit the rebuilt model — that is
        # a config/shape bug, not a missing artifact; serving random
        # weights against a trained gallery would be silent garbage
        raise RuntimeError(
            f"checkpoint in {mgr.dir} does not match the model shape "
            f"rebuilt from {run}/config.yaml+model_config.json: {e}"
        ) from e

    retriever = None
    reranker = None
    labels_by_id, records_by_id, kg_kwargs = load_rerank_inputs(
        run, data_dir=data_dir
    )
    emb_p, ids_p = run / "train_embeddings.npy", run / "train_ids.json"
    if emb_p.exists() and ids_p.exists():
        retriever = RetrievalEngine.from_files(str(emb_p), str(ids_p))
        # attention pooling of label-node vectors when a LabelAttention
        # checkpoint exists (reference reranker.py:61-86)
        label_pooler = None
        la_ckpt = run / "label_attention.npz"
        if la_ckpt.exists() and "kg_node_embeddings" in kg_kwargs:
            from mmrp_tpu.kg.label_attention import LabelAttentionTrainer
            import jax.numpy as jnp

            la = LabelAttentionTrainer.from_checkpoint(
                str(la_ckpt), kg_kwargs["kg_node_embeddings"]
            )

            def label_pooler(vecs):  # (k, D) -> (D,)
                embs = jnp.asarray(vecs)[None]
                pooled, _ = la.model.apply(
                    la.params, embs, jnp.ones((1, embs.shape[1]))
                )
                return np.asarray(pooled[0])

        reranker = Reranker(
            alpha=cfg.rerank_alpha, beta=cfg.rerank_beta, gamma=cfg.rerank_gamma,
            labels_by_id=labels_by_id, label_names=LABEL_COLS,
            label_pooler=label_pooler, **kg_kwargs,
        )

    # per-class calibrated thresholds from the joint stage (reference
    # train.py:620-704 — predict-time thresholds, not a flat 0.5)
    th_path = run / "joint" / "thresholds.npy"
    threshold = np.load(th_path) if th_path.exists() else 0.5

    predictor = MMRPredictor(model, params, LABEL_COLS, retriever, reranker,
                             threshold=threshold)

    # records_by_id feeds the per-retrieved-item detail panel
    # (reference app.py:449-630)
    return {
        "predictor": predictor,
        "tokenizer": tok,
        "preprocessor": DICOMImagePreprocessor(
            output_size=(cfg.image_size, cfg.image_size)
        ),
        "max_length": min(cfg.text_dim, 512),
        "records_by_id": records_by_id,
    }
