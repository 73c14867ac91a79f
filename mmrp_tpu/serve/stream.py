"""Streaming embed+retrieve+predict at high batch (BASELINE config #5).

The reference has no batch-serving path — the Flask app handles one upload
at a time (reference src/web/app.py:254-638) and offline embedding dumps
are separate scripts. This driver runs the full production pipeline as a
stream: one jitted embed+classify program per batch (optionally SPMD over
a dp mesh), exact sharded-gallery top-K (retrieval/gallery.py), per-class
calibrated thresholds, with host-side prefetch overlapping the next
batch's preprocessing against device compute
(data/pipeline.py::PrefetchLoader).

Throughput accounting follows the chained-measurement caveat (CLAUDE.md):
wall-clock over the whole stream with a final blocking fetch — per-batch
timings are indicative only.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Iterable, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mmrp_tpu.ops.preprocess import window_normalize
from mmrp_tpu.retrieval.gallery import RetrievalEngine


class StreamingPipeline:
    def __init__(
        self,
        model,
        params: Dict[str, Any],
        engine: Optional[RetrievalEngine] = None,
        label_names: Optional[Sequence[str]] = None,
        threshold: "float | np.ndarray" = 0.5,
        K: int = 10,
        mesh=None,
    ):
        self.model = model
        self.params = params
        self.engine = engine
        self.label_names = list(label_names) if label_names else None
        self.threshold = np.asarray(threshold)
        self.K = K
        self.mesh = mesh
        # populated by run() once the stream is fully consumed; None
        # until then (a partially-consumed generator never sets it)
        self.stats: Optional[Dict[str, Any]] = None

        def fwd(params, image, ids, mask, wc=None, ww=None):
            # Compact ingestion, fused into the forward program. The
            # measured stream bottleneck on the tunneled dev chip is the
            # host->device image transfer (BENCH_STREAM.json: 128x224x224x3
            # f32 = 77 MB/batch over a ~45 MB/s link), so the serving
            # contract accepts the compact forms and finishes preprocessing
            # on device (ops/preprocess.py::window_normalize — the SAME
            # function the training path uses):
            #   uint8  (B,H,W[,1]) windowed pixels  -> 12x less transfer
            #   uint16 (B,H,W)     raw pixels at model resolution +
            #                      per-sample window center/width -> 6x
            #   float32 NHWC model-ready             -> pass-through
            # uint16 contract note: a client downsampling native-resolution
            # pixels must CLIP to the window range BEFORE resizing (clip
            # keeps uint16; bilinear blends of in-window values stay in
            # window, so the device clip is a no-op and the affine
            # normalize commutes with the resize) — that reproduces the
            # training clip->normalize->resize math exactly. Resizing
            # unclipped pixels blends out-of-window values into tissue
            # at boundaries and diverges from the offline path.
            x = image
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) / 255.0
            elif x.dtype == jnp.uint16:
                x = window_normalize(x.astype(jnp.float32), wc, ww)
            if x.dtype != image.dtype:  # compact path: normalize + 3-channel
                x = (x - 0.5) / 0.5
                if x.ndim == 3:
                    x = x[..., None]
                if x.shape[-1] == 1:
                    x = jnp.repeat(x, 3, axis=-1)
            from mmrp_tpu.api import serving_variables

            out = model.apply(
                serving_variables(params),
                x, ids, mask, deterministic=True,
            )
            return {
                "probs": jax.nn.sigmoid(out["logits"]),
                "joint_emb": out["joint_emb"],
            }

        self._fwd = jax.jit(fwd)

    _DEVICE_KEYS = ("image", "input_ids", "attention_mask",
                    "window_center", "window_width")

    def _put(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k in self._DEVICE_KEYS}
        if self.mesh is not None:
            from mmrp_tpu.data.pipeline import device_put_sharded_batch

            jb = device_put_sharded_batch(jb, self.mesh)
        return jb

    def _dispatch(self, batch: Dict[str, np.ndarray]):
        """Enqueue the device work for one batch WITHOUT a host sync:
        forward (probs + joint_emb) and, when an engine is attached, the
        gallery top-K on the device-resident embeddings. Returns the batch
        plus device futures for ``_finish`` to materialize."""
        jb = self._put(batch)
        out = self._fwd(self.params, jb["image"], jb["input_ids"],
                        jb["attention_mask"], jb.get("window_center"),
                        jb.get("window_width"))
        ret = (
            self.engine.retrieve_batch_device(out["joint_emb"], self.K)
            if self.engine is not None
            else None
        )
        return batch, out, ret

    def _finish(self, batch, out, ret) -> Dict[str, Any]:
        """Materialize a dispatched batch: numpy conversion (the only host
        sync), valid-row filtering, thresholded label sets, retrieval ids."""
        probs = np.asarray(out["probs"])
        emb = np.asarray(out["joint_emb"])
        keep = np.asarray(batch.get("valid", np.ones(probs.shape[0]))) > 0
        result: Dict[str, Any] = {
            "probs": probs[keep],
            "joint_emb": emb[keep],
            "ids": [i for i, k in zip(batch.get("ids", []), keep) if k]
            or None,
        }
        pred = probs[keep] >= self.threshold
        if self.label_names:
            result["predicted"] = [
                [self.label_names[j] for j in np.where(row)[0]] for row in pred
            ]
        else:
            result["predicted"] = [np.where(row)[0].tolist() for row in pred]
        if ret is not None:
            s, i = self.engine.finalize_batch(*ret)
            s, i = s[keep], i[keep]
            result["retrieval"] = [
                [(self.engine.ids[int(j)], float(sc)) for j, sc in zip(ri, rs)]
                for ri, rs in zip(i, s)
            ]
        return result

    def process_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """One batch -> probs, predicted label sets, joint embeddings,
        top-K retrieval (when an engine is attached)."""
        return self._finish(*self._dispatch(batch))

    def run(
        self, loader: Iterable[Dict[str, np.ndarray]], depth: int = 2
    ) -> Iterator[Dict[str, Any]]:
        """Stream the loader through the pipeline; yields per-batch results
        and records throughput in ``self.stats`` at the end.

        ``depth`` > 1 double-buffers: batch i+1's device work (forward +
        gallery top-K) is dispatched BEFORE batch i's results are pulled to
        the host, so the host-side materialization/tunnel latency overlaps
        device compute (JAX dispatch is async). depth=1 reproduces the
        strictly-serial behavior.
        """
        from collections import deque

        n = 0
        pending: deque = deque()
        t0 = time.perf_counter()
        for batch in loader:
            pending.append(self._dispatch(batch))
            if len(pending) >= max(1, depth):
                res = self._finish(*pending.popleft())
                n += len(res["probs"])
                yield res
        while pending:
            res = self._finish(*pending.popleft())
            n += len(res["probs"])
            yield res
        dt = time.perf_counter() - t0
        self.stats = {
            "pairs": n,
            "wall_s": dt,
            "pairs_per_sec": n / dt if dt > 0 else 0.0,
            "retrieval": self.engine is not None,
            "depth": depth,
            "mesh": str(self.mesh.shape) if self.mesh is not None else None,
        }


def run_stream(
    run_dir: str,
    data_dir: str,
    split: str = "test",
    out_dir: Optional[str] = None,
    K: int = 10,
    batch_size: Optional[int] = None,
) -> Dict[str, Any]:
    """CLI driver: load a trained run, stream a split through
    embed+retrieve+predict, write predictions + retrievals + stats."""
    from mmrp_tpu.data.dataset import ChestXRDataset, build_dataloader
    from mmrp_tpu.serve.runner import build_demo_context

    ctx = build_demo_context(run_dir, data_dir=data_dir)
    predictor = ctx["predictor"]
    run = Path(run_dir)
    data = Path(data_dir)

    records = json.loads((data / "records_cache.json").read_text())["records"]
    ids = set(json.loads(
        (data / "splits" / f"{split}_ids.json").read_text()))
    recs = [r for r in records if r["id"] in ids]
    from mmrp_tpu.config import Config

    cfg_path = run / "config.yaml"
    cfg = Config.load(str(cfg_path)) if cfg_path.exists() else Config()
    ds = ChestXRDataset(recs, ctx["tokenizer"], max_length=cfg.text_dim,
                        image_size=cfg.image_size)
    loader = build_dataloader(ds, batch_size or cfg.batch_size, shuffle=False,
                              num_workers=2)

    pipe = StreamingPipeline(
        predictor.model, predictor.params, predictor.retriever,
        predictor.label_names, predictor.threshold, K=K,
    )
    outp = Path(out_dir) if out_dir else run / f"stream_{split}"
    outp.mkdir(parents=True, exist_ok=True)
    with (outp / "predictions.jsonl").open("w") as fh:
        for res in pipe.run(loader):
            for b, rid in enumerate(res["ids"] or []):
                row = {
                    "id": rid,
                    "predicted": res["predicted"][b],
                    "probs": [round(float(p), 5) for p in res["probs"][b]],
                }
                if "retrieval" in res:
                    row["retrieval"] = res["retrieval"][b]
                fh.write(json.dumps(row) + "\n")
    (outp / "stream_stats.json").write_text(json.dumps(pipe.stats, indent=1))
    return pipe.stats
