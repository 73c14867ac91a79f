"""Portable serialized serving programs (jax.export) — deployment packaging.

The reference deploys by shipping the Python model code plus a torch
checkpoint and re-tracing at startup (reference: src/web/app.py:99-142
rebuilds the full module tree per process). The TPU-native equivalent is an
ahead-of-time artifact: the jitted serving forward is lowered to StableHLO
with ``jax.export``, serialized together with the trained parameters and
metadata into ONE ``.npz`` file, and reloaded anywhere without model code,
config reconstruction, or re-tracing — only an XLA backend.

Design points:

- **Bucketed batches**: XLA serving wants static shapes, so the artifact
  carries one program per batch bucket (default 1/8/32); the loader pads a
  request up to the smallest bucket that fits and trims the outputs.
- **Per-platform programs**: a program lowered with TPU Pallas kernels
  embeds tpu custom-calls a CPU backend cannot run, so each requested
  platform gets its own lowering (``use_pallas`` off for cpu). A CPU-only
  build host can package ``tpu`` programs too — cross-lowering works —
  but the Pallas kernel gate keys on the RUNTIME backend
  (models/swin.py::_pallas_backend), so such programs carry the portable
  XLA formulation; packaging the fused Pallas serving stack requires
  lowering in a TPU-visible process.
- The forward matches ``MMRPredictor``'s serving outputs
  (probs / joint_emb / img_emb / txt_emb), so a loaded artifact is a
  drop-in embed+predict engine for the gallery/rerank stack.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

_SEP = "::"  # artifact key namespacing (flax module names never contain it)


def _flatten_params(params) -> Dict[str, np.ndarray]:
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = []
        for p in path:
            k = getattr(p, "key", None)
            keys.append(str(k) if k is not None else str(p))
        flat[_SEP.join(keys)] = np.asarray(leaf)
    return flat


def _unflatten_params(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        node = tree
        parts = key.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _serving_fn(model):
    # ONE shared definition with the live predictor — artifacts cannot
    # diverge from live serving outputs (api.py::serving_forward).
    from mmrp_tpu.api import serving_forward

    return serving_forward(model)


def export_serving_programs(
    model,
    params,
    *,
    image_size: int,
    text_len: int,
    batch_sizes: Sequence[int] = (1, 8, 32),
    platforms: Sequence[str] = ("cpu",),
    mesh=None,
) -> Dict[str, bytes]:
    """Lower + serialize the serving forward per (platform, batch bucket).

    The caller supplies a model built for the TARGET platform (Pallas
    kernels on for tpu, off for cpu) — pass one platform per call when the
    model config differs. Returns ``{"{platform}{_SEP}{batch}": bytes}``.

    With ``mesh`` (a 1-axis ``jax.sharding.Mesh``), programs are exported
    data-parallel over that axis: params replicated, batch dim sharded —
    a multi-chip serving pod runs the artifact directly (load with the
    same-size mesh). Batch buckets must be divisible by the mesh size.
    """
    import jax
    from jax import export as jexport

    fn = _serving_fn(model)
    jit_kwargs: Dict[str, Any] = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        (axis,) = mesh.axis_names
        repl = NamedSharding(mesh, P())
        row = NamedSharding(mesh, P(axis))
        jit_kwargs = dict(
            in_shardings=(
                jax.tree_util.tree_map(lambda _: repl, params),
                row, row, row,
            ),
            out_shardings=row,  # prefix: every output row-sharded
        )
        bad = [b for b in batch_sizes if b % mesh.size]
        if bad:
            raise ValueError(
                f"batch buckets {bad} not divisible by mesh size {mesh.size}"
            )
    p_specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), params
    )
    out: Dict[str, bytes] = {}
    for b in sorted(set(int(x) for x in batch_sizes)):
        img = jax.ShapeDtypeStruct((b, image_size, image_size, 3), np.float32)
        ids = jax.ShapeDtypeStruct((b, text_len), np.int32)
        mask = jax.ShapeDtypeStruct((b, text_len), np.int32)
        exp = jexport.export(jax.jit(fn, **jit_kwargs), platforms=list(platforms))(
            p_specs, img, ids, mask
        )
        # one multi-platform lowering per bucket: store the blob ONCE under
        # a combined "cpu+tpu" key (the loader matches platform membership)
        out[f"{'+'.join(platforms)}{_SEP}{b}"] = exp.serialize()
    return out


def save_artifact(
    path,
    programs: Dict[str, bytes],
    params,
    meta: Dict[str, Any],
) -> None:
    """One-file artifact: programs + parameters + metadata."""
    arrays: Dict[str, np.ndarray] = {
        f"prog{_SEP}{k}": np.frombuffer(v, dtype=np.uint8)
        for k, v in programs.items()
    }
    for k, v in _flatten_params(params).items():
        arrays[f"p{_SEP}{k}"] = v
    arrays["meta"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    tmp = Path(str(path) + ".tmp.npz")
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    tmp.replace(path)


class ExportedPredictor:
    """Load an artifact and serve embed+predict without any model code.

    ``call`` pads the request to the smallest batch bucket that fits (the
    largest bucket is used, chunked, for oversize requests) and trims the
    outputs back to the true row count.
    """

    def __init__(self, programs, params, meta, mesh=None):
        self._programs = programs  # {batch: deserialized Exported}
        self._params = params
        self.meta = meta
        self.batch_sizes = sorted(programs)
        self._mesh = mesh
        nr = {p.nr_devices for p in programs.values()}
        if nr - {1} and mesh is None:
            raise ValueError(
                f"artifact programs span {sorted(nr)} devices — pass a "
                "same-size mesh to load()"
            )
        if mesh is not None and nr != {mesh.size}:
            # fail here with the real cause, not deep inside call_exported
            raise ValueError(
                f"mesh size {mesh.size} does not match the artifact's "
                f"program device count {sorted(nr)}"
            )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            (axis,) = mesh.axis_names
            self._row = NamedSharding(mesh, P(axis))
            import jax

            self._params = jax.device_put(
                self._params, NamedSharding(mesh, P())
            )

    @classmethod
    def load(cls, path, platform: Optional[str] = None,
             mesh=None) -> "ExportedPredictor":
        import jax
        from jax import export as jexport

        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(bytes(z["meta"].tobytes()).decode("utf-8"))
            flat = {}
            progs_raw: Dict[str, bytes] = {}
            for k in z.files:
                if k.startswith(f"p{_SEP}"):
                    flat[k[len(f"p{_SEP}"):]] = z[k]
                elif k.startswith(f"prog{_SEP}"):
                    progs_raw[k[len(f"prog{_SEP}"):]] = z[k].tobytes()
        plat = platform or jax.default_backend()
        # program keys are "{plat}[+plat2...]::{batch}" — a multi-platform
        # lowering is stored once and matched by membership here
        avail = sorted({k.split(_SEP)[0] for k in progs_raw})
        matching = {
            k: v for k, v in progs_raw.items()
            if plat in k.split(_SEP)[0].split("+")
        }
        if not matching:
            raise ValueError(
                f"artifact has no programs for platform {plat!r} "
                f"(available: {avail}); re-export with --platforms {plat}"
            )
        programs = {
            int(k.split(_SEP)[1]): jexport.deserialize(bytearray(v))
            for k, v in matching.items()
        }
        params = jax.tree_util.tree_map(
            jax.numpy.asarray, _unflatten_params(flat)
        )
        return cls(programs, params, meta, mesh=mesh)

    def _run_bucket(self, b: int, image, ids, mask) -> Tuple[np.ndarray, ...]:
        n = image.shape[0]
        pad = b - n
        if pad:
            image = np.concatenate([image, np.zeros((pad,) + image.shape[1:],
                                                    image.dtype)])
            ids = np.concatenate([ids, np.zeros((pad,) + ids.shape[1:],
                                                ids.dtype)])
            mask = np.concatenate([mask, np.ones((pad,) + mask.shape[1:],
                                                 mask.dtype)])
        if self._mesh is not None:
            import jax

            image, ids, mask = (
                jax.device_put(x, self._row) for x in (image, ids, mask)
            )
        outs = self._programs[b].call(self._params, image, ids, mask)
        return {k: np.asarray(v)[:n] for k, v in outs.items()}

    def call(self, image, ids, mask) -> Dict[str, np.ndarray]:
        image = np.asarray(image, np.float32)
        ids = np.asarray(ids, np.int32)
        mask = np.asarray(mask, np.int32)
        n = image.shape[0]
        fit = [b for b in self.batch_sizes if b >= n]
        if fit:
            return self._run_bucket(fit[0], image, ids, mask)
        # oversize request: chunk through the largest bucket
        b = self.batch_sizes[-1]
        parts = [
            self._run_bucket(b, image[i:i + b], ids[i:i + b], mask[i:i + b])
            for i in range(0, n, b)
        ]
        return {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}


def export_run(
    run_dir: str,
    out_path: str,
    *,
    batch_sizes: Sequence[int] = (1, 8, 32),
    platforms: Sequence[str] = ("cpu",),
    data_dir: Optional[str] = None,
) -> Dict[str, Any]:
    """Package a trained run directory into a serving artifact.

    Rebuilds the exact trained model shape the way serving does
    (serve/runner.py::build_demo_context), then exports per-platform
    programs. ``tpu`` programs embed Pallas custom-calls and must be
    lowered with Pallas enabled; ``cpu`` programs disable it.
    """
    from mmrp_tpu.serve.runner import build_demo_context

    ctx = build_demo_context(run_dir, data_dir=data_dir)
    predictor = ctx["predictor"]
    model, params = predictor.model, predictor.params
    cfg = model.config
    programs: Dict[str, bytes] = {}
    for plat in platforms:
        use_pallas = plat == "tpu"
        if cfg.swin.use_pallas != use_pallas:
            from dataclasses import replace

            from mmrp_tpu.models.multimodal import MultiModalRetrievalModel

            m = MultiModalRetrievalModel(
                replace(cfg, swin=replace(cfg.swin, use_pallas=use_pallas)),
                dtype=model.dtype,
            )
        else:
            m = model
        programs.update(export_serving_programs(
            m, params,
            image_size=cfg.swin.img_size,
            text_len=cfg.max_text_len,
            batch_sizes=batch_sizes,
            platforms=(plat,),
        ))
    meta = {
        "label_names": list(predictor.label_names),
        "threshold": np.asarray(predictor.threshold).tolist(),
        "image_size": cfg.swin.img_size,
        "text_len": cfg.max_text_len,
        "batch_sizes": sorted(set(int(b) for b in batch_sizes)),
        "platforms": list(platforms),
        "outputs": ["probs", "joint_emb", "img_emb", "txt_emb"],
    }
    save_artifact(out_path, programs, params, meta)
    return meta
