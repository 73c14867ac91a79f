"""Checkpointing: full train-state save/restore + best-metric tracking.

The reference checkpoints model weights only and restarts training
stage-atomically (no optimizer state or mid-epoch resume anywhere —
SURVEY §5.4; src/Trainner/train.py:722-734, finetune_swin.py:934-937).
This framework checkpoints the FULL train state (params + optimizer +
step) through orbax, keeps per-epoch and best checkpoints, and writes the
best-metric JSON payloads the reference emits per stage
(best_multimodal_metrics.json etc., train.py:784-802).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np
import orbax.checkpoint as ocp


def save_param_tree(path: str, tree: Any) -> None:
    """Nested dict-of-arrays -> one compressed npz (keys are '/'-joined
    paths). Template-free counterpart of orbax for small param subtrees
    (stage artifacts like the finetuned Swin backbone)."""
    import jax

    flat = {}
    for kpath, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kpath
        )
        flat[key] = np.asarray(leaf)
    tmp = str(path) + ".tmp.npz"
    np.savez_compressed(tmp, **flat)
    Path(tmp).replace(path)


def load_param_tree(path: str) -> Dict[str, Any]:
    """Inverse of save_param_tree: npz -> nested dict of numpy arrays."""
    z = np.load(path)
    tree: Dict[str, Any] = {}
    for key in z.files:
        parts = key.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = z[key]
    return tree


class CheckpointManager:
    def __init__(self, ckpt_dir: str, max_to_keep: int = 3):
        self.dir = Path(ckpt_dir).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.dir / "steps",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._best_metric: Optional[float] = None
        best_file = self.dir / "best_metrics.json"
        if best_file.exists():
            try:
                self._best_metric = json.loads(best_file.read_text()).get("_best_value")
            except (json.JSONDecodeError, OSError):
                pass

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.dir}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    # -- best tracking (composite-metric early stopping support) -------------

    def update_best(
        self, value: float, state: Any, metrics: Dict[str, Any], higher_better: bool = True
    ) -> bool:
        """Save as best when the metric improves; persist the metric payload
        (reference best_*_metrics.json, train.py:784-802)."""
        better = (
            self._best_metric is None
            or (value > self._best_metric if higher_better else value < self._best_metric)
        )
        if not better:
            return False
        # write-then-swap: the previous best stays on disk (and
        # self._best_metric unchanged) until the new checkpoint is fully
        # durable, so a crash mid-save cannot lose the only best copy
        # while best_metrics.json still advertises its value
        best_dir = self.dir / "best"
        tmp_dir = self.dir / "best.tmp"
        if tmp_dir.exists():
            shutil.rmtree(tmp_dir)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(tmp_dir / "state", state)
        ckptr.wait_until_finished()
        if best_dir.exists():
            shutil.rmtree(best_dir)
        tmp_dir.replace(best_dir)
        (self.dir / "best_metrics.json").write_text(
            json.dumps({"_best_value": value, **metrics}, indent=1, default=float)
        )
        self._best_metric = value
        return True

    def restore_best(self, state_template: Any) -> Any:
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(self.dir / "best" / "state", state_template)

    def best_metrics(self) -> Optional[Dict[str, Any]]:
        p = self.dir / "best_metrics.json"
        return json.loads(p.read_text()) if p.exists() else None
