"""Classification evaluation on a data split.

Parity with reference eval_on_test (reference:
src/Evaluate/eval_on_test.py:40-208): per-class AUROC/AP/P/R/F1 with
macro/micro aggregates, thresholds either fixed or F1-optimal on the split,
a detailed per-class CSV, and a text report.
"""

from __future__ import annotations

import csv
import json
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

from mmrp_tpu.eval.metrics import find_best_thresholds, per_class_report
from mmrp_tpu.utils.logging import TeeLogger


def evaluate_classification(
    probs: np.ndarray,  # (N, C)
    labels: np.ndarray,  # (N, C)
    class_names: Sequence[str],
    thresholds: Optional[np.ndarray] = None,  # None -> F1-optimal on this split
    out_dir: Optional[str] = None,
    split_name: str = "test",
) -> Dict:
    if thresholds is None:
        thresholds = find_best_thresholds(labels, probs)
    report = per_class_report(labels, probs, np.asarray(thresholds), class_names)

    if out_dir:
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        csv_path = out / f"{split_name}_per_class.csv"
        with csv_path.open("w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(report["per_class"][0].keys()))
            w.writeheader()
            w.writerows(report["per_class"])
        log = TeeLogger(str(out / f"{split_name}_report.txt"))
        log(f"== classification report ({split_name}) ==")
        log(f"macro AUROC {report['macro_auroc']:.4f}  macro AP {report['macro_ap']:.4f}")
        log(f"macro F1 {report['macro_f1']:.4f}  micro F1 {report['micro_f1']:.4f}")
        (out / f"{split_name}_summary.json").write_text(
            json.dumps({k: v for k, v in report.items() if k != "per_class"},
                       indent=1, default=float)
        )
    return report
