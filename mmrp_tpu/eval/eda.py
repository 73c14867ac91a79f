"""Dataset EDA + data-quality checks.

Covers the reference's EDA scripts (reference: src/Evaluate/
EDA_before_split.py, EDA_after_split.py, dataEDAnLabeledCheck.py,
finalOutputDataEDA.py, data_phrase_check.py): label prevalence,
co-occurrence, report-length stats, zero-label filtering, per-split
distribution comparison, and LLM-verification delta analysis.
"""

from __future__ import annotations

import json
from collections import Counter
from pathlib import Path
from typing import Dict, List, Mapping, Optional, Sequence

import numpy as np


def label_prevalence(labels: np.ndarray, names: Sequence[str]) -> Dict[str, float]:
    L = np.asarray(labels)
    return {n: float(L[:, i].mean()) for i, n in enumerate(names)}


def label_cooccurrence(labels: np.ndarray) -> np.ndarray:
    L = np.asarray(labels, np.float64)
    return L.T @ L


def report_length_stats(texts: Sequence[str]) -> Dict[str, float]:
    lens = np.array([len(t.split()) for t in texts])
    return {
        "mean": float(lens.mean()) if len(lens) else 0.0,
        "p50": float(np.percentile(lens, 50)) if len(lens) else 0.0,
        "p95": float(np.percentile(lens, 95)) if len(lens) else 0.0,
        "max": int(lens.max()) if len(lens) else 0,
    }


def drop_zero_label_records(records: Sequence[dict]) -> List[dict]:
    """Zero-label rows are dropped before splitting (EDA_before_split.py)."""
    return [r for r in records if any(r["labels"])]


def eda_before_split(records: Sequence[dict], names: Sequence[str],
                     out_path: Optional[str] = None) -> Dict:
    labels = np.stack([np.asarray(r["labels"]) for r in records])
    report = {
        "n_records": len(records),
        "n_zero_label": int((labels.sum(1) == 0).sum()),
        "prevalence": label_prevalence(labels, names),
        "report_length": report_length_stats([r["report_text"] for r in records]),
        "mean_labels_per_record": float(labels.sum(1).mean()),
    }
    if out_path:
        Path(out_path).write_text(json.dumps(report, indent=1))
    return report


def eda_after_split(
    splits: Mapping[str, Sequence[str]],
    records_by_id: Mapping[str, dict],
    names: Sequence[str],
    out_path: Optional[str] = None,
) -> Dict[str, Dict[str, float]]:
    """Per-split prevalence comparison (EDA_after_split.py)."""
    out: Dict[str, Dict[str, float]] = {}
    for split, ids in splits.items():
        labels = np.stack([np.asarray(records_by_id[i]["labels"]) for i in ids])
        out[split] = label_prevalence(labels, names)
    if out_path:
        Path(out_path).write_text(json.dumps(out, indent=1))
    return out


def verification_delta(
    before: Sequence[dict], after: Sequence[dict], names: Sequence[str]
) -> Dict[str, int]:
    """How many labels the LLM pass added/removed (finalOutputDataEDA.py)."""
    b = np.stack([np.asarray(r["labels"]) for r in before])
    a = np.stack([np.asarray(r["labels"]) for r in after])
    return {
        "added": int(((a == 1) & (b == 0)).sum()),
        "removed": int(((a == 0) & (b == 1)).sum()),
        "unchanged_records": int((a == b).all(axis=1).sum()),
        "changed_records": int((a != b).any(axis=1).sum()),
    }


def phrase_match_check(
    records: Sequence[dict], labeler, n_samples: int = 20, seed: int = 0
) -> List[dict]:
    """Spot-check which phrases fired per report (data_phrase_check.py)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(records), size=min(n_samples, len(records)), replace=False)
    out = []
    for i in idx:
        rec = records[int(i)]
        ms = labeler.matches(rec["report_text"])
        out.append(
            {
                "id": rec["id"],
                "matches": [
                    {"group": m.group, "phrase": m.phrase, "negated": m.negated}
                    for m in ms
                ],
            }
        )
    return out
