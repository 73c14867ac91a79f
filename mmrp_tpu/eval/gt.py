"""Retrieval ground truth: label-overlap relevance sets.

Parity with the reference GT builder (reference:
src/Helpers/contructGT.py:18-117): for every query id, the relevant set is
every gallery id sharing at least ``min_overlap`` positive labels (Jaccard
or count), computed for the two protocols the eval uses — generalization
(test->test) and historical (test->train).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Mapping, Optional, Sequence

import numpy as np


def build_label_overlap_gt(
    query_ids: Sequence[str],
    query_labels: np.ndarray,  # (Q, C) binary
    gallery_ids: Sequence[str],
    gallery_labels: np.ndarray,  # (G, C)
    min_shared: int = 1,
    exclude_self: bool = True,
    out_path: Optional[str] = None,
) -> Dict[str, List[str]]:
    Q = np.asarray(query_labels, bool)
    G = np.asarray(gallery_labels, bool)
    shared = Q.astype(np.int32) @ G.astype(np.int32).T  # (Q, G) shared positives
    gt: Dict[str, List[str]] = {}
    garr = np.asarray(gallery_ids)
    for i, qid in enumerate(query_ids):
        rel = shared[i] >= min_shared
        ids = garr[rel].tolist()
        if exclude_self and qid in ids:
            ids.remove(qid)
        gt[qid] = ids
    if out_path:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        Path(out_path).write_text(json.dumps(gt))
    return gt
