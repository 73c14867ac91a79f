"""Flagship embed bench: Swin-B + ClinicalBERT dims (the parity model,
reference src/Model/fusion.py:92) via bench.bench_embed's chained-scan
methodology. Writes/merges BENCH_FLAGSHIP.json, which bench.py folds into
BENCH_DETAILS.json.

One model build per process (CLAUDE.md): run once per text length,
  BENCH_SWIN=base BENCH_TEXT_LEN=128 python tools/bench_flagship.py
  BENCH_SWIN=base BENCH_TEXT_LEN=512 python tools/bench_flagship.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    os.environ.setdefault("BENCH_SWIN", "base")
    text_len = int(os.environ.get("BENCH_TEXT_LEN", "128"))

    import jax

    import bench

    on_tpu = jax.default_backend() == "tpu"
    batch = int(os.environ.get("BENCH_BATCH", "64" if on_tpu else "2"))
    iters = int(os.environ.get("BENCH_ITERS", "10" if on_tpu else "2"))
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"

    throughput, frac = bench.bench_embed(batch, text_len, use_pallas, iters)
    row = {
        "swin": os.environ["BENCH_SWIN"],
        "text_len": text_len,
        "batch": batch,
        "iters": iters,
        "attention_path": "pallas" if use_pallas else "xla",
        "quant": os.environ.get("BENCH_QUANT", "int8"),
        "pairs_per_sec": throughput,
        "implied_peak_frac": frac,
        "backend": jax.default_backend(),
        "method": "chained-scan, scalar fetch (see bench.py)",
    }
    out = REPO / "BENCH_FLAGSHIP.json"
    existing = {}
    if out.exists():
        try:
            existing = json.loads(out.read_text())
        except ValueError:
            existing = {}
    key = f"{row['swin']}_L{text_len}_{row['attention_path']}"
    if row["quant"] not in ("int8",):  # historical rows were all int8-serve
        key += f"_{row['quant']}"
    existing[key] = row
    out.write_text(json.dumps(existing, indent=1))
    print(json.dumps(row, indent=1))


if __name__ == "__main__":
    main()
