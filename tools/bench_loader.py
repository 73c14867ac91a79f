"""Input-pipeline throughput bench: native C++ decode vs pure Python.

The reference feeds the GPU with pydicom + PIL + torchvision inside
``DataLoader(num_workers=4)`` (reference src/DataHandler/tensorDICOM.py:
112-158, dataLoader.py:51-62). Our TPU input hosts run the same
decode -> window -> resize -> normalize chain either in pure numpy
(mmrp_tpu/data/dicom.py) or through the native C++ runtime
(native/mmrp_io.cpp via ctypes, mmrp_tpu/data/native.py). This bench
measures both on identical synthetic CXR-sized DICOM blobs so the native
runtime's speedup is a recorded number, not a claim.

All work is host-CPU; no TPU/XLA involved. NOTE the build box has ONE
CPU core (CLAUDE.md), so the worker-pool rows measure dispatch overhead,
not parallel speedup — per-image single-thread cost is the portable
number (real input hosts scale it by their core count).

Usage: python tools/bench_loader.py   # writes/merges BENCH_LOADER.json
Env: LOADER_N (images, default 64), LOADER_PX (source size, default 1024).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def make_blobs(n: int, px: int, rng: np.random.Generator) -> list:
    """Synthetic 16-bit MONOCHROME2 DICOMs with explicit window tags,
    CXR-like size (OpenI sources are ~1-2.5k px)."""
    from mmrp_tpu.data.dicom import write_dicom

    blobs = []
    for _ in range(n):
        arr = rng.integers(0, 4096, (px, px)).astype(np.uint16)
        blobs.append(
            write_dicom(None, arr, window_center=2048.0, window_width=3000.0)
        )
    return blobs


def time_loop(fn, blobs, repeats: int = 3) -> float:
    """Best-of-repeats wall time for one full pass over ``blobs`` (s)."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn(blobs)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from mmrp_tpu.data import native
    from mmrp_tpu.data.dicom import DICOMImagePreprocessor

    n = int(os.environ.get("LOADER_N", "64"))
    px = int(os.environ.get("LOADER_PX", "1024"))
    rng = np.random.default_rng(0)
    blobs = make_blobs(n, px, rng)
    mb_per_img = len(blobs[0]) / 1e6

    rows = {
        "n_images": n,
        "source_px": px,
        "mb_per_image": round(mb_per_img, 3),
        "host_cores": os.cpu_count(),
        "method": "best-of-3 full passes; decode+window+resize(224)+normalize "
                  "per image, identical synthetic 16-bit DICOM blobs",
    }

    pre_py = DICOMImagePreprocessor(use_native=False)
    dt = time_loop(lambda bs: [pre_py.load(b) for b in bs], blobs)
    rows["python_images_per_sec"] = n / dt
    rows["python_ms_per_image"] = dt / n * 1e3

    if native.available():
        dt = time_loop(lambda bs: [native.preprocess(b) for b in bs], blobs)
        rows["native_images_per_sec"] = n / dt
        rows["native_ms_per_image"] = dt / n * 1e3
        dt = time_loop(lambda bs: native.preprocess_batch(bs), blobs)
        rows["native_batch_images_per_sec"] = n / dt
        rows["native_batch_ms_per_image"] = dt / n * 1e3
        rows["native_speedup_vs_python"] = round(
            rows["native_images_per_sec"] / rows["python_images_per_sec"], 2
        )
    else:
        rows["native"] = "library not built (make -C native)"

    out_path = REPO / "BENCH_LOADER.json"
    existing = {}
    if out_path.exists():
        try:
            existing = json.loads(out_path.read_text())
        except ValueError:
            existing = {}
    # merge: a rerun without the native lib must not erase the recorded
    # native numbers (BASELINE.md cites them)
    existing.update(rows)
    out_path.write_text(json.dumps(existing, indent=1))
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
