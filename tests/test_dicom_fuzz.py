"""Fuzz the DICOM decode path with corrupted inputs.

The serving upload path feeds user-supplied bytes straight into the
parser (serve/app.py multipart -> DICOMImagePreprocessor.load), so every
malformed input must end in DicomParseError/ValueError — never an
unhandled IndexError/struct.error/OverflowError, a crash, or a hang.
Mutations are seeded and deterministic. The native C++ decoder
(native/mmrp_io.cpp) must return a nonzero status (surfaced as
ValueError) on the same corpus without bringing the process down.
"""

from __future__ import annotations

import numpy as np
import pytest

from mmrp_tpu.data import native
from mmrp_tpu.data.dicom import (
    DicomParseError,
    DICOMImagePreprocessor,
    read_dicom,
    write_dicom,
)


@pytest.fixture(scope="module")
def base_blob():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 4096, (64, 64)).astype(np.uint16)
    return write_dicom(None, arr, window_center=2048.0, window_width=3000.0)


def _mutations(blob: bytes, rng: np.random.Generator):
    """Deterministic corpus: truncations, byte flips, splices, garbage."""
    n = len(blob)
    # truncations at structural boundaries and random offsets
    for cut in [0, 1, 131, 132, 140, n // 2, n - 1]:
        yield blob[:cut]
    for _ in range(40):
        yield blob[: int(rng.integers(1, n))]
    # single- and multi-byte flips (headers are early; hit them often)
    for _ in range(120):
        b = bytearray(blob)
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(0, min(n, 400)))
            b[pos] = int(rng.integers(0, 256))
        yield bytes(b)
    for _ in range(40):
        b = bytearray(blob)
        pos = int(rng.integers(0, n))
        b[pos] = int(rng.integers(0, 256))
        yield bytes(b)
    # length-field blowups: overwrite 4 bytes after the pixel-data tag area
    for _ in range(20):
        b = bytearray(blob)
        pos = int(rng.integers(128, n - 4))
        b[pos : pos + 4] = rng.integers(0, 256, 4).astype(np.uint8).tobytes()
        yield bytes(b)
    # pure garbage
    for size in (0, 7, 133, 1024):
        yield rng.integers(0, 256, size).astype(np.uint8).tobytes()


def test_python_parser_fails_cleanly(base_blob):
    rng = np.random.default_rng(11)
    ok = bad = 0
    for blob in _mutations(base_blob, rng):
        try:
            dcm = read_dicom(blob)
            # surviving mutants must still produce a well-formed array
            assert dcm.pixel_array.ndim == 2
            ok += 1
        except (DicomParseError, ValueError):
            bad += 1
    # the corpus must actually exercise the failure paths
    assert bad > 50, (ok, bad)


def test_preprocessor_python_path_fails_cleanly(base_blob):
    pre = DICOMImagePreprocessor(use_native=False)
    rng = np.random.default_rng(13)
    for blob in list(_mutations(base_blob, rng))[:80]:
        try:
            out = pre.load(blob)
            assert out.shape == (3, 224, 224)
            assert np.isfinite(out).all()
        except (DicomParseError, ValueError):
            pass


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_decoder_fails_cleanly(base_blob):
    rng = np.random.default_rng(17)
    ok = bad = 0
    for blob in _mutations(base_blob, rng):
        try:
            out = native.preprocess(blob)
            assert out.shape == (224, 224)
            assert np.isfinite(out).all()
            ok += 1
        except ValueError:
            bad += 1
    assert bad > 50, (ok, bad)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_batch_survives_mixed_corruption(base_blob):
    rng = np.random.default_rng(19)
    blobs = [base_blob] + list(_mutations(base_blob, rng))[:31]
    out, status = native.preprocess_batch(blobs)
    assert status[0] == 0
    assert out.shape == (len(blobs), 224, 224)
    assert np.isfinite(out[status == 0]).all()
