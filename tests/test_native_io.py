import numpy as np
import pytest

from mmrp_tpu.data import dicom as D
from mmrp_tpu.data import native as N

pytestmark = pytest.mark.skipif(
    not N.available(), reason="native library not built (make -C native)"
)


def _blob(rng, h=96, w=80, **kw):
    arr = (rng.random((h, w)) * 3000).astype(np.uint16)
    return arr, D.write_dicom(None, arr, **kw)


def test_native_matches_python_preprocess(rng):
    _, blob = _blob(rng, window_center=1500, window_width=2500)
    pp = D.DICOMImagePreprocessor(output_size=(64, 64), use_native=False)
    py = pp.load(blob)[0]
    nat = N.preprocess(blob, out_hw=(64, 64))
    # within one u8 quantum (resize edge conventions differ slightly)
    assert np.abs(py - nat).max() < 0.01


def test_native_decode_raw_exact(rng):
    arr, blob = _blob(rng)
    raw = N.decode_raw(blob)
    np.testing.assert_allclose(raw, arr.astype(np.float32))


def test_native_rescale_applied(rng):
    arr, blob = _blob(rng)
    blob2 = D.write_dicom(None, arr, rescale_slope=2.0, rescale_intercept=-100.0)
    raw = N.decode_raw(blob2)
    np.testing.assert_allclose(raw, arr.astype(np.float32) * 2.0 - 100.0)


def test_native_batch_pool(rng):
    blobs = [D.write_dicom(None, (rng.random((48, 48)) * 900).astype(np.uint16))
             for _ in range(16)]
    out, status = N.preprocess_batch(blobs, out_hw=(32, 32))
    assert out.shape == (16, 32, 32)
    assert (status == 0).all()
    assert np.isfinite(out).all()


def test_native_bad_input_status(rng):
    _, good = _blob(rng)
    out, status = N.preprocess_batch([good, b"not a dicom" * 20], out_hw=(16, 16))
    assert status[0] == 0 and status[1] != 0


def test_native_mono1_inversion(rng):
    arr = (rng.random((32, 32)) * 1000).astype(np.uint16)
    b2 = D.write_dicom(None, arr, photometric="MONOCHROME2",
                       window_center=500, window_width=1000)
    b1 = D.write_dicom(None, arr, photometric="MONOCHROME1",
                       window_center=500, window_width=1000)
    a2 = N.preprocess(b2, out_hw=(32, 32))
    a1 = N.preprocess(b1, out_hw=(32, 32))
    assert np.corrcoef(a1.ravel(), a2.ravel())[0, 1] < -0.9


def test_preprocessor_native_fast_path(rng):
    _, blob = _blob(rng, window_center=1500, window_width=2500)
    pp_nat = D.DICOMImagePreprocessor(output_size=(64, 64), use_native=True)
    pp_py = D.DICOMImagePreprocessor(output_size=(64, 64), use_native=False)
    a = pp_nat.load(blob)
    b = pp_py.load(blob)
    assert a.shape == b.shape == (3, 64, 64)
    assert np.abs(a - b).max() < 0.02
