import numpy as np
import pytest

from mmrp_tpu.data import dicom as D


def _synth(rng, h=64, w=48, dtype=np.uint16, **kw):
    arr = (rng.random((h, w)) * 4000).astype(dtype)
    blob = D.write_dicom(None, arr, **kw)
    return arr, blob


def test_roundtrip_uint16(rng):
    arr, blob = _synth(rng, window_center=2000, window_width=1000)
    dcm = D.read_dicom(blob)
    assert dcm.rows == 64 and dcm.columns == 48
    np.testing.assert_array_equal(dcm.pixel_array, arr)
    assert dcm.window_center == 2000
    assert dcm.window_width == 1000
    assert dcm.rescale_slope == 1.0


def test_roundtrip_uint8(rng):
    arr, blob = _synth(rng, dtype=np.uint8)
    dcm = D.read_dicom(blob)
    np.testing.assert_array_equal(dcm.pixel_array, arr)


def test_roundtrip_int16_signed(rng):
    arr = (rng.random((32, 32)) * 2000 - 1000).astype(np.int16)
    blob = D.write_dicom(None, arr)
    dcm = D.read_dicom(blob)
    np.testing.assert_array_equal(dcm.pixel_array, arr)


def test_rescale_attrs(rng):
    _, blob = _synth(rng, rescale_slope=2.0, rescale_intercept=-1024.0)
    dcm = D.read_dicom(blob)
    assert dcm.rescale_slope == 2.0
    assert dcm.rescale_intercept == -1024.0


def test_window_image_formula():
    # reference math (tensorDICOM.py:52-70): clip to [c-w/2, c+w/2] -> [0,1]
    x = np.array([0.0, 50.0, 100.0, 150.0, 200.0])
    out = D.window_image(x, window_center=100.0, window_width=100.0)
    np.testing.assert_allclose(out, [0.0, 0.0, 0.5, 1.0, 1.0])


def test_percentile_window_range(rng):
    x = rng.random((100, 100)).astype(np.float32) * 3000
    out = D.percentile_window(x)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # bulk of the distribution is stretched across [0,1]
    assert out.max() - out.min() > 0.9


def test_load_raw_array(rng):
    arr, blob = _synth(rng)
    out = D.load_raw_array(blob)
    assert out.shape == arr.shape
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_monochrome1_inversion(rng):
    arr = (rng.random((16, 16)) * 1000).astype(np.uint16)
    b2 = D.write_dicom(None, arr, photometric="MONOCHROME2")
    b1 = D.write_dicom(None, arr, photometric="MONOCHROME1")
    a2 = D.load_raw_array(b2)
    a1 = D.load_raw_array(b1)
    # inverted image should anti-correlate with the original
    assert np.corrcoef(a1.ravel(), a2.ravel())[0, 1] < -0.9


def test_preprocessor_output_shape_and_norm(rng):
    arr, blob = _synth(rng, h=128, w=96, window_center=2000, window_width=2000)
    pp = D.DICOMImagePreprocessor(mean=0.5, std=0.5, output_size=(224, 224))
    out = pp.load(blob)
    assert out.shape == (3, 224, 224)
    # normalize((x in [0,1]) - .5)/.5 -> [-1, 1]
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
    # channels identical (grayscale replicated)
    np.testing.assert_allclose(out[0], out[1])


def test_preprocessor_default_window(rng):
    arr, blob = _synth(rng)  # no window tags
    pp = D.DICOMImagePreprocessor()
    out = pp.load(blob)  # uses defaults 40/400 (tensorDICOM.py:14-16)
    assert out.shape == (3, 224, 224)


def test_parse_error_on_garbage():
    with pytest.raises(D.DicomParseError):
        D.read_dicom(b"not a dicom file at all........")


def test_resize_bilinear_identity():
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = D._resize_bilinear(img, (4, 4))
    np.testing.assert_allclose(out, img, atol=1e-5)
