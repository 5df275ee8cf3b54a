"""Native preprocessing library: build, bind, and match the numpy/cv2
reference semantics."""
import numpy as np
import pytest

from video_style_transfer_tpu.data import native


def test_native_builds():
    assert native.native_available(), "native library failed to build"


def test_u8_to_unit_range():
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (3, 5, 7, 3), np.uint8)
    got = native.u8_to_unit_range(x)
    want = x.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_resize_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (37, 53, 3), np.uint8)
    got = native.resize_bilinear(img, 16, 24)
    want = cv2.resize(img, (24, 16), interpolation=cv2.INTER_LINEAR)
    # rounding at half-ULP boundaries may differ by 1
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_fused_preprocess():
    rng = np.random.RandomState(2)
    frames = rng.randint(0, 256, (4, 33, 44, 3), np.uint8)
    got = native.preprocess_frames_bgr(frames, 16, 16)
    assert got.shape == (4, 16, 16, 3)
    # channel swap: red-out corresponds to blue-in
    ref_resized = np.stack([native.resize_bilinear(f, 16, 16)
                            for f in frames])
    want = ref_resized[..., ::-1].astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.min() >= -1.0 and got.max() <= 1.0


def test_numpy_fallbacks_match_native(monkeypatch):
    """With the native lib unavailable the numpy fallbacks must produce
    (near-)identical results."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (23, 31, 3), np.uint8)
    frames = rng.randint(0, 256, (2, 23, 31, 3), np.uint8)
    want_resize = native.resize_bilinear(img, 12, 12)
    want_pre = native.preprocess_frames_bgr(frames, 12, 12)
    want_u8 = native.u8_to_unit_range(frames)

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_tried", True)
    assert not native.native_available()
    got_resize = native.resize_bilinear(img, 12, 12)
    got_pre = native.preprocess_frames_bgr(frames, 12, 12)
    got_u8 = native.u8_to_unit_range(frames)

    assert np.abs(got_resize.astype(int) - want_resize.astype(int)).max() <= 1
    np.testing.assert_allclose(got_pre, want_pre, atol=0.01)
    np.testing.assert_allclose(got_u8, want_u8, atol=1e-6)
