"""Native SDXL invisible watermark (utils/watermark.py): roundtrip,
skip-small guard, imperceptibility bounds.

Reference behavior: pipeline_stable_diffusion_xl.py:136-141,645-647
stamps the 48-bit SDXL message via the invisible-watermark package's
DWT quantization scheme when installed."""
import numpy as np
import pytest

from video_style_transfer_tpu.utils import watermark as wm


def _rand_img(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8)


def test_message_is_48_bits_leading_one():
    assert len(wm.WATERMARK_BITS) == 48
    assert wm.WATERMARK_BITS[0] == 1
    assert set(np.unique(wm.WATERMARK_BITS)) <= {0, 1}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roundtrip_random_image(seed):
    img = _rand_img(512, 512, seed)
    stamped = wm.apply_watermark(img)
    assert stamped.dtype == np.uint8 and stamped.shape == img.shape
    assert np.array_equal(wm.decode_watermark(stamped), wm.WATERMARK_BITS)
    assert wm.has_watermark(stamped)
    assert not wm.has_watermark(img)


def test_roundtrip_flat_image():
    img = np.full((256, 256, 3), 128, np.uint8)
    stamped = wm.apply_watermark(img)
    assert np.array_equal(wm.decode_watermark(stamped), wm.WATERMARK_BITS)


def test_roundtrip_odd_dims_and_batch():
    imgs = np.stack([_rand_img(511, 509, s) for s in range(2)])
    stamped = wm.apply_watermark(imgs)
    assert stamped.shape == imgs.shape
    for i in range(2):
        assert wm.has_watermark(stamped[i])


def test_small_images_pass_through():
    img = _rand_img(128, 128)
    assert wm.apply_watermark(img) is not img  # copy semantics via [None]
    np.testing.assert_array_equal(wm.apply_watermark(img), img)


def test_imperceptibility():
    """The mark lives in chroma U; luma moves little and overall PSNR
    stays high (same scale-36 strength as the reference package)."""
    img = _rand_img(512, 512, 3)
    stamped = wm.apply_watermark(img)
    diff = stamped.astype(np.float64) - img.astype(np.float64)
    psnr = 10 * np.log10(255.0 ** 2 / np.maximum(np.mean(diff ** 2), 1e-12))
    assert psnr > 35.0
    y_before = wm._rgb_to_yuv(img)[..., 0]
    y_after = wm._rgb_to_yuv(stamped)[..., 0]
    # luma shift is only uint8 rounding + clipping, not the embedding
    assert np.mean(np.abs(y_after - y_before)) < 1.5


def test_decode_survives_mild_noise():
    img = _rand_img(512, 512, 4)
    stamped = wm.apply_watermark(img).astype(np.int64)
    rng = np.random.default_rng(0)
    noisy = np.clip(stamped + rng.integers(-2, 3, stamped.shape),
                    0, 255).astype(np.uint8)
    assert wm.has_watermark(noisy)


def test_haar_roundtrip_exact():
    x = np.random.default_rng(0).normal(size=(64, 64))
    ll, det = wm._haar_dwt2(x)
    np.testing.assert_allclose(wm._haar_idwt2(ll, det), x, atol=1e-12)
    # orthonormal scaling: constant c -> LL = 2c
    ll_c, _ = wm._haar_dwt2(np.full((8, 8), 3.0))
    np.testing.assert_allclose(ll_c, 6.0)
