"""Shape/consistency tests for the functional SDXL UNet (tiny config)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_style_transfer_tpu.config import UNetConfig
from video_style_transfer_tpu.models.unet import init_unet, unet_apply


@pytest.fixture(scope="module")
def tiny():
    cfg = UNetConfig.tiny()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _inputs(cfg, b=2, res=16, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    sample = jax.random.normal(ks[0], (b, res, res, cfg.in_channels))
    t = jnp.array([10] * b)
    emb = jax.random.normal(ks[1], (b, 7, cfg.cross_attention_dim))
    emb_c = jax.random.normal(ks[2], (b, 7, cfg.cross_attention_dim))
    emb_s = jax.random.normal(ks[3], (b, 7, cfg.cross_attention_dim))
    pooled = jax.random.normal(ks[4], (b, 32))
    time_ids = jnp.tile(jnp.array([[16, 16, 0, 0, 16, 16]]), (b, 1))
    return sample, t, (emb, emb_c, emb_s), pooled, time_ids


def test_forward_shape(tiny):
    cfg, params = tiny
    sample, t, ctx, pooled, tids = _inputs(cfg)
    out = unet_apply(params, cfg, sample, t, ctx, pooled, tids, mode="base")
    assert out.shape == sample.shape
    assert jnp.all(jnp.isfinite(out))


def test_jit_and_determinism(tiny):
    cfg, params = tiny
    sample, t, ctx, pooled, tids = _inputs(cfg)
    f = jax.jit(lambda p, s: unet_apply(p, cfg, s, t, ctx, pooled, tids,
                                        mode="base"))
    o1 = f(params, sample)
    o2 = f(params, sample)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_ctx_combined_only(tiny):
    """content/style ctx=None must fall back to combined (matches the
    reference behavior when extra embeddings are omitted)."""
    cfg, params = tiny
    sample, t, (emb, _, _), pooled, tids = _inputs(cfg)
    o1 = unet_apply(params, cfg, sample, t, (emb, None, None), pooled, tids,
                    mode="base")
    o2 = unet_apply(params, cfg, sample, t, (emb, emb, emb), pooled, tids,
                    mode="base")
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_motion_unet_shape():
    cfg = UNetConfig.tiny(use_motion_modules=True)
    params = init_unet(jax.random.PRNGKey(1), cfg)
    b, f, res = 1, 4, 16
    sample, t, ctx, pooled, tids = _inputs(cfg, b=b, res=res)
    video = jnp.tile(sample, (f, 1, 1, 1))
    out = unet_apply(params, cfg, video, t, ctx, pooled, tids, mode="base",
                     num_frames=f)
    assert out.shape == (b * f, res, res, cfg.out_channels)
    assert jnp.all(jnp.isfinite(out))


def test_motion_unet_single_frame_matches_spatial():
    """With one frame the motion UNet must reduce to spatial behavior plus
    the motion residual paths; at num_frames=1 motion modules are skipped
    entirely, so output equals the plain UNet with identical weights."""
    cfg_m = UNetConfig.tiny(use_motion_modules=True)
    cfg_p = UNetConfig.tiny()
    params = init_unet(jax.random.PRNGKey(2), cfg_m)
    sample, t, ctx, pooled, tids = _inputs(cfg_m)
    o_m = unet_apply(params, cfg_m, sample, t, ctx, pooled, tids,
                     mode="base", num_frames=1)
    o_p = unet_apply(params, cfg_p, sample, t, ctx, pooled, tids,
                     mode="base")
    np.testing.assert_allclose(np.asarray(o_m), np.asarray(o_p), atol=1e-6)


def test_remat_matches(tiny):
    cfg, params = tiny
    sample, t, ctx, pooled, tids = _inputs(cfg)
    o1 = unet_apply(params, cfg, sample, t, ctx, pooled, tids, mode="base")
    o2 = unet_apply(params, cfg, sample, t, ctx, pooled, tids, mode="base",
                    remat=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_cfg_doubled_video_batch_independence():
    """Temporal attention must not mix the uncond and cond halves of a
    CFG-doubled video batch: running the doubled batch equals running
    each half separately (validates the (B*F)->(B,F,...) reshape)."""
    cfg = UNetConfig.tiny(use_motion_modules=True)
    params = init_unet(jax.random.PRNGKey(3), cfg)
    f, res = 4, 16
    ks = jax.random.split(jax.random.PRNGKey(11), 8)
    vid_a = jax.random.normal(ks[0], (f, res, res, 4))
    vid_b = jax.random.normal(ks[1], (f, res, res, 4))
    emb = jax.random.normal(ks[2], (2, 7, cfg.cross_attention_dim))
    pooled = jax.random.normal(ks[3], (2, 32))
    tids = jnp.tile(jnp.array([[16., 16, 0, 0, 16, 16]]), (2, 1))
    t = jnp.array([5, 5])

    doubled = jnp.concatenate([vid_a, vid_b], axis=0)
    out = unet_apply(params, cfg, doubled, t, (emb, None, None), pooled,
                     tids, mode="base", num_frames=f)

    out_a = unet_apply(params, cfg, vid_a, t[:1], (emb[:1], None, None),
                       pooled[:1], tids[:1], mode="base", num_frames=f)
    out_b = unet_apply(params, cfg, vid_b, t[1:], (emb[1:], None, None),
                       pooled[1:], tids[1:], mode="base", num_frames=f)
    np.testing.assert_allclose(np.asarray(out[:f]), np.asarray(out_a),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[f:]), np.asarray(out_b),
                               rtol=1e-4, atol=1e-5)
