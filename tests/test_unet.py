"""Shape/consistency tests for the functional SDXL UNet (tiny config)."""
import functools

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
    for policy in (True, "component", "component_lite", "component_lite1"):
        o2 = unet_apply(params, cfg, sample, t, ctx, pooled, tids,
                        mode="base", remat=policy)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   atol=1e-6)


@pytest.mark.slow
def test_remat_policies_same_gradients(tiny):
    """Checkpoint policies must be value/grad-neutral: every remat
    level (inner, component, and both level-split variants) produces
    the same loss gradients as the unrematted forward."""
    import jax
    import jax.numpy as jnp

    cfg, params = tiny
    sample, t, ctx, pooled, tids = _inputs(cfg)

    def loss(p, policy):
        out = unet_apply(p, cfg, sample, t, ctx, pooled, tids,
                         mode="base", remat=policy)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g0 = jax.grad(lambda p: loss(p, False))(params)
    for policy in (True, "component", "component_lite1"):
        g1 = jax.grad(lambda p: loss(p, policy))(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=2e-4, rtol=2e-4),
            g0, g1)


@pytest.mark.slow
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


class TestCrossKvCache:
    """precompute_cross_kv: the prompt-side k/v projections are
    loop-invariant; serving pipelines evaluate them once per generation
    (models/unet.py) — cached and uncached forwards must agree."""

    @pytest.mark.parametrize("motion,frames", [(False, 1), (True, 2)])
    @pytest.mark.parametrize("mode", ["both", "content"])
    def test_matches_uncached(self, motion, frames, mode):
        from video_style_transfer_tpu.lora.surgery import insert_unziplora
        from video_style_transfer_tpu.models.unet import precompute_cross_kv
        cfg = UNetConfig.tiny(use_motion_modules=motion)
        p = init_unet(jax.random.PRNGKey(0), cfg)
        p, state = insert_unziplora(p, jax.random.PRNGKey(1), rank=4)
        b = 2
        n = b * frames
        x = jax.random.normal(jax.random.PRNGKey(2), (n, 8, 8, 4))
        t = jnp.asarray([5.0] * b)
        d = cfg.cross_attention_dim
        ctx = tuple(jax.random.normal(jax.random.PRNGKey(3 + i), (b, 7, d))
                    for i in range(3))
        pooled = jax.random.normal(jax.random.PRNGKey(9), (b, 32))
        tid = jnp.tile(jnp.asarray([[16, 16, 0, 0, 16, 16]], jnp.float32),
                       (b, 1))
        y0 = unet_apply(p, cfg, x, t, ctx, pooled, tid, mode=mode,
                        state=state, num_frames=frames)
        kv = precompute_cross_kv(p, cfg, ctx, mode=mode, state=state,
                                 dtype=x.dtype)
        y1 = unet_apply(p, cfg, x, t, ctx, pooled, tid, mode=mode,
                        state=state, num_frames=frames, cross_kv=kv)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=1e-5, atol=1e-5)

    def test_pipeline_default_uses_cache(self):
        """generate_latents must produce identical latents with the
        denoiser's precompute on (default) and off."""
        from video_style_transfer_tpu.pipelines import image as image_mod
        from video_style_transfer_tpu.pipelines import sampling
        from video_style_transfer_tpu.pipelines.image import (
            default_time_ids, generate_latents)
        cfg = UNetConfig.tiny()
        p = init_unet(jax.random.PRNGKey(0), cfg)
        d = cfg.cross_attention_dim

        def cond_of(seed):
            ks = jax.random.split(jax.random.PRNGKey(seed), 4)
            return sampling.Conditioning(
                ctx=tuple(jax.random.normal(k, (1, 7, d)) for k in ks[:3]),
                pooled=jax.random.normal(ks[3], (1, 32)),
                time_ids=default_time_ids(16, 16, 1))

        uncond, cond = cond_of(1), cond_of(2)
        kw = dict(height=16, width=16, num_steps=2, mode="base",
                  dtype=jnp.float32, vae_scale_factor=2)
        lat = generate_latents(p, cfg, uncond, cond,
                               jax.random.PRNGKey(3), **kw)
        orig = image_mod.make_cfg_denoiser
        try:
            # image.py imported the symbol directly — patch ITS binding
            image_mod.make_cfg_denoiser = functools.partial(
                orig, precompute_kv=False)
            lat_nokv = generate_latents(p, cfg, uncond, cond,
                                        jax.random.PRNGKey(3), **kw)
        finally:
            image_mod.make_cfg_denoiser = orig
        np.testing.assert_allclose(np.asarray(lat), np.asarray(lat_nokv),
                                   rtol=1e-5, atol=1e-6)
