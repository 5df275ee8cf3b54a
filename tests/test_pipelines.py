"""End-to-end tiny pipeline tests: image + video generation, mode
switching, and mesh-sharded execution on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from video_style_transfer_tpu.config import UNetConfig, VAEConfig
from video_style_transfer_tpu.lora.surgery import insert_unziplora
from video_style_transfer_tpu.models.unet import init_unet
from video_style_transfer_tpu.models.vae import init_vae
from video_style_transfer_tpu.parallel import create_mesh, replicate, shard_rows
from video_style_transfer_tpu.pipelines.image import (
    default_time_ids, generate_images, generate_latents)
from video_style_transfer_tpu.pipelines.sampling import Conditioning
from video_style_transfer_tpu.pipelines.video import (
    decode_video, generate_video, generate_video_latents)

RES = 16


def _models(motion=False):
    ucfg = UNetConfig.tiny(use_motion_modules=motion)
    vcfg = VAEConfig.tiny()
    up = init_unet(jax.random.PRNGKey(0), ucfg)
    vp = init_vae(jax.random.PRNGKey(1), vcfg)
    return ucfg, up, vcfg, vp


def _cond(b, ucfg, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    emb = jax.random.normal(ks[0], (b, 7, ucfg.cross_attention_dim))
    pooled = jax.random.normal(ks[1], (b, 32))
    tids = default_time_ids(RES, RES, b)
    return Conditioning(ctx=(emb, None, None), pooled=pooled, time_ids=tids)


def test_image_generation_runs():
    ucfg, up, vcfg, vp = _models()
    uncond, cond = _cond(1, ucfg, 0), _cond(1, ucfg, 1)
    imgs = generate_images(up, ucfg, vp, vcfg, uncond, cond,
                           jax.random.PRNGKey(2), height=RES, width=RES,
                           num_steps=3, dtype=jnp.float32,
                           vae_scale_factor=2)
    assert imgs.shape == (1, RES, RES, 3)
    assert imgs.dtype == jnp.uint8


def test_dpm_sampler_runs():
    ucfg, up, vcfg, vp = _models()
    uncond, cond = _cond(1, ucfg, 0), _cond(1, ucfg, 1)
    lat = generate_latents(up, ucfg, uncond, cond, jax.random.PRNGKey(2),
                           height=RES, width=RES, num_steps=4,
                           sampler="dpm", dtype=jnp.float32,
                           vae_scale_factor=2)
    assert lat.shape == (1, 8, 8, 4)
    assert bool(jnp.all(jnp.isfinite(lat)))


def test_modes_give_distinct_images():
    ucfg, up, vcfg, vp = _models()
    up, state = insert_unziplora(up, jax.random.PRNGKey(5), rank=4)
    uncond, cond = _cond(1, ucfg, 0), _cond(1, ucfg, 1)
    outs = {}
    for mode in ("both", "content", "style"):
        outs[mode] = np.asarray(generate_latents(
            up, ucfg, uncond, cond, jax.random.PRNGKey(2), height=RES,
            width=RES, num_steps=2, mode=mode, state=state,
            dtype=jnp.float32, vae_scale_factor=2))
    assert not np.allclose(outs["both"], outs["content"])
    assert not np.allclose(outs["content"], outs["style"])


def test_video_generation_runs():
    ucfg, up, vcfg, vp = _models(motion=True)
    uncond, cond = _cond(1, ucfg, 0), _cond(1, ucfg, 1)
    frames = generate_video(up, ucfg, vp, vcfg, uncond, cond,
                            jax.random.PRNGKey(3), num_frames=4, height=RES,
                            width=RES, num_steps=2, dtype=jnp.float32,
                            decode_chunk=2, vae_scale_factor=2)
    assert frames.shape == (4, RES, RES, 3)
    assert frames.dtype == jnp.uint8


def test_video_latents_sharded_over_frames():
    """The full video denoise jits and runs with latents sharded over the
    8-device frame axis (the production serving layout)."""
    ucfg, up, vcfg, vp = _models(motion=True)
    mesh = create_mesh(frame=8)
    uncond, cond = _cond(1, ucfg, 0), _cond(1, ucfg, 1)
    rep = replicate(mesh)
    up_s = jax.device_put(up, rep)

    @jax.jit
    def run(params, key):
        lat = generate_video_latents(
            params, ucfg, uncond, cond, key, num_frames=8, height=RES,
            width=RES, num_steps=2, dtype=jnp.float32,
            vae_scale_factor=2)
        return jax.lax.with_sharding_constraint(
            lat, NamedSharding(mesh, P("frame")))

    with mesh:
        lat = run(up_s, jax.random.PRNGKey(4))
    assert lat.shape == (8, 8, 8, 4)
    assert bool(jnp.all(jnp.isfinite(lat)))
    # identical result to the unsharded run
    lat_ref = generate_video_latents(
        up, ucfg, uncond, cond, jax.random.PRNGKey(4), num_frames=8,
        height=RES, width=RES, num_steps=2, dtype=jnp.float32,
        vae_scale_factor=2)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(lat_ref),
                               rtol=2e-4, atol=1e-4)


def test_full_video_pipeline_sharded_including_decode():
    """End-to-end serving path under the mesh: frame-sharded denoise AND
    frame-sharded fp32 VAE decode in one jitted program."""
    ucfg, up, vcfg, vp = _models(motion=True)
    mesh = create_mesh(frame=8)
    uncond, cond = _cond(1, ucfg, 0), _cond(1, ucfg, 1)
    up_r = jax.device_put(up, replicate(mesh))
    vp_r = jax.device_put(vp, replicate(mesh))

    @jax.jit
    def run(unet_p, vae_p, key):
        lat = generate_video_latents(
            unet_p, ucfg, uncond, cond, key, num_frames=8, height=RES,
            width=RES, num_steps=2, dtype=jnp.float32, vae_scale_factor=2)
        lat = jax.lax.with_sharding_constraint(
            lat, NamedSharding(mesh, P("frame")))
        return decode_video(vae_p, vcfg, lat, chunk=8)

    with mesh:
        frames = run(up_r, vp_r, jax.random.PRNGKey(5))
    assert frames.shape == (8, RES, RES, 3)
    assert frames.dtype == jnp.uint8


def test_per_stream_negative_conditioning():
    """prompt_2 and per-stream negatives thread distinct embeddings
    (reference pipeline_stable_diffusion_xl.py:145-196 surface)."""
    from video_style_transfer_tpu.cli import common

    bundle = common.load_models(None, smoke=True)
    c1 = common.make_conditioning(bundle, "a", height=16, width=16)
    c2 = common.make_conditioning(bundle, "a", height=16, width=16,
                                  prompt_2="different")
    assert np.abs(np.asarray(c1.ctx[0]) - np.asarray(c2.ctx[0])).max() > 0

    n = common.negative_conditioning(
        bundle, "bad", height=16, width=16,
        negative_prompt_content="ugly content",
        negative_prompt_style="ugly style")
    assert np.abs(np.asarray(n.ctx[0]) - np.asarray(n.ctx[1])).max() > 0
    assert np.abs(np.asarray(n.ctx[1]) - np.asarray(n.ctx[2])).max() > 0
    # unspecified streams share the combined negative
    n2 = common.negative_conditioning(bundle, "bad", height=16, width=16)
    np.testing.assert_array_equal(np.asarray(n2.ctx[0]),
                                  np.asarray(n2.ctx[1]))


def test_decode_bf16_close_to_fp32():
    """The opt-in bf16 VAE decode (cli --vae_dtype bfloat16) must agree
    with the fp32 parity path to within bf16 mantissa noise in uint8
    pixel space, and must produce no overflow artifacts (bf16 shares
    fp32's exponent range — the fp16 failure mode the reference guards
    against cannot occur)."""
    import numpy as np
    from video_style_transfer_tpu.config import VAEConfig
    from video_style_transfer_tpu.models.vae import init_vae
    from video_style_transfer_tpu.pipelines.image import decode_images

    cfg = VAEConfig.tiny()
    vp = init_vae(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4),
                          jnp.float32)
    a = np.asarray(decode_images(vp, cfg, z), np.int32)
    b = np.asarray(decode_images(vp, cfg, z, dtype=jnp.bfloat16), np.int32)
    assert a.shape == b.shape and a.dtype == b.dtype == np.int32
    diff = np.abs(a - b)
    # bf16 rel err 2^-9 over a [-1,1] output -> a few uint8 counts; the
    # bound is loose to stay seed-robust but tight enough to catch a
    # wrong-scale or overflowed decode outright
    assert diff.mean() < 3.0, diff.mean()
    assert np.percentile(diff, 99) < 16, np.percentile(diff, 99)


def test_chunked_denoise_matches_scan():
    """generate_video_latents_chunked (the single-chip F=32 HBM
    fallback, VERDICT r4 next-item 5) must reproduce the one-program
    scan sampler exactly — same Euler math, chunk boundaries only
    change where the host resumes the chain."""
    from video_style_transfer_tpu.pipelines.video import (
        generate_video_latents_chunked)

    ucfg, up, vcfg, vp = _models(motion=True)
    uncond, cond = _cond(1, ucfg, 0), _cond(1, ucfg, 1)
    kw = dict(num_frames=4, height=RES, width=RES, num_steps=6,
              mode="base", dtype=jnp.float32, vae_scale_factor=2)
    ref = generate_video_latents(up, ucfg, uncond, cond,
                                 jax.random.PRNGKey(3), **kw)
    for spc in (1, 2, 3):
        got = generate_video_latents_chunked(
            up, ucfg, uncond, cond, jax.random.PRNGKey(3),
            steps_per_call=spc, **kw)
        # rtol covers XLA fusion drift between the two program
        # shapes (same math, different fusion boundaries)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4), spc
    # a non-divisor chunk falls back to the gcd instead of mis-stepping
    got = generate_video_latents_chunked(
        up, ucfg, uncond, cond, jax.random.PRNGKey(3),
        steps_per_call=4, **kw)  # gcd(6, 4) = 2
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_resolve_steps_per_call_policy():
    """The CLI's F=32 single-chip guard: auto per-step fallback exactly
    when a 32-frame full-res request would OOM the one-program scan."""
    from video_style_transfer_tpu.cli.infer_video import (
        resolve_steps_per_call)

    # explicit request always wins
    assert resolve_steps_per_call(5, frames=32, res=1024, steps=30,
                                  frame_parallel=False) == 5
    assert resolve_steps_per_call(0, frames=32, res=1024, steps=30,
                                  frame_parallel=False) == 0
    # the OOM configuration: F>=32 at >=1024^2 on one chip
    assert resolve_steps_per_call(None, frames=32, res=1024, steps=30,
                                  frame_parallel=False) == 1
    # frame-parallel meshes shard the memory away -> keep the scan
    assert resolve_steps_per_call(None, frames=32, res=1024, steps=30,
                                  frame_parallel=True) == 0
    # the headline F=16 single-chip protocol keeps the scan
    assert resolve_steps_per_call(None, frames=16, res=1024, steps=30,
                                  frame_parallel=False) == 0
