"""Multi-device serving CLI paths: --dp sample-parallel image serving
(one (seed, draw) job per 'data'-axis device) and --frame_parallel video
serving (the production v5e-8 frame-sharded layout), both on the forced
8-device CPU mesh. The underlying sharded programs are covered by
tests/test_pipelines.py; these exercise the user-facing wiring."""
import os

import numpy as np
import jax
import jax.numpy as jnp


def test_stacked_keys_match_single_runs():
    """generate_latents with a (B, 2) key stack: row i draws the SAME
    initial noise as a batch-1 run with key i, and the denoised row
    matches that run to fp32 tolerance (the batched UNet accumulates in
    a different order, so bitwise equality holds for the noise, not the
    trajectory)."""
    from video_style_transfer_tpu.config import UNetConfig
    from video_style_transfer_tpu.models.unet import init_unet
    from video_style_transfer_tpu.pipelines.image import (
        default_time_ids, generate_latents)
    from video_style_transfer_tpu.pipelines.sampling import (
        Conditioning, tile_conditioning)

    cfg = UNetConfig.tiny()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    d = cfg.cross_attention_dim

    def cond(seed, b):
        ks = jax.random.split(jax.random.PRNGKey(seed), 2)
        return Conditioning(
            ctx=(jnp.tile(jax.random.normal(ks[0], (1, 7, d)), (b, 1, 1)),
                 None, None),
            pooled=jnp.tile(jax.random.normal(ks[1], (1, 32)), (b, 1)),
            time_ids=default_time_ids(16, 16, b))

    keys = jnp.stack([jax.random.PRNGKey(5), jax.random.PRNGKey(9)])
    batched = generate_latents(
        params, cfg, cond(1, 2), cond(2, 2), keys, height=16, width=16,
        batch=2, num_steps=2, dtype=jnp.float32, vae_scale_factor=2)
    for i in range(2):
        single = generate_latents(
            params, cfg, cond(1, 1), cond(2, 1), keys[i], height=16,
            width=16, batch=1, num_steps=2, dtype=jnp.float32,
            vae_scale_factor=2)
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(single[0]),
                                   rtol=2e-4, atol=2e-4)

    # tile_conditioning repeats rows and preserves None streams
    t = tile_conditioning(cond(1, 1), 3)
    assert t.ctx[0].shape[0] == 3 and t.ctx[1] is None
    np.testing.assert_array_equal(np.asarray(t.pooled[0]),
                                  np.asarray(t.pooled[2]))


def test_infer_cli_dp_matches_single(tmp_path):
    """--dp 2 writes one image per seed, each matching the --dp 1 output
    for that seed to within uint8 rounding (the sharded program computes
    the same math; layout changes move only reduction order)."""
    from PIL import Image

    from video_style_transfer_tpu.cli.infer import main as infer

    def load_image(p):
        return np.asarray(Image.open(p))

    base = ["--smoke", "--prompt", "a sbu dog in szn style",
            "--mode", "both", "--seeds", "0", "1000"]
    out_dp = infer(base + ["--dp", "2", "--output_dir",
                           str(tmp_path / "dp")])
    out_1 = infer(base + ["--output_dir", str(tmp_path / "single")])
    assert [os.path.basename(p) for p in out_dp] == \
           [os.path.basename(p) for p in out_1]
    for p_dp, p_1 in zip(out_dp, out_1):
        a = load_image(p_dp).astype(np.int32)
        b = load_image(p_1).astype(np.int32)
        assert np.abs(a - b).max() <= 1, (p_dp, np.abs(a - b).max())


def test_infer_cli_dp_pads_short_final_chunk(tmp_path):
    """3 jobs at --dp 2: the final chunk pads with a repeat and the pad
    row is not written."""
    from video_style_transfer_tpu.cli.infer import main as infer
    outs = infer(["--smoke", "--prompt", "a sbu dog", "--mode", "both",
                  "--seeds", "0", "1000", "111", "--dp", "2",
                  "--output_dir", str(tmp_path)])
    assert len(outs) == 3
    assert sorted(os.listdir(tmp_path)) == sorted(
        os.path.basename(p) for p in outs)


def test_infer_video_cli_frame_parallel(tmp_path):
    """--frame_parallel 4 shards the 4 smoke frames over an all-'frame'
    mesh and still writes a playable video per mode."""
    from video_style_transfer_tpu.cli.infer_video import main as infer
    outs = infer(["--smoke", "--prompt", "a sbu horse in szn style",
                  "--modes", "both", "--frame_parallel", "4",
                  "--output_dir", str(tmp_path)])
    assert len(outs) == 1
    assert os.path.getsize(outs[0]) > 0


def test_infer_video_cli_frame_parallel_uneven(tmp_path):
    """--frame_parallel 3 with 4 smoke frames (non-divisible): the
    denoise shards unevenly under GSPMD and the decode helper pads to 6
    and slices back — all 4 frames come out (VERDICT r3 next-item 5)."""
    from video_style_transfer_tpu.cli.infer_video import main as infer
    outs = infer(["--smoke", "--prompt", "a sbu horse in szn style",
                  "--modes", "both", "--frame_parallel", "3",
                  "--output_dir", str(tmp_path)])
    assert len(outs) == 1
    assert os.path.getsize(outs[0]) > 0


def test_decode_frame_sharded_uneven_matches_unsharded():
    """decode_video_frame_sharded at F=6 over a 4-device 'frame' mesh
    (pad 2) is exactly the unsharded per-frame decode on the real
    frames: padding must never leak into real outputs."""
    from video_style_transfer_tpu.config import VAEConfig
    from video_style_transfer_tpu.models.vae import init_vae
    from video_style_transfer_tpu.parallel.mesh import create_mesh
    from video_style_transfer_tpu.pipelines.video import (
        decode_video, decode_video_frame_sharded)

    vcfg = VAEConfig.tiny()
    vae = init_vae(jax.random.PRNGKey(0), vcfg)
    lat = jax.random.normal(jax.random.PRNGKey(1), (6, 8, 8, 4),
                            jnp.float32)
    mesh = create_mesh(jax.devices()[:4])  # all on 'frame'
    with mesh:
        sharded = jax.jit(lambda v, z: decode_video_frame_sharded(
            v, vcfg, z, mesh))(vae, lat)
    plain = decode_video(vae, vcfg, lat, chunk=1)
    assert sharded.shape == plain.shape == (6, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(plain))


def test_infer_video_cli_frame_parallel_subdivided(tmp_path):
    """--frame_parallel 2 with 4 smoke frames: each device holds 2
    frames, so the decode must run its per-shard chunk-1 lax.map (the
    shard_map path) instead of one 2-frame VAE program per device."""
    from video_style_transfer_tpu.cli.infer_video import main as infer
    outs = infer(["--smoke", "--prompt", "a sbu horse in szn style",
                  "--modes", "both", "--frame_parallel", "2",
                  "--output_dir", str(tmp_path)])
    assert len(outs) == 1
    assert os.path.getsize(outs[0]) > 0


def test_decode_frame_sharded_with_pallas_kernel():
    """Regression: decode_video_frame_sharded must trace with a Pallas
    kernel inside its shard_map. At production resolution the VAE
    mid-block attention takes the flash path (seq 16384, d=512 >=
    _FLASH_MIN_SEQ on TPU), and Pallas out_shapes carry no
    varying-mesh-axes annotation — without check_vma=False the
    shard_map raises at trace time, invisible to tiny-shape smoke tests
    whose attention stays on the short-kv path. Forces impl='pallas'
    through the model attention layer on the CPU mesh and pins the
    sharded output to the identically-forced unsharded decode."""
    import functools

    from video_style_transfer_tpu.config import VAEConfig
    from video_style_transfer_tpu.models import attention as mattn
    from video_style_transfer_tpu.models.vae import init_vae
    from video_style_transfer_tpu.ops.attention import sdpa
    from video_style_transfer_tpu.parallel.mesh import create_mesh
    from video_style_transfer_tpu.pipelines.video import (
        decode_video, decode_video_frame_sharded)

    vcfg = VAEConfig.tiny()
    vae = init_vae(jax.random.PRNGKey(0), vcfg)
    lat = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4),
                            jnp.float32)
    orig = mattn.sdpa
    mattn.sdpa = functools.partial(sdpa, impl="pallas")
    try:
        mesh = create_mesh(jax.devices()[:4])  # all on 'frame'
        with mesh:
            sharded = jax.jit(lambda v, z: decode_video_frame_sharded(
                v, vcfg, z, mesh))(vae, lat)
        plain = decode_video(vae, vcfg, lat, chunk=1)
    finally:
        mattn.sdpa = orig
    assert sharded.shape == plain.shape == (4, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(plain))


def test_infer_video_cli_activates_mesh_context(tmp_path, monkeypatch):
    """Regression: the serving CLI must jit-trace INSIDE `with mesh:` —
    the shard_map motion module, context_constraint pins, and rowsharded
    Pallas wrappers all dispatch off parallel.mesh.context_mesh(), so a
    trace outside the context silently falls back to plain GSPMD (the
    full-activation all-gather per motion module the collective audit
    measures). Asserts the motion module's mesh dispatch fires during a
    --frame_parallel run."""
    from video_style_transfer_tpu.cli.infer_video import main as infer
    from video_style_transfer_tpu.models import motion as mmotion

    hits = []
    orig = mmotion._sharded_mesh_info

    def spy(b, num_frames, hw):
        out = orig(b, num_frames, hw)
        hits.append(out is not None)
        return out

    monkeypatch.setattr(mmotion, "_sharded_mesh_info", spy)
    outs = infer(["--smoke", "--prompt", "a sbu horse in szn style",
                  "--modes", "both", "--frame_parallel", "4",
                  "--output_dir", str(tmp_path)])
    assert len(outs) == 1 and os.path.getsize(outs[0]) > 0
    assert hits, "motion mesh dispatch never consulted"
    assert any(hits), ("context_mesh() was None at trace time — the CLI "
                      "jitted outside `with mesh:`")
