"""AnimateDiff-XL video generation (functional).

Equivalent of inference_animatediff.py:53-151 (generate_video): motion
UNet denoise over (B, F, h, w, 4) latents, three modes (both/content/
style) via the static mode argument instead of unziplora_set_forward_type
walks, per-frame fp32 VAE decode — with the reference's two sequential
CFG UNet calls (:109-122) replaced by one batched pair, the Python step
loop by lax.scan, and frames shardable across the mesh.
"""
from __future__ import annotations

from typing import Optional

import functools
import math

import jax
import jax.numpy as jnp

from video_style_transfer_tpu.models.vae import vae_decode
from video_style_transfer_tpu.pipelines.image import (
    decode_images, generate_latents)
from video_style_transfer_tpu.pipelines.sampling import Conditioning


def generate_video_latents(unet_params, unet_cfg, uncond: Conditioning,
                           cond: Conditioning, key, *, num_frames: int = 16,
                           height: int = 1024, width: int = 1024,
                           num_steps: int = 30, cfg_scale: float = 7.5,
                           mode: str = "both", state=None,
                           impl: str = "auto", dtype=jnp.bfloat16,
                           sched=None, vae_scale_factor: int = 8):
    """Returns (num_frames, h/8, w/8, 4) scaled latents for batch 1.

    Reference defaults: 16 frames, 1024^2, CFG 7.5
    (inference_animatediff.sh:18-24); the conditioning batch is 1 and is
    broadcast across frames inside the UNet.
    """
    return generate_latents(
        unet_params, unet_cfg, uncond, cond, key, height=height,
        width=width, batch=num_frames, num_steps=num_steps,
        cfg_scale=cfg_scale, sampler="euler", mode=mode, state=state,
        num_frames=num_frames, impl=impl, dtype=dtype, sched=sched,
        vae_scale_factor=vae_scale_factor)


def generate_video_latents_chunked(unet_params, unet_cfg,
                                   uncond: Conditioning, cond: Conditioning,
                                   key, *, num_frames: int = 16,
                                   height: int = 1024, width: int = 1024,
                                   num_steps: int = 30,
                                   steps_per_call: int = 1,
                                   cfg_scale: float = 7.5,
                                   mode: str = "both", state=None,
                                   impl: str = "auto", dtype=jnp.bfloat16,
                                   sched=None, vae_scale_factor: int = 8):
    """Single-chip HBM fallback for long-frame videos.

    The one-program lax.scan denoise at F=32 (64 CFG rows plus the
    frame-repeated cross-attention KV cache) exceeds a 16 GB chip at
    compile time (PERF.md round 4). This runs the SAME Euler math in
    jitted `steps_per_call`-step chunks chained from the host: peak
    live memory is one chunk's, at num_steps/steps_per_call extra
    dispatches. The cross-attn KV cache is rebuilt once per chunk (it
    lives only for the chunk's execution). Identical output to
    `generate_video_latents` — pinned by
    tests/test_pipelines.py::test_chunked_denoise_matches_scan.
    Multi-chip serving shards the frame axis instead (--frame_parallel)
    and keeps the one-program scan."""
    from video_style_transfer_tpu.pipelines.sampling import (
        make_cfg_denoiser)
    from video_style_transfer_tpu.schedulers.ddpm import make_schedule
    from video_style_transfer_tpu.schedulers.euler import (
        euler_step, euler_timetable, scale_model_input)

    if sched is None:
        sched = make_schedule()
    table = euler_timetable(sched, num_steps)
    k = max(steps_per_call, 1)
    if num_steps % k:
        k = math.gcd(num_steps, k)
    lat_shape = (num_frames, height // vae_scale_factor,
                 width // vae_scale_factor, unet_cfg.in_channels)
    x = jax.random.normal(key, lat_shape, dtype) \
        * table["init_sigma"].astype(dtype)
    sig = jnp.asarray(table["sigmas"], jnp.float32)
    ts = jnp.asarray(table["timesteps"], jnp.float32)

    @jax.jit
    def k_steps(p, x, sigs, tss):
        eps_fn = make_cfg_denoiser(
            p, unet_cfg, uncond, cond, cfg_scale=cfg_scale, mode=mode,
            state=state, num_frames=num_frames, impl=impl, dtype=dtype)

        def body(x_, i):
            model_in = scale_model_input(x_, sigs[i])
            eps = eps_fn(model_in, tss[i])
            return euler_step(x_, eps, sigs[i], sigs[i + 1]), None

        x2, _ = jax.lax.scan(body, x, jnp.arange(k))
        return x2

    for i in range(num_steps // k):
        x = k_steps(unet_params, x, sig[i * k: i * k + k + 1],
                    ts[i * k: i * k + k])
    return x


def decode_video(vae_params, vae_cfg, latents, *, chunk: int = 1,
                 dtype=jnp.float32):
    """Per-frame fp32 VAE decode (reference inference_animatediff.py:
    136-144 decodes frame-by-frame in fp32). Chunked lax.map bounds the
    1024^2 decoder's activation memory on one chip; under a mesh the
    frame axis shards instead. chunk 1 default: measured 1.66x faster
    per frame than chunk 2 on v5e (XLA's space-to-batch lowering of the
    big-spatial decoder convs tiles best at N=1). dtype=jnp.bfloat16 is
    the opt-in fast decode (see pipelines/image.py decode_images)."""
    dec = functools.partial(decode_images, dtype=dtype)
    f = latents.shape[0]
    if chunk >= f:
        return dec(vae_params, vae_cfg, latents)
    if f % chunk != 0:
        # ragged frame counts (e.g. 14 frames, chunk 4): fall back to the
        # largest divisor so a full denoise is never discarded on an
        # assert after the fact
        chunk = math.gcd(f, chunk)
        if chunk == 1:
            return jax.lax.map(
                lambda z: dec(vae_params, vae_cfg, z[None])[0],
                latents)
    chunks = latents.reshape(f // chunk, chunk, *latents.shape[1:])
    out = jax.lax.map(
        lambda z: dec(vae_params, vae_cfg, z), chunks)
    return out.reshape(f, *out.shape[2:])


def decode_video_frame_sharded(vae_params, vae_cfg, latents, mesh, *,
                               dtype=jnp.float32):
    """Frame-parallel decode over a mesh's 'frame' axis: shard_map +
    per-shard chunk-1 lax.map, preserving the measured chunk-1
    activation-memory bound on every device even when each device holds
    several frames (the plain whole-batch decode would hand each shard
    F/n frames in one VAE program). F not divisible by the frame axis is
    zero-padded to the next multiple and sliced after decode — the pad
    frames decode to garbage that is discarded, costing pad/n of one
    shard's work, so e.g. F=24 on 8 devices is exact and F=12 on 8 pads
    4 (the reference has no multi-device serving to mirror; the PE cap
    F<=32 is the only hard limit, animatediff/temporal_transformer.py:11).
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape["frame"]
    f = latents.shape[0]
    pad = (-f) % n
    if pad:
        latents = jnp.concatenate(
            [latents, jnp.zeros((pad,) + latents.shape[1:],
                                latents.dtype)], axis=0)
    latents = jax.lax.with_sharding_constraint(
        latents, NamedSharding(mesh, P("frame")))
    def _local(v, z):
        from video_style_transfer_tpu.parallel.mesh import manual_region
        with manual_region():
            return decode_video(v, vae_cfg, z, chunk=1, dtype=dtype)

    # check_vma=False: at production resolution the decoder's mid-block
    # attention takes the Pallas flash path, whose out_shapes carry no
    # varying-mesh-axes annotation (same reason as models/motion.py and
    # parallel/mesh.rowsharded_kernel)
    out = shard_map(_local, mesh=mesh, in_specs=(P(), P("frame")),
                    out_specs=P("frame"), check_vma=False)(
                        vae_params, latents)
    return out[:f]


def generate_video(unet_params, unet_cfg, vae_params, vae_cfg,
                   uncond: Conditioning, cond: Conditioning, key, *,
                   num_frames: int = 16, height: int = 1024,
                   width: int = 1024, num_steps: int = 30,
                   cfg_scale: float = 7.5, mode: str = "both", state=None,
                   impl: str = "auto", dtype=jnp.bfloat16,
                   decode_chunk: int = 1, vae_scale_factor: int = 8,
                   decode_dtype=jnp.float32):
    """Full video program: returns (F, H, W, 3) uint8 frames."""
    latents = generate_video_latents(
        unet_params, unet_cfg, uncond, cond, key, num_frames=num_frames,
        height=height, width=width, num_steps=num_steps,
        cfg_scale=cfg_scale, mode=mode, state=state, impl=impl, dtype=dtype,
        vae_scale_factor=vae_scale_factor)
    return decode_video(vae_params, vae_cfg, latents, chunk=decode_chunk,
                        dtype=decode_dtype)
