"""UnZipLoRA SDXL image generation pipeline (functional).

Equivalent of StableDiffusionXLUnZipLoRAPipeline.__call__
(pipeline_stable_diffusion_xl.py:145-657): triple-prompt conditioning
(combined/content/style), CFG, Euler or DPM++ sampling, fp32 VAE decode —
but as one jit-compiled program with the denoise loop scanned on device.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from video_style_transfer_tpu.models.vae import vae_decode
from video_style_transfer_tpu.pipelines.sampling import (
    Conditioning, make_cfg_denoiser, sample_dpm, sample_euler)
from video_style_transfer_tpu.schedulers.ddpm import make_schedule
from video_style_transfer_tpu.schedulers.dpm import dpm_timetable
from video_style_transfer_tpu.schedulers.euler import euler_timetable


def default_time_ids(height: int, width: int, batch: int,
                     dtype=jnp.float32):
    """SDXL micro-conditioning: (orig_h, orig_w, crop_top, crop_left,
    target_h, target_w) (pipeline_stable_diffusion_xl.py:468-507)."""
    ids = jnp.asarray([[height, width, 0, 0, height, width]], dtype)
    return jnp.tile(ids, (batch, 1))


def generate_latents(unet_params, unet_cfg, uncond: Conditioning,
                     cond: Conditioning, key, *, height: int, width: int,
                     batch: int = 1, num_steps: int = 25,
                     cfg_scale: float = 5.0, guidance_rescale: float = 0.0,
                     sampler: str = "euler", mode: str = "both", state=None,
                     num_frames: int = 1, impl: str = "auto",
                     sched=None, dtype=jnp.bfloat16,
                     vae_scale_factor: int = 8):
    """Denoise from pure noise to clean *scaled* latents.

    Defaults mirror the reference pipeline (25 steps / CFG 5.0,
    pipeline_stable_diffusion_xl.py:155,158). For video, batch is the
    total B*num_frames row count.
    """
    if sched is None:
        sched = make_schedule()
    latent_shape = (batch, height // vae_scale_factor,
                    width // vae_scale_factor, unet_cfg.in_channels)
    # A STACK of PRNG keys — one independent seed per row (batched
    # serving of distinct seeds) — is a (batch, 2) array for raw uint32
    # keys or a (batch,)-shaped typed-key array (jax.random.key). Each
    # row's noise is drawn with shape (1, ...) so it is bitwise-identical
    # to a batch-1 run with that key.
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        is_stack = key.ndim == 1
    else:
        is_stack = key.ndim == 2
    if is_stack:
        assert key.shape[0] == batch, (key.shape, batch)
        noise = jnp.concatenate(
            [jax.random.normal(key[i], (1,) + latent_shape[1:], dtype)
             for i in range(batch)], axis=0)
    else:
        noise = jax.random.normal(key, latent_shape, dtype)

    eps_fn = make_cfg_denoiser(
        unet_params, unet_cfg, uncond, cond, cfg_scale=cfg_scale,
        guidance_rescale=guidance_rescale, mode=mode, state=state,
        num_frames=num_frames, impl=impl, dtype=dtype)

    if sampler == "euler":
        table = euler_timetable(sched, num_steps)
        latents = noise * table["init_sigma"].astype(dtype)
        return sample_euler(eps_fn, latents, table)
    if sampler == "dpm":
        table = dpm_timetable(sched, num_steps)
        latents = noise  # VP-scaled: sigma_0 ~= 1
        return sample_dpm(eps_fn, latents, table)
    raise ValueError(sampler)


def decode_images(vae_params, vae_cfg, latents, *, dtype=jnp.float32):
    """VAE decode -> uint8 HWC images. Default fp32 matches the
    reference, which forces fp32 decode because the SDXL VAE overflows
    fp16's range (pipeline_stable_diffusion_xl.py:628-649).

    dtype=jnp.bfloat16 is the TPU-native opt-in speed knob
    (cli --vae_dtype bfloat16): bf16 keeps fp32's exponent range, so the
    fp16 overflow that forced the reference to fp32 cannot occur; the
    cost is bf16 mantissa noise in the decoded pixels (sub-1% of range,
    measured in tests/test_pipelines.py::test_decode_bf16_close_to_fp32
    and PERF.md round-3). Not the default: fp32 is the parity path.

    Note: the reference stamps SDXL's invisible watermark at postprocess
    when the `invisible-watermark` package is installed; the native
    equivalent is utils/watermark.py (host-side uint8 pass, applied by
    cli/infer.py --watermark outside this jitted program)."""
    if dtype != jnp.float32:
        vae_params = jax.tree.map(lambda a: a.astype(dtype), vae_params)
    imgs = vae_decode(vae_params, vae_cfg, latents.astype(dtype))
    imgs = jnp.clip(imgs.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
    return jnp.round(imgs * 255.0).astype(jnp.uint8)


def generate_images(unet_params, unet_cfg, vae_params, vae_cfg,
                    uncond: Conditioning, cond: Conditioning, key, *,
                    height: int = 1024, width: int = 1024, batch: int = 1,
                    num_steps: int = 25, cfg_scale: float = 5.0,
                    guidance_rescale: float = 0.0, sampler: str = "euler",
                    mode: str = "both", state=None, impl: str = "auto",
                    dtype=jnp.bfloat16, vae_scale_factor: int = 8):
    """Full text-embeddings -> uint8 images program (jit this whole
    function; everything inside is traceable)."""
    latents = generate_latents(
        unet_params, unet_cfg, uncond, cond, key, height=height,
        width=width, batch=batch, num_steps=num_steps, cfg_scale=cfg_scale,
        guidance_rescale=guidance_rescale, sampler=sampler, mode=mode,
        state=state, impl=impl, dtype=dtype,
        vae_scale_factor=vae_scale_factor)
    return decode_images(vae_params, vae_cfg, latents)
