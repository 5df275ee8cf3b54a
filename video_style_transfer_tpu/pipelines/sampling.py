"""Shared denoise loops: scan-compiled samplers with batched CFG.

The reference's Python denoise loops
(pipeline_stable_diffusion_xl.py:564-626; inference_animatediff.py:104-131
which even runs CFG as two *sequential* UNet calls) become single
lax.scan programs with the classifier-free pair batched along the leading
axis — one compiled program per (steps, mode) with zero host round-trips.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from video_style_transfer_tpu.models.unet import unet_apply
from video_style_transfer_tpu.schedulers.euler import (
    euler_step, scale_model_input)
from video_style_transfer_tpu.schedulers.dpm import (
    dpm_init_carry, dpm_step, to_x0)


class Conditioning(NamedTuple):
    """One side of the CFG pair."""
    ctx: Tuple          # (combined, content, style) prompt embeddings
    pooled: jnp.ndarray
    time_ids: jnp.ndarray


def tile_conditioning(c: Conditioning, n: int) -> Conditioning:
    """Repeat a batch-1 Conditioning to n serving rows (batched image
    serving: the same prompt set conditions every sample in the batch)."""
    def rep(x):
        if x is None:
            return None
        return jnp.tile(x, (n,) + (1,) * (x.ndim - 1))

    return Conditioning(ctx=tuple(rep(e) for e in c.ctx),
                        pooled=rep(c.pooled), time_ids=rep(c.time_ids))


def _cat_cond(uncond: Conditioning, cond: Conditioning) -> Conditioning:
    def cat(a, b):
        if a is None and b is None:
            return None
        return jnp.concatenate([a, b], axis=0)

    def cat_ctx(i):
        a, b = uncond.ctx[i], cond.ctx[i]
        if a is None and b is None:
            return None
        # a None content/style stream means "fall back to that side's
        # combined prompt" (attention()'s convention) — resolve per
        # side BEFORE concatenating; substituting the other side's
        # embedding would leak cond<->uncond prompts across the pair
        if a is None:
            a = uncond.ctx[0]
        if b is None:
            b = cond.ctx[0]
        return cat(a, b)

    return Conditioning(
        ctx=tuple(cat_ctx(i) for i in range(len(uncond.ctx))),
        pooled=cat(uncond.pooled, cond.pooled),
        time_ids=cat(uncond.time_ids, cond.time_ids),
    )


def rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale: float):
    """CFG rescale (reference pipeline_stable_diffusion_xl.py:40-54 /
    "Common Diffusion Noise Schedules are Flawed" §3.4)."""
    axes = tuple(range(1, noise_cfg.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg)
    return (guidance_rescale * rescaled
            + (1.0 - guidance_rescale) * noise_cfg)


def make_cfg_denoiser(unet_params, unet_cfg, uncond: Conditioning,
                      cond: Conditioning, *, cfg_scale: float,
                      guidance_rescale: float = 0.0, mode: str = "both",
                      state=None, num_frames: int = 1, impl: str = "auto",
                      remat: bool = False, precompute_kv: bool = True,
                      dtype=None):
    """Returns eps_fn(latents, t) with classifier-free guidance batched
    as a doubled leading axis ([uncond, cond] ordering).

    precompute_kv: evaluate every cross-attention's prompt-side k/v
    projections ONCE here (they are invariant across denoise steps)
    instead of on every step inside the sampling scan — for the
    triple-prompt image path with live LoRA branches that removes
    1000+ tiny matmuls per step. `dtype` casts the prompt embeddings
    before projecting (pipelines pass their latent dtype so the math
    matches the uncached path bit for bit)."""
    both = _cat_cond(uncond, cond)
    kv = None
    if precompute_kv:
        from video_style_transfer_tpu.models.unet import precompute_cross_kv
        kv = precompute_cross_kv(unet_params, unet_cfg, both.ctx,
                                 mode=mode, state=state, dtype=dtype,
                                 num_frames=num_frames)

    def eps_fn(latents, t):
        doubled = jnp.concatenate([latents, latents], axis=0)
        out = unet_apply(unet_params, unet_cfg, doubled, t, both.ctx,
                         both.pooled, both.time_ids, mode=mode, state=state,
                         num_frames=num_frames, impl=impl, remat=remat,
                         cross_kv=kv)
        eps_u, eps_c = jnp.split(out, 2, axis=0)
        eps = eps_u + cfg_scale * (eps_c - eps_u)
        if guidance_rescale > 0.0:
            eps = rescale_noise_cfg(eps, eps_c, guidance_rescale)
        return eps

    return eps_fn


def sample_euler(eps_fn, latents, table):
    """Scan the Euler schedule. `latents` must already be scaled by
    table['init_sigma']."""
    sigmas = table["sigmas"]
    timesteps = table["timesteps"]
    n = timesteps.shape[0]

    def body(x, i):
        sigma = sigmas[i]
        t = timesteps[i]
        model_in = scale_model_input(x, sigma)
        eps = eps_fn(model_in, t)
        return euler_step(x, eps, sigma, sigmas[i + 1]), None

    latents, _ = jax.lax.scan(body, latents, jnp.arange(n))
    return latents


def sample_dpm(eps_fn, latents, table):
    """Scan DPM-Solver++ 2M. `latents` must be alpha/sigma-scaled noise
    (for pure noise init: latents = noise, since alpha_0~0, sigma_0~1 the
    caller multiplies by nothing — DPM tables are VP-scaled)."""
    timesteps = table["timesteps"]
    n = timesteps.shape[0]

    def body(carry, i):
        x, mem = carry
        t = timesteps[i]
        eps = eps_fn(x, t)
        x0 = to_x0(x, eps, table["alpha"][i], table["sigma"][i])
        x_new, mem = dpm_step(x, x0, mem, i, table)
        return (x_new, mem), None

    (latents, _), _ = jax.lax.scan(
        body, (latents, dpm_init_carry(latents.shape)), jnp.arange(n))
    return latents
