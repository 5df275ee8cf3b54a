"""Shared CLI runtime: model assembly, text encoding, latent prep.

Two source modes:
- --pretrained_model <dir>: diffusers-layout SDXL directory (converted
  via utils/hf_convert); tokenizers load from the same directory.
- --smoke: tiny random-init models, synthetic conditioning — exercises
  the full wiring with no weights (this environment has none).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from video_style_transfer_tpu.config import CLIPConfig, UNetConfig, VAEConfig
from video_style_transfer_tpu.models.clip import encode_sdxl_prompt
from video_style_transfer_tpu.models.unet import init_unet
from video_style_transfer_tpu.models.vae import (init_vae, vae_encode,
                                                 vae_encode_moments)
from video_style_transfer_tpu.pipelines.image import default_time_ids
from video_style_transfer_tpu.pipelines.sampling import Conditioning


# Universal negative prompt (reference's hard-coded quality navigate list,
# unziplora_unet/utils.py:29-33)
DEFAULT_NEGATIVE_PROMPT = (
    "watermark, lowres, low quality, blur, out of focus, grainy, "
    "jpeg artifacts, cropped, poorly lit, duplicate")


@dataclass
class ModelBundle:
    unet: Any
    unet_cfg: UNetConfig
    vae: Any
    vae_cfg: VAEConfig
    clip_l: Any
    clip_l_cfg: CLIPConfig
    clip_g: Any
    clip_g_cfg: CLIPConfig
    tokenizer: Any = None       # pads with EOS
    tokenizer_2: Any = None     # pads with 0
    vae_scale_factor: int = 8
    pooled_dim: int = 1280
    smoke: bool = False


def enable_compile_cache(cache_dir: Optional[str] = None):
    """Point XLA's persistent compilation cache at a directory so repeat
    serving/training launches skip the multi-minute SDXL trace+compile
    (round-1 measured the full video pipeline at ~190 s cold). Called by
    every CLI main; JAX_COMPILATION_CACHE_DIR overrides, and an explicit
    --compilation_cache_dir argument overrides both. Safe to call twice;
    never raises (some backends reject the option).

    The default is per-user (~/.cache/jax), not a fixed /tmp path: a
    world-writable shared dir lets another local user pre-create it or
    poison cached executables."""
    cache = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
             or os.path.join(os.path.expanduser("~"), ".cache", "jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass


def tiny_checkpoint_configs(motion: bool = False):
    """Self-consistent tiny (UNet, VAE, CLIP-L, CLIP-G) configs for a
    synthetic diffusers-layout checkpoint directory: the two CLIP hidden
    sizes sum to the UNet's cross_attention_dim (16+16=32) and the big
    encoder's projection_dim matches the UNet's pooled conditioning slot
    (32 = projection_class_embeddings_input_dim - 6*addition_time_embed
    _dim). Used by the parity-gate runbook (cli/verify_parity.py) to
    smoke the full inventory->load->generate->compare chain with no real
    weights."""
    return (UNetConfig.tiny(use_motion_modules=motion), VAEConfig.tiny(),
            CLIPConfig.tiny(), CLIPConfig.tiny(projection_dim=32))


def load_models(pretrained_model: Optional[str], *, smoke: bool = False,
                motion: bool = False, dtype=jnp.bfloat16,
                seed: int = 0, vae_path: Optional[str] = None,
                configs=None) -> ModelBundle:
    """configs: optional (UNetConfig, VAEConfig, CLIPConfig, CLIPConfig)
    override for non-SDXL-sized checkpoint directories (the parity-gate
    runbook's tiny-synthetic smoke path); pooled_dim / vae_scale_factor
    derive from the configs."""
    if smoke or not pretrained_model:
        ucfg = UNetConfig.tiny(use_motion_modules=motion)
        vcfg = VAEConfig.tiny()
        lcfg = CLIPConfig.tiny()
        gcfg = CLIPConfig.tiny(projection_dim=16)
        k = jax.random.PRNGKey(seed)
        from video_style_transfer_tpu.models.clip import init_clip
        return ModelBundle(
            unet=init_unet(jax.random.PRNGKey(seed), ucfg, dtype=jnp.float32),
            unet_cfg=ucfg,
            vae=init_vae(jax.random.PRNGKey(seed + 1), vcfg),
            vae_cfg=vcfg,
            clip_l=init_clip(jax.random.PRNGKey(seed + 2), lcfg),
            clip_l_cfg=lcfg,
            clip_g=init_clip(jax.random.PRNGKey(seed + 3), gcfg),
            clip_g_cfg=gcfg,
            vae_scale_factor=2,
            pooled_dim=32,
            smoke=True,
        )

    from video_style_transfer_tpu.data.tokenizer import CLIPTokenizer
    from video_style_transfer_tpu.utils.hf_convert import load_sdxl

    bundle = load_sdxl(pretrained_model, dtype=dtype, with_motion=motion,
                       vae_dir=vae_path, configs=configs)
    tok = tok2 = None
    tok_dir = os.path.join(pretrained_model, "tokenizer")
    tok2_dir = os.path.join(pretrained_model, "tokenizer_2")
    if os.path.isdir(tok_dir):
        tok = CLIPTokenizer.from_dir(tok_dir)
    if os.path.isdir(tok2_dir):
        tok2 = CLIPTokenizer.from_dir(tok2_dir, pad_token_id=0)
    unet, ucfg = bundle["unet"]
    vae, vcfg = bundle["vae"]
    clip_l, lcfg = bundle["clip_l"]
    clip_g, gcfg = bundle["clip_g"]
    return ModelBundle(unet, ucfg, vae, vcfg, clip_l, lcfg, clip_g, gcfg,
                       tokenizer=tok, tokenizer_2=tok2,
                       vae_scale_factor=2 ** (len(vcfg.block_out_channels)
                                              - 1),
                       pooled_dim=gcfg.projection_dim or gcfg.hidden_size)


def encode_prompt(bundle: ModelBundle, prompt: str,
                  prompt_2: Optional[str] = None) -> Tuple:
    """(embeds (1, S, D), pooled (1, P)). prompt_2 optionally feeds the
    second (OpenCLIP) encoder a different text, like the reference
    pipeline's prompt_2 (pipeline_stable_diffusion_xl.py:145-196). Smoke
    mode (no tokenizer): deterministic pseudo-embeddings from the prompt
    hash."""
    if bundle.tokenizer is None:
        if not bundle.smoke:
            # a weight-only model dir without tokenizer/ must not fall
            # through to pseudo-embeddings against REAL weights
            raise SystemExit(
                "no tokenizer/ found in the model directory; real-weight "
                "inference needs the CLIP tokenizers (or pass --smoke)")
        # stable digest: hash() is salted per process, which would make
        # smoke runs non-reproducible across invocations
        import zlib
        seed = zlib.crc32(repr((prompt, prompt_2)).encode()) % (2 ** 31)
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        d = bundle.unet_cfg.cross_attention_dim
        return (jax.random.normal(k1, (1, 7, d)),
                jax.random.normal(k2, (1, bundle.pooled_dim)))
    if bundle.tokenizer_2 is None:
        raise SystemExit("tokenizer/ present but tokenizer_2/ missing — "
                         "SDXL needs both CLIP tokenizers")
    ids_l = jnp.asarray(bundle.tokenizer(prompt))
    ids_g = jnp.asarray(bundle.tokenizer_2(prompt_2 or prompt))
    # pass the vocab's actual EOS ids (= 49407 for both SDXL tokenizers;
    # differs for the synthetic tiny-checkpoint vocab)
    return encode_sdxl_prompt(bundle.clip_l, bundle.clip_l_cfg,
                              bundle.clip_g, bundle.clip_g_cfg,
                              ids_l, ids_g,
                              eos_l=bundle.tokenizer.eos_token_id,
                              eos_g=bundle.tokenizer_2.eos_token_id)


def make_conditioning(bundle: ModelBundle, prompt: str,
                      prompt_content: Optional[str] = None,
                      prompt_style: Optional[str] = None, *,
                      height: int, width: int,
                      prompt_2: Optional[str] = None,
                      prompt_content_2: Optional[str] = None,
                      prompt_style_2: Optional[str] = None) -> Conditioning:
    """Triple-stream conditioning. The ``*_2`` prompts feed the second
    (OpenCLIP bigG) tokenizer/encoder a different text per stream,
    matching the reference pipeline's prompt_2/prompt_content_2/
    prompt_style_2 surface (pipeline_stable_diffusion_xl.py:145-196)."""
    emb, pooled = encode_prompt(bundle, prompt, prompt_2)
    emb_c = emb_s = None
    if prompt_content is not None:
        emb_c, _ = encode_prompt(bundle, prompt_content, prompt_content_2)
    if prompt_style is not None:
        emb_s, _ = encode_prompt(bundle, prompt_style, prompt_style_2)
    return Conditioning(ctx=(emb, emb_c, emb_s), pooled=pooled,
                        time_ids=default_time_ids(height, width, 1))


def negative_conditioning(bundle: ModelBundle, negative_prompt: str, *,
                          height: int, width: int,
                          negative_prompt_2: Optional[str] = None,
                          negative_prompt_content: Optional[str] = None,
                          negative_prompt_content_2: Optional[str] = None,
                          negative_prompt_style: Optional[str] = None,
                          negative_prompt_style_2: Optional[str] = None
                          ) -> Conditioning:
    """Unconditional side of the CFG pair. Per-stream negatives mirror
    the reference's negative_prompt_content/style (+_2) arguments
    (pipeline_stable_diffusion_xl.py:159-164); unspecified streams share
    the combined negative, exactly as there."""
    emb, pooled = encode_prompt(bundle, negative_prompt, negative_prompt_2)
    emb_c = emb_s = emb
    if negative_prompt_content is not None:
        emb_c, _ = encode_prompt(bundle, negative_prompt_content,
                                 negative_prompt_content_2)
    if negative_prompt_style is not None:
        emb_s, _ = encode_prompt(bundle, negative_prompt_style,
                                 negative_prompt_style_2)
    return Conditioning(ctx=(emb, emb_c, emb_s), pooled=pooled,
                        time_ids=default_time_ids(height, width, 1))


def encode_latents(bundle: ModelBundle, images: np.ndarray,
                   key: Optional[jax.Array] = None) -> jnp.ndarray:
    """(N, H, W, 3) [-1,1] -> scaled latents. fp32 encode (the reference
    keeps the VAE fp32 in training, train_animatediff.py:67-71)."""
    return vae_encode(bundle.vae, bundle.vae_cfg,
                      jnp.asarray(images, jnp.float32), key=key)


def encode_latent_moments(bundle: ModelBundle, images: np.ndarray):
    """(N, H, W, 3) [-1,1] -> posterior (mean, logvar), unscaled. The
    trainers precompute these once for their fixed image sets and draw
    `mean + std*eps` per step — matching the reference's per-step
    `latent_dist.sample()` (train_unziplora.py:2023) without re-running
    the encoder."""
    return vae_encode_moments(bundle.vae, bundle.vae_cfg,
                              jnp.asarray(images, jnp.float32))


def sample_scaled_latents(bundle: ModelBundle, moments, idx,
                          key: jax.Array) -> jnp.ndarray:
    """Draw scaled latents for rows `idx` of precomputed moments."""
    mean, logvar = moments
    mean, logvar = mean[idx], logvar[idx]
    z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
        key, mean.shape, mean.dtype)
    return z * bundle.vae_cfg.scaling_factor


class LatentMomentCache:
    """Per-frame VAE posterior-moment cache for video training.

    The reference re-encodes every sampled clip each step
    (train_animatediff.py:220-224) even though consecutive-start clips
    of the same video overlap almost entirely — at 8f@1024^2 fp32 that
    is 0.82 s/step of encode on a v5e chip (benchmarks/vae_encode.py)
    against a 2.07 s train step. The posterior moments (mean, logvar)
    of a frame are deterministic, so they are cached per
    (video_idx, frame_idx) and only the stochastic draw
    ``mean + std * eps`` happens per step — the latent DISTRIBUTION is
    exactly the reference's, with a fresh eps each step, and the draw
    uses the same key/shape as the uncached `vae_encode` path.

    Entries are ~0.5 MB host RAM per 1024^2 frame; `max_entries` bounds
    the cache (uncached frames fall back to direct encode without
    insertion once full).
    """

    def __init__(self, bundle: ModelBundle, max_entries: int = 4096,
                 chunk: int = 1):
        self.bundle = bundle
        self.max_entries = max_entries
        self.chunk = chunk
        self._cache: Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray]] = {}
        self._enc = jax.jit(lambda p, x: vae_encode_moments(
            p, bundle.vae_cfg, x))

    def _moments(self, frames_flat: np.ndarray, ids_flat):
        fresh: Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray]] = {}
        # one encode per DISTINCT missing id (pad-repeat tails and
        # overlapping clips duplicate ids within a batch)
        seen = set()
        missing = []
        for k, fid in enumerate(ids_flat):
            if fid not in self._cache and fid not in seen:
                seen.add(fid)
                missing.append(k)
        for s in range(0, len(missing), self.chunk):
            grp = missing[s:s + self.chunk]
            m, lv = self._enc(self.bundle.vae,
                              jnp.asarray(frames_flat[grp], jnp.float32))
            m, lv = np.asarray(m), np.asarray(lv)
            for j, k in enumerate(grp):
                fresh[ids_flat[k]] = (m[j], lv[j])
                if len(self._cache) < self.max_entries:
                    self._cache[ids_flat[k]] = (m[j], lv[j])
        look = lambda fid: self._cache.get(fid) or fresh[fid]
        means, logvars = zip(*(look(fid) for fid in ids_flat))
        return np.stack(means), np.stack(logvars)

    def latents(self, frames: np.ndarray, ids, key: jax.Array):
        """frames (B, F, H, W, 3), ids[b][j] = hashable frame identity;
        returns scaled latents (B*F, H/8, W/8, C) — same key/shape draw
        as `encode_latents(bundle, frames.reshape(-1,...), key)`."""
        b, f = frames.shape[:2]
        flat = frames.reshape((-1,) + frames.shape[2:])
        ids_flat = [fid for clip in ids for fid in clip]
        mean, logvar = self._moments(flat, ids_flat)
        mean = jnp.asarray(mean, jnp.float32)
        std = jnp.exp(0.5 * jnp.asarray(logvar, jnp.float32))
        z = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        return z * self.bundle.vae_cfg.scaling_factor
