"""Timestep / conditioning embeddings for the SDXL UNet.

Reference behavior: diffusers Timesteps + TimestepEmbedding plus the SDXL
"text_time" additive conditioning that Fourier-embeds 6 time_ids and
concatenates the pooled text embedding
(unziplora_unet/unet_2d_condition.py:493-507).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from video_style_transfer_tpu.models import layers


def sinusoidal_embedding(timesteps, dim: int, *, flip_sin_to_cos: bool = True,
                         freq_shift: float = 0.0, max_period: float = 10000.0):
    """get_timestep_embedding semantics: half sin / half cos with optional
    flip. timesteps: (...,) float or int array -> (..., dim) float32."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[..., None] * freqs
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos],
                          axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


def init_timestep_embedding(key, in_dim: int, embed_dim: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "linear_1": layers.init_linear(k1, in_dim, embed_dim, dtype=dtype),
        "linear_2": layers.init_linear(k2, embed_dim, embed_dim, dtype=dtype),
    }


def timestep_embedding(p, emb):
    emb = layers.linear(p["linear_1"], emb)
    emb = layers.silu(emb)
    return layers.linear(p["linear_2"], emb)


def sdxl_add_embedding(p, text_embeds, time_ids, *, addition_time_embed_dim,
                       flip_sin_to_cos=True, freq_shift=0.0):
    """SDXL added conditioning: Fourier-embed each of the 6 time_ids to
    addition_time_embed_dim, flatten, concat with pooled text embeds, and
    run through a TimestepEmbedding MLP."""
    b = time_ids.shape[0]
    time_embeds = sinusoidal_embedding(
        time_ids.reshape(-1), addition_time_embed_dim,
        flip_sin_to_cos=flip_sin_to_cos, freq_shift=freq_shift)
    time_embeds = time_embeds.reshape(b, -1)
    add_embeds = jnp.concatenate(
        [text_embeds.astype(time_embeds.dtype), time_embeds], axis=-1)
    return timestep_embedding(p, add_embeds)


def temporal_positional_encoding(num_frames: int, dim: int, max_len: int = 32):
    """Sinusoidal frame-position encoding for temporal attention
    (spec: animatediff/temporal_transformer.py:6-27). Returns (F, dim).

    num_frames > max_len raises like the reference's adapter-cap check
    (train_animatediff.py:103-107) instead of silently truncating the
    table and shape-erroring downstream."""
    if num_frames > max_len:
        raise ValueError(
            f"num_frames={num_frames} exceeds the motion modules' "
            f"positional-encoding cap max_seq_length={max_len} "
            f"(reference animatediff/temporal_transformer.py:11; adapter "
            f"cap check train_animatediff.py:103-107)")
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32)
                       * (-math.log(10000.0) / dim))
    args = position * div_term
    pe = jnp.zeros((max_len, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(args))
    pe = pe.at[:, 1::2].set(jnp.cos(args)[:, : dim // 2])
    return pe[:num_frames]
