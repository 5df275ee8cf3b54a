"""CLIP text encoders (SDXL: CLIP ViT-L + OpenCLIP bigG), functional.

The reference imports transformers' CLIPTextModel(+WithProjection)
unmodified (train_unziplora.py:52-57); SDXL consumes the *penultimate*
hidden state of both encoders concatenated to 2048 channels and the
pooled/projected embedding of the big encoder
(pipeline_stable_diffusion_xl.py:400-463).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from video_style_transfer_tpu.config import CLIPConfig
from video_style_transfer_tpu.models import layers
from video_style_transfer_tpu.ops.attention import merge_heads, split_heads


def _init_clip_layer(key, cfg: CLIPConfig, dtype):
    d = cfg.hidden_size
    ks = jax.random.split(key, 6)
    return {
        "layer_norm1": layers.init_layer_norm(d, dtype),
        "q_proj": layers.init_linear(ks[0], d, d, dtype=dtype),
        "k_proj": layers.init_linear(ks[1], d, d, dtype=dtype),
        "v_proj": layers.init_linear(ks[2], d, d, dtype=dtype),
        "out_proj": layers.init_linear(ks[3], d, d, dtype=dtype),
        "layer_norm2": layers.init_layer_norm(d, dtype),
        "fc1": layers.init_linear(ks[4], d, cfg.intermediate_size,
                                  dtype=dtype),
        "fc2": layers.init_linear(ks[5], cfg.intermediate_size, d,
                                  dtype=dtype),
    }


def init_clip(key, cfg: CLIPConfig, dtype=jnp.float32):
    """'layers' is a STACKED pytree (leading num_layers axis) scanned at
    apply time — the repo-wide layout for repeated blocks. The bigG
    encoder's 32 layers would otherwise unroll at trace time on every
    cold start."""
    k1, k2, k_layers, k_proj = jax.random.split(key, 4)
    d = cfg.hidden_size
    layer_keys = jax.random.split(k_layers, cfg.num_layers)
    p = {
        "token_embedding": jax.random.normal(
            k1, (cfg.vocab_size, d), dtype) * 0.02,
        "position_embedding": jax.random.normal(
            k2, (cfg.max_position_embeddings, d), dtype) * 0.01,
        "layers": jax.vmap(
            lambda k: _init_clip_layer(k, cfg, dtype))(layer_keys),
        "final_layer_norm": layers.init_layer_norm(d, dtype),
    }
    if cfg.projection_dim is not None:
        p["text_projection"] = layers.init_linear(
            k_proj, d, cfg.projection_dim, bias=False, dtype=dtype)
    return p


def _attn(lp, x, mask, num_heads):
    q = split_heads(layers.linear(lp["q_proj"], x), num_heads)
    k = split_heads(layers.linear(lp["k_proj"], x), num_heads)
    v = split_heads(layers.linear(lp["v_proj"], x), num_heads)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bshd,bthd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + mask
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhst,bthd->bshd", w, v)
    return layers.linear(lp["out_proj"], merge_heads(o))


def _act(cfg):
    return layers.quick_gelu if cfg.hidden_act == "quick_gelu" else layers.gelu


def clip_apply(params, cfg: CLIPConfig, input_ids, *,
               eos_token_id: int = 49407) -> Tuple:
    """input_ids: (B, S) int32.

    Returns (penultimate_hidden, last_hidden, pooled):
      penultimate_hidden (B, S, d) — hidden state before the final layer
                                     (SDXL's clip-skip-1 output)
      last_hidden        (B, S, d) — after final_layer_norm
      pooled             (B, proj) — eos-token pooled, projected if the
                                     config has a text_projection
    """
    b, s = input_ids.shape
    x = params["token_embedding"][input_ids]
    x = x + params["position_embedding"][None, :s]

    causal = jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)
    mask = causal[None, None]

    act = _act(cfg)

    def body(x_, lp):
        h = layers.layer_norm(lp["layer_norm1"], x_,
                              eps=cfg.layer_norm_eps)
        x_ = x_ + _attn(lp, h, mask, cfg.num_heads)
        h = layers.layer_norm(lp["layer_norm2"], x_,
                              eps=cfg.layer_norm_eps)
        x_ = x_ + layers.linear(lp["fc2"], act(layers.linear(lp["fc1"], h)))
        return x_, None

    # scan the first L-1 stacked layers; the final layer runs unstacked
    # so the penultimate hidden state (SDXL's clip-skip-1 output) falls
    # out of the scan boundary
    stack = params["layers"]
    if cfg.num_layers > 1:
        x, _ = jax.lax.scan(body, x, jax.tree.map(lambda a: a[:-1], stack))
    penultimate = x
    x, _ = body(x, jax.tree.map(lambda a: a[-1], stack))

    last = layers.layer_norm(params["final_layer_norm"], x,
                             eps=cfg.layer_norm_eps)

    # pooled = hidden at the first EOS token position
    eos_pos = jnp.argmax((input_ids == eos_token_id).astype(jnp.int32),
                         axis=-1)
    pooled = last[jnp.arange(b), eos_pos]
    if "text_projection" in params:
        pooled = layers.linear(params["text_projection"], pooled)
    return penultimate, last, pooled


def encode_sdxl_prompt(params_l, cfg_l, params_g, cfg_g, ids_l, ids_g,
                       *, eos_l: int = 49407, eos_g: int = 49407):
    """SDXL dual-encoder text conditioning: concat penultimate hiddens
    (768 + 1280 = 2048) and take the big encoder's projected pooled
    embedding (pipeline_stable_diffusion_xl.py:400-463)."""
    pen_l, _, _ = clip_apply(params_l, cfg_l, ids_l, eos_token_id=eos_l)
    pen_g, _, pooled = clip_apply(params_g, cfg_g, ids_g, eos_token_id=eos_g)
    embeds = jnp.concatenate([pen_l, pen_g], axis=-1)
    return embeds, pooled
