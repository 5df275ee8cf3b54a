"""Temporal LoRA for motion-module attention projections.

Reference: animatediff/temporal_lora.py:10-41 — a frozen base Linear plus
``(alpha/rank) * B @ A`` with A ~ N(0, 0.01), B = 0 (delta is exactly zero
at step 0, unlike the UnZipLoRA branches). Here the adapter is a params
sub-dict attached under key 'tlora' on a projection's params; application
is factored rank-space, orientation a: (in, r), b: (r, out).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_temporal_lora(key, in_features: int, out_features: int, *,
                       rank: int = 32, alpha: float = 1.0,
                       init_std: float = 0.01, dtype=jnp.float32):
    return {
        "a": jax.random.normal(key, (in_features, rank), dtype) * init_std,
        "b": jnp.zeros((rank, out_features), dtype),
        # static scale stored as a 0-d array so the pytree is uniform
        "scale": jnp.asarray(alpha / rank, dtype),
    }


def apply_temporal_lora(p, x, compute_dtype=jnp.float32):
    orig = x.dtype
    h = jnp.dot(x.astype(compute_dtype), p["a"].astype(compute_dtype),
                preferred_element_type=compute_dtype)
    y = jnp.dot(h, p["b"].astype(compute_dtype),
                preferred_element_type=compute_dtype)
    return (y * p["scale"]).astype(orig)


def temporal_delta(p):
    """Composed (in, out) delta, scale applied — used by the orthogonality
    loss and the merged-weight export (reference get_delta, :34-36)."""
    return (p["a"] @ p["b"]) * p["scale"]


def merge_into_kernel(kernel, p):
    """Fold the delta into the base kernel for wrapper-free inference
    checkpoints (reference merged_weight :38-41 /
    get_merged_motion_state_dict, temporal_lora.py:169-192)."""
    return kernel + temporal_delta(p).astype(kernel.dtype)


def orthogonality_loss(tlora, spatial_lora, compute_dtype=jnp.float32):
    """||D_t^T D_c||_F^2 + ||D_t^T D_s||_F^2 for one paired layer
    (reference compute_orth_loss, temporal_lora.py:126-166; spatial deltas
    are stop-gradiented, matching the frozen Stage-1 LoRAs).

    With D_t = a_t b_t (in, out_t) and D_c = a_c b_c (in, out_c):
        ||D_t^T D_c||_F^2 = tr(P^T G_t P G_c)
    where P = a_t^T a_c (rt, rc), G_t = b_t b_t^T (rt, rt),
    G_c = b_c b_c^T (rc, rc) — everything stays in rank space; no
    (out, out) or (in, out) matrix is ever materialized (the reference
    forms the full (out, in) deltas per layer)."""
    a_t = tlora["a"].astype(compute_dtype)                       # (in, rt)
    b_t = tlora["b"].astype(compute_dtype) * tlora["scale"]      # (rt, out)
    g_t = b_t @ b_t.T                                            # (rt, rt)

    def one(branch):
        a = jax.lax.stop_gradient(
            spatial_lora[branch]["down"]).astype(compute_dtype)  # (in, rc)
        b = jax.lax.stop_gradient(
            spatial_lora[branch]["up"]).astype(compute_dtype)    # (rc, out)
        p = a_t.T @ a                                            # (rt, rc)
        g_c = b @ b.T                                            # (rc, rc)
        return jnp.sum((p.T @ g_t @ p) * g_c)

    return one("content") + one("style")
