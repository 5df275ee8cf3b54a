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
    """||W_t^T W_c||_F^2 + ||W_t^T W_s||_F^2 for one paired layer, where
    W = B @ A are the reference's (out, in)-oriented deltas (reference
    compute_orth_loss, temporal_lora.py:126-166; spatial deltas are
    stop-gradiented, matching the frozen Stage-1 LoRAs).

    The reference contracts over the OUT axis: W_t^T W_c = A_t^T B_t^T
    B_c A_c. In our (in, out) orientation with D = a b (a = A^T, b = B^T):
        ||W_t^T W_c||_F^2 = ||D_t D_c^T||_F^2 = tr(Q^T H_t Q H_c)
    where Q = b_t b_c^T (rt, rc, contraction over out),
    H_t = a_t^T a_t (rt, rt), H_c = a_c^T a_c (rc, rc) — everything stays
    in rank space; no (out, in) or (in, in) matrix is ever materialized
    (the reference forms the full deltas per layer)."""
    a_t = tlora["a"].astype(compute_dtype)                       # (in, rt)
    b_t = tlora["b"].astype(compute_dtype) * tlora["scale"]      # (rt, out)
    h_t = a_t.T @ a_t                                            # (rt, rt)

    def one(branch):
        a = jax.lax.stop_gradient(
            spatial_lora[branch]["down"]).astype(compute_dtype)  # (in, rc)
        b = jax.lax.stop_gradient(
            spatial_lora[branch]["up"]).astype(compute_dtype)    # (rc, out)
        q = b_t @ b.T                                            # (rt, rc)
        h_c = a.T @ a                                            # (rc, rc)
        return jnp.sum((q.T @ h_t @ q) * h_c)

    return one("content") + one("style")
