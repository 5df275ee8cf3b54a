"""UnZipLoRA dual-branch LoRA — the research core, re-derived functionally.

The reference implements this as a mutating nn.Module
(unziplora_unet/unziplora_linear_layer.py:7-263): per-projection content and
style LoRA pairs, learnable per-output-column *merger* vectors clamped to
[0, 1], boolean hard column masks driven by a cone (W .* dW) importance
score, and a ``forward_type`` attribute walked over the whole UNet.

Here everything is explicit data:

- ``params``  (trainable):  content/style down/up matrices + merger vectors
- ``state``   (non-trainable): column masks, mask-enable flags, branch
  gates, accumulated cone scores
- ``mode``    (static str): 'base' | 'both' | 'content' | 'style' — three
  jitted variants instead of module mutation
  (reference: unziplora_set_forward_type, unziplora_unet/utils.py:162-174)

The forward uses the factored rank-space form
``(x @ down) @ (up * gate)`` which is mathematically identical to the
reference's materialized ``(down^T @ up^T) * merge * mask`` product
(unziplora_linear_layer.py:233-245) because merge/mask act per *output
column* — but costs O(r(d_in+d_out)) instead of O(d_in*d_out) per token.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Mode = str  # 'base' | 'both' | 'content' | 'style'
BRANCHES = ("content", "style")


def init_unzip_lora_params(key, in_features: int, out_features: int,
                           rank: int = 64, dtype=jnp.float32):
    """Both down and up ~ N(0, 1/rank) — note the reference deliberately
    does NOT use the standard LoRA zero-init for up
    (unziplora_linear_layer.py:31-32), so the delta is nonzero at step 0.
    Orientation is matmul-friendly: down (in, r), up (r, out)."""
    kc1, kc2, ks1, ks2 = jax.random.split(key, 4)
    std = 1.0 / rank

    def pair(k1, k2):
        return {
            "down": jax.random.normal(k1, (in_features, rank), dtype) * std,
            "up": jax.random.normal(k2, (rank, out_features), dtype) * std,
        }

    return {
        "content": pair(kc1, kc2),
        "style": pair(ks1, ks2),
        "merge_content": jnp.ones((out_features,), dtype),
        "merge_style": jnp.ones((out_features,), dtype),
    }


def init_unzip_lora_state(out_features: int):
    """Non-trainable per-layer state.

    mask_*        hard column filter (reference mask_content/style,
                  unziplora_linear_layer.py:44-45)
    use_mask_*    whether the filter participates in the forward
                  (reference masked_matrix dict, :26,36)
    on_*          branch gate for inference block separation — a False
                  zeroes the whole branch (reference infer-layer semantics,
                  :308-317)
    score_*       cone column scores (reference column_score_*, :42-43)
    """
    st = {}
    for b in BRANCHES:
        st[f"mask_{b}"] = jnp.zeros((out_features,), jnp.bool_)
        st[f"use_mask_{b}"] = jnp.asarray(False)
        st[f"on_{b}"] = jnp.asarray(True)
        st[f"score_{b}"] = jnp.zeros((out_features,), jnp.float32)
    return st


def _column_gate(params, state, branch: str, with_merge: bool):
    """Per-output-column multiplicative gate for one branch."""
    out_features = params[f"merge_{branch}"].shape[0]
    gate = jnp.ones((out_features,), params[f"merge_{branch}"].dtype)
    if with_merge:
        gate = gate * params[f"merge_{branch}"]
    if state is not None:
        mask = jnp.where(state[f"use_mask_{branch}"],
                         state[f"mask_{branch}"].astype(gate.dtype),
                         jnp.ones_like(gate))
        gate = gate * mask * state[f"on_{branch}"].astype(gate.dtype)
    return gate


def _branch_out(params, state, branch, x, with_merge, compute_dtype):
    p = params[branch]
    gate = _column_gate(params, state, branch, with_merge)
    h = jnp.dot(x.astype(compute_dtype), p["down"].astype(compute_dtype),
                preferred_element_type=compute_dtype)
    return jnp.dot(h, p["up"].astype(compute_dtype) * gate[None, :],
                   preferred_element_type=compute_dtype)


def apply_unzip_lora(params, x_content, x_style=None, *, mode: Mode = "both",
                     state=None, compute_dtype=jnp.float32):
    """LoRA delta output (to be added to the base projection).

    mode='both'    merge * mask gated sum of both branches
                   (unziplora_linear_layer.py:228-246)
    mode='content' content branch, mask only, NO merger
                   (:247-254 — single-branch modes skip the merger)
    mode='style'   style branch, mask only, NO merger (:255-262)
    """
    if mode == "base":
        return jnp.zeros(x_content.shape[:-1] + (params["merge_content"].shape[0],),
                         x_content.dtype)
    orig_dtype = x_content.dtype
    if x_style is None:
        x_style = x_content
    if mode == "both":
        out = (_branch_out(params, state, "content", x_content, True, compute_dtype)
               + _branch_out(params, state, "style", x_style, True, compute_dtype))
    elif mode == "content":
        out = _branch_out(params, state, "content", x_content, False, compute_dtype)
    elif mode == "style":
        out = _branch_out(params, state, "style", x_style, False, compute_dtype)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return out.astype(orig_dtype)


def dual_linear(p, x, x_content=None, x_style=None, *, mode: Mode = "base",
                state=None, precision=None):
    """Base linear + optional UnZipLoRA delta.

    Functional replacement for the reference's dual-input
    LoRACompatibleLinear (unziplora_unet/lora_unzip.py:66-75): the base path
    runs in the activation dtype (bf16 on TPU), the LoRA branch in fp32
    (matching the reference's ``.to(dtype)`` upcast).
    """
    y = jnp.dot(x, p["kernel"].astype(x.dtype), precision=precision)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(y.dtype)
    if mode != "base" and "lora" in p:
        y = y + apply_unzip_lora(
            p["lora"],
            x if x_content is None else x_content,
            x if x_style is None else x_style,
            mode=mode, state=state)
    return y


# ---------------------------------------------------------------------------
# Merger similarity loss
# ---------------------------------------------------------------------------

def mergers_similarity(params, state=None):
    """mean |merge_c * merge_s| per layer; once both masks are active the
    mergers are first multiplied by their masks
    (reference compute_mergers_similarity, unziplora_linear_layer.py:59-65)."""
    mc = params["merge_content"]
    ms = params["merge_style"]
    plain = jnp.mean(jnp.abs(mc * ms))
    if state is None:
        return plain
    masked = jnp.mean(jnp.abs((mc * state["mask_content"])
                              * (ms * state["mask_style"])))
    both_masked = jnp.logical_and(state["use_mask_content"],
                                  state["use_mask_style"])
    return jnp.where(both_masked, masked, plain)


# ---------------------------------------------------------------------------
# Cone (W .* dW) — the gradient-importance diagnostic that drives column
# selection (reference get_unziplora_cone, unziplora_linear_layer.py:117-146)
# ---------------------------------------------------------------------------

def composed_delta(params, branch: str, with_merge: bool = False):
    """The composed (in, out) LoRA delta W = down @ up [* merge]."""
    w = params[branch]["down"] @ params[branch]["up"]
    if with_merge:
        w = w * params[f"merge_{branch}"][None, :]
    return w


def cone_matrix(params, grads, branch: str):
    """cone = W .* dW with dW by the product rule including the merger term
    (reference :126-141, the fully-populated gradient case):

        W  = down @ up                       (composed, no merger)
        dW = (d_down @ up + down @ d_up) * merge + W * d_merge

    Note: in every LIVE reference call the merger term is zero — cone is
    only evaluated during/at the end of a sampling window, where the
    mergers are frozen (requires_grad=False since the reset,
    train_unziplora.py:2146-2148) so merge_matrix.grad is None/zeros and
    :126-131's None branch applies. Select-time callers must pass a zero
    g_merge to match (training/stage1.column_sep_update does); the full
    product rule stays available for diagnostics."""
    down, up = params[branch]["down"], params[branch]["up"]
    g_down, g_up = grads[branch]["down"], grads[branch]["up"]
    merge = params[f"merge_{branch}"]
    g_merge = grads[f"merge_{branch}"]
    w = down @ up
    dw = (g_down @ up + down @ g_up) * merge[None, :] + w * g_merge[None, :]
    return w * dw


def cone_columns(params, grads, branch: str, threshold: float = 1e-5):
    """Per-column cone sparsity score: fraction of rows with |cone| above
    threshold (reference :145-146, the accumulate=False path used at
    selection time)."""
    cone = cone_matrix(params, grads, branch)
    return jnp.sum(jnp.abs(cone) > threshold, axis=0).astype(jnp.float32) / cone.shape[0]


def select_columns(score_content, score_style, prev_mask_content,
                   prev_mask_style, *, ratio: float, avoid: bool = True):
    """Top-k column selection with content priority, OR'd with previous
    masks (reference mask_updated_elements key=None path,
    unziplora_linear_layer.py:186-207).

    Content picks columns with score strictly above its k-th best score;
    with ``avoid``, columns already claimed by content are pushed to -inf
    before the style pick.
    """
    out_features = score_content.shape[0]
    k = max(int(out_features * ratio), 1)

    top_c = jax.lax.top_k(score_content, k)[0]
    thresh_c = top_c[-1]
    mask_content = (score_content > thresh_c) | prev_mask_content

    masked_style = jnp.where(avoid & mask_content,
                             -jnp.inf, score_style)
    top_s = jax.lax.top_k(masked_style, k)[0]
    thresh_s = top_s[-1]
    mask_style = (masked_style > thresh_s) | prev_mask_style
    return mask_content, mask_style


def folded_delta(params, state, *, mode: Mode = "both"):
    """The composed, fully-gated (in, out) delta this layer adds when both
    input streams coincide — for folding into the base kernel at load
    time (serving optimization; TPU analog of the reference's _fuse_lora,
    unziplora_unet/lora_unzip.py:18-48). Matches apply_unzip_lora's
    per-mode gating exactly."""
    def one(branch, with_merge):
        gate = _column_gate(params, state, branch, with_merge)
        return (params[branch]["down"] @ params[branch]["up"]) * gate[None]

    if mode == "both":
        return one("content", True) + one("style", True)
    if mode == "content":
        return one("content", False)
    if mode == "style":
        return one("style", False)
    raise ValueError(mode)


def export_weights(params, state, branch: str):
    """(down, up) pair in the reference save orientation
    ((r, in), (out, r)) with the column gate folded into up: the mask if the
    filter is active, else the merger
    (reference get_unziplora_weight, unziplora_linear_layer.py:104-115)."""
    down = params[branch]["down"].T  # (r, in)
    up = params[branch]["up"].T      # (out, r)
    merge = params[f"merge_{branch}"]
    if state is not None and bool(state[f"use_mask_{branch}"]):
        gate = state[f"mask_{branch}"].astype(up.dtype)
    else:
        gate = merge
    return down, up * gate[:, None]
