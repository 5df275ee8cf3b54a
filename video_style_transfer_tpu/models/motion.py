"""Temporal (motion) transformer modules — AnimateDiff, TPU-first.

The reference bolts diffusers' UNetMotionModel motion modules onto the
SDXL UNet at runtime (animatediff/utils.py:13-53). Here motion modules
are first-class optional UNet sub-modules whose pytree layout mirrors
the diffusers motion-module state dict exactly, so the
guoyww/animatediff-motion-adapter-sdxl-beta checkpoint and the
reference's trained motion_modules.pth import mechanically
(utils/motion_convert.py):

  norm (GroupNorm, eps 1e-6, statistics pooled over frames AND space —
        diffusers normalizes the (B, C, F, H, W) layout)
  proj_in
  transformer_blocks.{k}:            # stacked pytree, k = 0 for SDXL
      norm1 -> [+ sinusoidal PE] -> attn1   (temporal self-attention)
      norm2 -> [+ sinusoidal PE] -> attn2   (second self-attention —
                diffusers double_self_attention=True)
      norm3 -> ff (GEGLU)
  proj_out

q/k/v are bias-free, to_out carries a bias (diffusers
attention_bias=False). The sinusoidal positional encoding is applied to
the POST-norm activations before each attention (diffusers
BasicTransformerBlock pos_embed), not once after proj_in; its buffer
(`pos_embed.pe` in checkpoints) is recomputed, never stored.

Layout: tokens are ordered (F, N, C) inside the module (a cheap
leading-dim shuffle from the spatial (B*F, H, W, C) batch). Temporal
attention then runs in the pixel-lanes orientation: the q/k/v
projections emit per-frame (P, N) arrays directly — a plain A@B^T dot
per frame, no transposes — and ops/temporal_attention.py contracts the
frame axis per pixel on the VPU (as batched F x D matmuls the MXU pads
every tiny contraction to its 128-wide tiles; profiled at ~600 ms of
the 3.2 s full-scale denoise step, ~5x slower than the kernel).

Under a mesh the frame axis is all-gathered per pixel block, which at
F<=32 is a tiny ICI transfer (SURVEY.md §5 long-context row).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from video_style_transfer_tpu.models import layers
from video_style_transfer_tpu.models.attention import (
    feed_forward, init_attention, init_feed_forward)
from video_style_transfer_tpu.models.embeddings import temporal_positional_encoding
from video_style_transfer_tpu.ops.temporal_attention import (
    temporal_attention_frames)


def init_motion_block(key, dim: int, *, heads: int, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "norm1": layers.init_layer_norm(dim, dtype),
        "attn1": init_attention(k1, dim, heads=heads, dtype=dtype),
        "norm2": layers.init_layer_norm(dim, dtype),
        "attn2": init_attention(k2, dim, heads=heads, dtype=dtype),
        "norm3": layers.init_layer_norm(dim, dtype),
        "ff": init_feed_forward(k3, dim, dtype=dtype),
    }


def _proj_pixel_lanes(p, xf):
    """xf: (N, C) one frame of hidden states -> (P, N) pixel-lanes
    projection q_f = W^T x^T, optionally + the temporal-LoRA delta."""
    w = p["kernel"].astype(xf.dtype)
    y = jnp.einsum("cp,nc->pn", w, xf)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)[:, None]
    if "tlora" in p:
        t = p["tlora"]
        # fp32 rank-space path, matching lora/temporal.apply_temporal_lora
        l = jnp.einsum("nc,cr->nr", xf.astype(jnp.float32),
                       t["a"].astype(jnp.float32))
        d = jnp.einsum("nr,rp->pn", l, t["b"].astype(jnp.float32))
        y = y + (d * t["scale"]).astype(y.dtype)
    return y


def _out_proj(p, of):
    """of: (P, N) attention output -> (N, C) tokens."""
    w = p["kernel"].astype(of.dtype)
    y = jnp.einsum("pq,pn->nq", w, of)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    if "tlora" in p:
        t = p["tlora"]
        l = jnp.einsum("pn,pr->nr", of.astype(jnp.float32),
                       t["a"].astype(jnp.float32))
        d = jnp.einsum("nr,rq->nq", l, t["b"].astype(jnp.float32))
        y = y + (d * t["scale"]).astype(y.dtype)
    return y


def _temporal_attention(p, x, *, heads: int, impl: str = "auto"):
    """x: (F, N, C) -> (F, N, C); frame-axis self-attention per pixel."""
    f_ = x.shape[0]
    fusable = all("tlora" not in p[n] and "bias" not in p[n]
                  for n in ("to_q", "to_k", "to_v"))
    if fusable:
        # serving path (temporal LoRA folded/absent): one (C, 3P)
        # matmul per frame instead of three — output rows slice into
        # bitwise-identical q/k/v pixel-lanes blocks
        w = jnp.concatenate([p[n]["kernel"] for n in
                             ("to_q", "to_k", "to_v")], axis=1)
        pdim = p["to_q"]["kernel"].shape[1]
        qkv = [jnp.einsum("cp,nc->pn", w.astype(x.dtype), x[f])
               for f in range(f_)]
        qs = [y[:pdim] for y in qkv]
        ks = [y[pdim:2 * pdim] for y in qkv]
        vs = [y[2 * pdim:] for y in qkv]
    else:
        qs = [_proj_pixel_lanes(p["to_q"], x[f]) for f in range(f_)]
        ks = [_proj_pixel_lanes(p["to_k"], x[f]) for f in range(f_)]
        vs = [_proj_pixel_lanes(p["to_v"], x[f]) for f in range(f_)]
    impl_ta = "xla" if impl == "xla" else "auto"
    os_ = temporal_attention_frames(qs, ks, vs, num_heads=heads,
                                    impl=impl_ta)
    return jnp.stack([_out_proj(p["to_out"], o) for o in os_], axis=0)


def motion_block(p, x, pe, *, heads: int, impl: str = "auto"):
    """x: (F, N, C), pe: (F, 1, C) — double temporal self-attention with
    the positional encoding added to the post-norm activations before
    each attention (diffusers BasicTransformerBlock with
    positional_embeddings='sinusoidal', double_self_attention=True)."""
    h = layers.layer_norm(p["norm1"], x) + pe
    x = x + _temporal_attention(p["attn1"], h, heads=heads, impl=impl)
    h = layers.layer_norm(p["norm2"], x) + pe
    x = x + _temporal_attention(p["attn2"], h, heads=heads, impl=impl)
    h = layers.layer_norm(p["norm3"], x)
    x = x + feed_forward(p["ff"], h)
    return x


def init_motion_module(key, in_channels: int, *, num_layers: int = 1,
                       heads: int = 8, norm_num_groups: int = 32,
                       dtype=jnp.float32):
    """'transformer_blocks' is a stacked pytree (leading num_layers axis),
    scanned at apply time — same layout as the spatial transformer.
    Diffusers' AnimateDiffTransformer3D has num_layers = 1 for every
    published AnimateDiff adapter (SD15 and SDXL-beta)."""
    k_in, k_blocks, k_out = jax.random.split(key, 3)
    block_keys = jax.random.split(k_blocks, num_layers)
    blocks = jax.vmap(
        lambda k: init_motion_block(k, in_channels, heads=heads,
                                    dtype=dtype))(block_keys)
    return {
        "norm": layers.init_group_norm(in_channels, dtype),
        "proj_in": layers.init_linear(k_in, in_channels, in_channels,
                                      dtype=dtype),
        "transformer_blocks": blocks,
        "proj_out": layers.init_linear(k_out, in_channels, in_channels,
                                       dtype=dtype),
    }


def _sharded_mesh_info(b: int, num_frames: int, hw: int):
    """(exchange_mesh, devices_per_batch) when an enclosing `with mesh:`
    context makes the explicit shard_map motion path applicable, else
    None.

    The caller shards the flattened (B*F) row axis contiguously over
    the mesh's ('data', 'frame') axes with rows b-major / f-minor, so
    block k of the row split holds frames of batch element
    k // (D / B) — e.g. the serving layout (data=1, frame=8) with the
    CFG pair B=2 puts batch 0 on devices 0-3 and batch 1 on devices
    4-7, CROSSING the batch boundary mid-axis. The frame exchange must
    therefore run within per-batch device GROUPS, not over the raw
    'frame' axis: the same devices (same flat order = same physical row
    layout) are regrouped into a (B, D/B) mesh whose second axis is the
    exchange group.

    Applicability: a 'frame' axis > 1, no active 'model' axis (the TP
    layout is image-only), and static shard-local shapes: D % B == 0,
    F % (D/B) == 0, HW % (D/B) == 0. Anything else (e.g. F=12 on 8
    devices) falls back to the GSPMD path, which pads."""
    import numpy as _np
    from jax.sharding import Mesh

    from video_style_transfer_tpu.parallel.mesh import context_mesh
    mesh = context_mesh()
    if mesh is None or "frame" not in mesh.shape:
        return None
    if mesh.shape["frame"] <= 1:
        return None
    if mesh.shape.get("model", 1) != 1:
        return None
    d = mesh.shape.get("data", 1) * mesh.shape["frame"]
    if d <= 1 or d % b:
        return None
    g = d // b  # devices per batch element = exchange-group size
    if g <= 1 or num_frames % g or hw % g:
        return None
    flat = _np.asarray(mesh.devices).reshape(-1)  # data-major == row order
    return Mesh(flat.reshape(b, g), ("mb", "mf")), g


def _group_norm_psum(p, x, *, num_groups: int, eps: float, axis_name: str):
    """GroupNorm on a shard-local (B_loc, S_loc, C) view whose spatial
    axis is SPLIT over `axis_name`: exact two-pass statistics — local
    per-channel sums psum'd to the global mean, then centered second
    moments psum'd to the global variance. The tiny (B_loc, C) stat
    tensors are all that crosses the wire. Matches layers.group_norm
    (same per-channel-sums-then-group layout; the two-pass form replaces
    its shifted single-pass trick, whose per-device reference row would
    differ across shards)."""
    orig_dtype = x.dtype
    c = x.shape[-1]
    g = num_groups
    lead = x.shape[0]
    x2 = x.reshape(lead, -1, c)
    n_local = x2.shape[1]
    n_dev = jax.lax.psum(1, axis_name)
    cnt = n_local * (c // g) * n_dev
    s1 = jax.lax.psum(jnp.sum(x2.astype(jnp.float32), axis=1), axis_name)
    gmean = s1.reshape(lead, g, c // g).sum(-1) / cnt          # (B, g)
    mean_c = jnp.repeat(gmean, c // g, axis=-1)                # (B, C)
    xs = x2.astype(jnp.float32) - mean_c[:, None, :]
    s2 = jax.lax.psum(jnp.sum(xs * xs, axis=1), axis_name)
    var = s2.reshape(lead, g, c // g).sum(-1) / cnt
    inv = jax.lax.rsqrt(var + eps)
    inv_c = jnp.repeat(inv, c // g, axis=-1)
    scale = inv_c * p["scale"].astype(jnp.float32)
    bias = p["bias"].astype(jnp.float32) - mean_c * scale
    bshape = (lead,) + (1,) * (x.ndim - 2) + (c,)
    y = x.astype(jnp.float32) * scale.reshape(bshape) + bias.reshape(bshape)
    return y.astype(orig_dtype)


def _motion_module_sharded(p, x, ex_mesh, g: int, *, num_frames: int,
                           heads: int, norm_num_groups: int,
                           max_seq_length: int, impl: str, remat: bool):
    """Explicit frame-parallel motion module (see motion_module's
    dispatch comment). The (B, D/B) exchange mesh puts exactly one
    batch element's frame range on each 'mf' group, so the shard-local
    view is (f_loc, h, w, c) of ONE batch element — the local path's
    (B,F,HW)<->(F,B·HW) chunk shuffles disappear entirely. Numerically
    the same computation as the local path up to GN-statistic summation
    order (exact two-pass psum vs shifted single-pass) and collective
    reduction order; parity asserted in tests/test_motion_sharded.py."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    bf, h, w, c = x.shape
    f_loc = num_frames // g
    x_spec = P(("mb", "mf"), None, None, None)

    def local(p_, x_loc):
        # x_loc: (f_loc, h, w, c) — frames f_loc*j .. of batch element i
        # on exchange-mesh position (i, j)
        from video_style_transfer_tpu.parallel.mesh import manual_region
        with manual_region():
            return _local_body(p_, x_loc)

    def _local_body(p_, x_loc):
        residual = x_loc
        y = x_loc.reshape(1, f_loc * h, w, c)
        y = _group_norm_psum(p_["norm"], y, num_groups=norm_num_groups,
                             eps=1e-6, axis_name="mf")
        y = y.reshape(f_loc, h * w, c)
        # frame-shard -> pixel-shard within the batch element's group:
        # concat the frame axis ('mf' position order == frame-block
        # order), split pixels
        y = jax.lax.all_to_all(y, "mf", split_axis=1, concat_axis=0,
                               tiled=True)          # (F, HW/g, c)
        y = layers.linear(p_["proj_in"], y)

        pe = temporal_positional_encoding(num_frames, c,
                                          max_len=max_seq_length)
        pe = pe[:, None, :].astype(y.dtype)

        def body(y_, bp):
            return motion_block(bp, y_, pe, heads=heads, impl=impl), None

        if remat:
            body = jax.checkpoint(body)
        n_layers = jax.tree.leaves(p_["transformer_blocks"])[0].shape[0]
        if n_layers == 1:
            y, _ = body(y, jax.tree.map(lambda a: a[0],
                                        p_["transformer_blocks"]))
        else:
            y, _ = jax.lax.scan(body, y, p_["transformer_blocks"])

        y = layers.linear(p_["proj_out"], y)
        # pixel-shard -> frame-shard (inverse exchange)
        y = jax.lax.all_to_all(y, "mf", split_axis=0, concat_axis=1,
                               tiled=True)          # (f_loc, HW, c)
        y = y.reshape(f_loc, h, w, c)
        return residual + y

    # check_vma=False: the pixel-lanes Pallas kernel's out_shape carries
    # no varying-mesh-axes annotation, which the static replication
    # checker (jax >= 0.8) rejects; the kernel is pixel-local so the
    # check has nothing to catch here
    return shard_map(local, mesh=ex_mesh, in_specs=(P(), x_spec),
                     out_specs=x_spec, check_vma=False)(p, x)


def motion_module(p, x, *, num_frames: int, heads: int, norm_num_groups: int,
                  max_seq_length: int = 32, impl: str = "auto",
                  remat: bool = False):
    """x: (B*F, H, W, C) (spatial batch layout). Returns same shape.

    Internally: GroupNorm with statistics pooled over (F, H, W) per
    group (diffusers normalizes the (B, C, F, H, W) layout before
    flattening to per-pixel frame sequences), then
    (B, F, H*W, C) -> (F, B*H*W, C) (leading-dim shuffle), proj_in,
    temporal blocks (PE applied inside each block), proj_out,
    residual-add.
    """
    bf, h, w, c = x.shape
    b = bf // num_frames

    # Frame-sharded meshes take the hand-written shard_map path: the
    # temporal attention needs every frame of each pixel, and GSPMD
    # cannot partition the (B,F,HW,C)->(F,B,HW,C) chunk shuffle — its
    # spmd_partitioner logs "involuntary full rematerialization" and
    # ALL-GATHERS the full activation at every module (audited at
    # 109 GB of collectives per 16-frame UNet call, ~2.1 s of modeled
    # v5e-8 ICI per denoise step — benchmarks/collective_volume.py —
    # which would erase the frame-parallel speedup). The explicit path
    # exchanges frame-shard <-> pixel-shard with one all-to-all pair
    # per module (~1/n of the activation per device on the wire) and
    # pools the GroupNorm statistics with a tiny psum.
    sharded = _sharded_mesh_info(b, num_frames, h * w)
    if sharded is not None:
        return _motion_module_sharded(
            p, x, *sharded, num_frames=num_frames, heads=heads,
            norm_num_groups=norm_num_groups,
            max_seq_length=max_seq_length, impl=impl, remat=remat)

    residual = x
    # Fold the frame axis into the spatial dims so group statistics pool
    # over frames as well — equivalent to GroupNorm on (B, C, F, H, W).
    y = x.reshape(b, num_frames * h, w, c)
    y = layers.group_norm(p["norm"], y, num_groups=norm_num_groups,
                          eps=1e-6)
    y = y.reshape(b, num_frames, h * w, c)
    # (B, F, HW, C) -> (F, B, HW, C): chunk shuffle of the two leading
    # dims only — C stays minor, HW*C spans move whole
    y = jnp.transpose(y, (1, 0, 2, 3)).reshape(num_frames, b * h * w, c)
    # fallback under a mesh the shard_map path can't take (uneven F,
    # ragged pixel counts): pin the interior to pixel sharding so GSPMD
    # at least reshards once instead of gathering per layer
    from video_style_transfer_tpu.parallel.mesh import context_constraint
    y = context_constraint(y, None, ("data", "frame"))
    y = layers.linear(p["proj_in"], y)

    pe = temporal_positional_encoding(num_frames, c, max_len=max_seq_length)
    pe = pe[:, None, :].astype(y.dtype)

    def body(y_, bp):
        return motion_block(bp, y_, pe, heads=heads, impl=impl), None

    if remat:
        body = jax.checkpoint(body)
    n_layers = jax.tree.leaves(p["transformer_blocks"])[0].shape[0]
    if n_layers == 1:
        # avoid scan overhead for the single-layer stacks every
        # published AnimateDiff adapter uses
        y, _ = body(y, jax.tree.map(lambda a: a[0],
                                    p["transformer_blocks"]))
    else:
        y, _ = jax.lax.scan(body, y, p["transformer_blocks"])

    y = layers.linear(p["proj_out"], y)
    y = y.reshape(num_frames, b, h, w, c)
    y = jnp.transpose(y, (1, 0, 2, 3, 4)).reshape(bf, h, w, c)
    # return to the spatial layers' row (frame) sharding before the
    # residual add — the inverse all-to-all
    y = context_constraint(y, ("data", "frame"))
    return y + residual
