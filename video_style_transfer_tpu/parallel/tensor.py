"""Optional tensor parallelism (Megatron-style) over a 'model' mesh axis.

The reference has no TP (SURVEY.md §2.3: LoRA params are tiny and SDXL
fits one chip in bf16), so this is capability beyond parity: shard the
spatial transformers' attention and feed-forward weights over a 'model'
axis and let GSPMD insert the collectives — useful when a future model
variant outgrows one chip's HBM, or to cut per-chip latency at batch 1.

Pattern (per transformer sub-layer, the Megatron split):
  - q/k/v projection kernels column-parallel (shard the H*D output axis):
    each shard computes its own heads' attention locally when the model
    axis divides the head count;
  - out projection row-parallel (shard the H*D input axis): the partial
    products psum back to replicated activations — one collective per
    attention;
  - feed-forward: proj column-parallel / out row-parallel. NOTE the GEGLU
    kernel packs W as [W_h | W_g] halves (ops/geglu.py), so a contiguous
    shard of the 2*inner axis does not hold matched (h, g) column pairs —
    GSPMD keeps it correct by resharding around the gate; communication-
    optimal GEGLU TP would need an interleaved checkpoint layout and is
    deliberately not done (SDXL serving is frame/sample-parallel; TP is
    the escape hatch, not the hot path).

Everything else (convs, norms, time embeddings, motion modules, LoRA
branches) stays replicated: motion modules run the pixel-lanes Pallas
kernel (an opaque custom call GSPMD cannot split), and LoRA deltas are
rank-64 — sharding them saves nothing.

All leaves keep their stacked (num_layers, ...) leading axis; the specs
below index axes from the right so they apply to stacked and unstacked
leaves alike.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"

_QKV = ("to_q", "to_k", "to_v")


def _path_keys(path) -> list:
    keys = []
    for p in path:
        if hasattr(p, "key"):
            keys.append(p.key)
        elif hasattr(p, "idx"):
            keys.append(p.idx)
        elif hasattr(p, "name"):
            keys.append(p.name)
    return keys


def _axis_spec(ndim: int, axis: int) -> P:
    """PartitionSpec with MODEL_AXIS on `axis` (negative = from the
    right), None elsewhere."""
    axis = axis % ndim
    return P(*(MODEL_AXIS if i == axis else None for i in range(ndim)))


def tp_spec(path, leaf) -> P:
    """PartitionSpec for one UNet param leaf under tensor parallelism."""
    keys = _path_keys(path)
    if "motion_modules" in keys or "attentions" not in keys:
        return P()
    if "lora" in keys or "tlora" in keys:
        return P()  # rank-64 branches: nothing to gain from sharding
    if len(keys) < 2:
        return P()
    parent, name = keys[-2], keys[-1]
    nd = leaf.ndim
    if parent in _QKV:
        # column-parallel: shard the H*D output axis (kernel (.., C, HD)
        # and bias (.., HD))
        return _axis_spec(nd, -1)
    if parent == "to_out":
        # row-parallel kernel (.., HD, C); bias replicated (added once
        # after the psum)
        return _axis_spec(nd, -2) if name == "kernel" else P()
    if parent == "proj":  # GEGLU projection (.., C, 2*inner)
        return _axis_spec(nd, -1)
    if parent == "out" and keys[-3:-2] == ["ff"]:
        return _axis_spec(nd, -2) if name == "kernel" else P()
    return P()


def tp_spec_tree(params) -> Any:
    """PartitionSpec pytree matching a UNet params tree."""
    return jax.tree_util.tree_map_with_path(tp_spec, params)


def shard_params_tp(params, mesh: Mesh):
    """device_put the UNet params with the TP layout on `mesh` (which
    must carry a MODEL_AXIS; see parallel.mesh.create_mesh(model=...))."""
    assert MODEL_AXIS in mesh.axis_names, mesh.axis_names
    specs = tp_spec_tree(params)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params, specs)
