"""Model surgery: LoRA insertion, block-separation DSL, param labeling.

Functional counterpart of the reference's in-place module walks
(insert_unziplora_to_unet unziplora_unet/utils.py:388-484, insert_mask
:229-268, generate_mask_in_unet :177-227, inject_temporal_lora
animatediff/temporal_lora.py:44-69, build_spatial_lora_index :72-123):
here "surgery" is building new pytrees — params gain 'lora'/'tlora'
sub-dicts at attention projections, and a mirrored state tree carries the
masks/gates.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from video_style_transfer_tpu.lora.temporal import init_temporal_lora
from video_style_transfer_tpu.lora.unzip import (
    init_unzip_lora_params, init_unzip_lora_state)

PROJS = ("to_q", "to_k", "to_v", "to_out")
Path = Tuple


# ---------------------------------------------------------------------------
# Tree walking
# ---------------------------------------------------------------------------

def _get(tree, path: Path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path: Path, value):
    """Immutable path update (shallow-copies along the spine); creates
    missing trailing dict keys."""
    if not path:
        return value
    k = path[0]
    if isinstance(tree, dict):
        new = dict(tree)
        child = tree.get(k, {})
    else:
        new = list(tree)
        child = tree[k]
    new[k] = _set(child, path[1:], value)
    return new


def iter_spatial_attention_paths(unet_params) -> Iterator[Path]:
    """Paths of every spatial attention STACK (attn1 + attn2) in down/mid/
    up cross-attention blocks — motion modules excluded, matching the
    reference's skip (unziplora_unet/utils.py:407-409).

    Transformer blocks are stacked pytrees (leaves carry a leading
    num_layers axis), so one path covers all layers of a stack; per-layer
    math vmaps over that axis."""
    def blocks(kind):
        if kind == "mid_block":
            yield ("mid_block",), unet_params["mid_block"]
        else:
            for i, b in enumerate(unet_params.get(kind, [])):
                yield (kind, i), b

    for kind in ("down_blocks", "mid_block", "up_blocks"):
        for prefix, block in blocks(kind):
            for j, attn in enumerate(block.get("attentions", [])):
                for name in ("attn1", "attn2"):
                    yield prefix + ("attentions", j,
                                    "transformer_blocks", name)


def iter_motion_attention_paths(unet_params) -> Iterator[Path]:
    """Paths of every (stacked) temporal attention inside motion
    modules — both attn1 and attn2 (diffusers motion blocks run double
    self-attention; the reference's inject_temporal_lora wraps every
    motion q/k/v/out, animatediff/temporal_lora.py:44-69)."""
    def blocks(kind):
        if kind == "mid_block":
            yield ("mid_block",), unet_params["mid_block"]
        else:
            for i, b in enumerate(unet_params.get(kind, [])):
                yield (kind, i), b

    for kind in ("down_blocks", "mid_block", "up_blocks"):
        for prefix, block in blocks(kind):
            for j, mm in enumerate(block.get("motion_modules", [])):
                for name in ("attn1", "attn2"):
                    yield prefix + ("motion_modules", j,
                                    "transformer_blocks", name)


def path_str(path: Path) -> str:
    return ".".join(str(k) for k in path)


# ---------------------------------------------------------------------------
# UnZipLoRA insertion
# ---------------------------------------------------------------------------

def insert_unziplora(unet_params, key, *, rank: int = 64,
                     dtype=jnp.float32):
    """Returns (new_params, lora_state). Every q/k/v/out projection of
    every spatial attention stack gains a 'lora' sub-dict (leaves carry
    the stack's leading num_layers axis via vmapped init); the state tree
    mirrors the params structure with stacked mask/score entries."""
    params = unet_params
    state: Dict = {}
    paths = list(iter_spatial_attention_paths(unet_params))
    keys = jax.random.split(key, len(paths) * len(PROJS))
    ki = 0
    for path in paths:
        attn = _get(params, path)
        for proj in PROJS:
            p = attn[proj]
            n_layers, in_f, out_f = p["kernel"].shape
            layer_keys = jax.random.split(keys[ki], n_layers)
            ki += 1
            lora = jax.vmap(
                lambda k: init_unzip_lora_params(k, in_f, out_f, rank=rank,
                                                 dtype=dtype))(layer_keys)
            params = _set(params, path + (proj, "lora"), lora)
            st = stacked_unzip_state(n_layers, out_f)
            state = _set_nested(state, path + (proj,), st)
    return params, state


def stacked_unzip_state(n_layers: int, out_features: int):
    """init_unzip_lora_state with a leading (n_layers,) axis on every
    leaf."""
    base = init_unzip_lora_state(out_features)
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a, (n_layers,) + a.shape).copy(), base)


def _set_nested(tree: Dict, path: Path, value):
    """Build-as-you-go nested set for the (dict/list-mirroring) state
    tree. Integer path components become dict keys in the state tree to
    avoid list-padding; model code indexes via _sub which handles both."""
    if not path:
        return value
    k = path[0]
    new = dict(tree) if isinstance(tree, dict) else {}
    new[k] = _set_nested(new.get(k, {}), path[1:], value)
    return new


def insert_temporal_lora(unet_params, key, *, rank: int = 32,
                         alpha: float = 1.0, dtype=jnp.float32):
    """Adds 'tlora' to every motion-module attention projection stack
    (reference inject_temporal_lora, animatediff/temporal_lora.py:44-69)."""
    params = unet_params
    paths = list(iter_motion_attention_paths(unet_params))
    keys = jax.random.split(key, max(len(paths) * len(PROJS), 1))
    ki = 0
    for path in paths:
        attn = _get(params, path)
        for proj in PROJS:
            p = attn[proj]
            n_layers, in_f, out_f = p["kernel"].shape
            layer_keys = jax.random.split(keys[ki], n_layers)
            ki += 1
            tl = jax.vmap(
                lambda k: init_temporal_lora(k, in_f, out_f, rank=rank,
                                             alpha=alpha, dtype=dtype)
            )(layer_keys)
            params = _set(params, path + (proj, "tlora"), tl)
    return params


def spatial_pairs(unet_params) -> List[Tuple[Path, Path, int]]:
    """Pair each temporal-LoRA projection stack with its same-block
    spatial UnZipLoRA projection stack (reference build_spatial_lora_index,
    temporal_lora.py:72-123: motion module index j pairs with attention
    group j of the same block; layer k with layer k; shapes must agree).

    Returns (tlora_path, spatial_lora_path, n_paired_layers) triples —
    n_paired_layers = min(motion stack depth, spatial stack depth);
    consumers vmap over that leading prefix.
    """
    pairs = []
    for mpath in iter_motion_attention_paths(unet_params):
        # (... 'motion_modules', j, 'transformer_blocks', attn_name);
        # the reference strips 'motion_modules' and pairs by the SAME
        # attn name (temporal_lora.py:100-111) — attn2's cross-dim k/v
        # then drop out via the shape check below, exactly as there
        prefix = mpath[:-4]
        j = mpath[-3]
        spath = prefix + ("attentions", j, "transformer_blocks", mpath[-1])
        try:
            sp = _get(unet_params, spath)
        except (KeyError, IndexError, TypeError):
            continue
        mp = _get(unet_params, mpath)
        for proj in PROJS:
            if proj not in sp or "lora" not in sp[proj]:
                continue
            if "tlora" not in mp[proj]:
                continue
            if sp[proj]["kernel"].shape[1:] == mp[proj]["kernel"].shape[1:]:
                n = min(sp[proj]["kernel"].shape[0],
                        mp[proj]["kernel"].shape[0])
                pairs.append((mpath + (proj, "tlora"),
                              spath + (proj, "lora"), n))
    return pairs


# ---------------------------------------------------------------------------
# Block-separation DSL
# ---------------------------------------------------------------------------

def expand_block_patterns(mask_dictionary: Dict[str, Sequence[str]],
                          *, num_down_blocks: int = 3,
                          num_up_blocks: int = 3,
                          layers_per_block: int = 2) -> set:
    """Expand the reference's "{blocks}_{groups}_{attns}_{projs}" grammar
    (generate_mask_in_unet, unziplora_unet/utils.py:177-227) into a set of
    (block_kind, block_idx, group_idx, attn_name, proj_name) tuples.

    Grammar per pattern element:
      blocks: 'N' (mid: no index) | 'A' (all attn-bearing blocks) | '0,1'
      groups: 'A' (all attention groups) | '0,2'
      attns:  'A' (attn1+attn2) | '1' | '2'
      projs:  'A' (q,k,v,out)   | 'q,k' ...
    """
    out = set()
    for key, patterns in mask_dictionary.items():
        kind = key.rstrip(".")
        for pattern in patterns:
            nums, groups, attns, projs = pattern.split("_")
            if nums == "N":
                block_ids = [None]
            elif nums == "A":
                # attn-bearing blocks in SDXL: up 0,1 / down 1,2
                block_ids = ([0, 1] if kind == "up_blocks" else [1, 2])
            else:
                block_ids = [int(x) for x in nums.split(",")]
            if groups == "A":
                group_ids = (list(range(layers_per_block + 1))
                             if kind == "up_blocks"
                             else list(range(layers_per_block)))
            else:
                group_ids = [int(x) for x in groups.split(",")]
            attn_names = (["attn1", "attn2"] if attns == "A"
                          else [f"attn{x}" for x in attns.split(",")])
            if projs == "A":
                proj_names = list(PROJS)
            else:
                proj_names = [f"to_{x}" if x != "out" else "to_out"
                              for x in projs.split(",")]
            for bi in block_ids:
                for gi in group_ids:
                    for an in attn_names:
                        for pn in proj_names:
                            out.add((kind, bi, gi, an, pn))
    return out


def selection_matches(path: Path, proj: str, selections: set) -> bool:
    """Does (attention path, projection) fall in an expanded selection?"""
    if path[0] == "mid_block":
        kind, bi = "mid_block", None
        gi = path[2]
        attn_name = path[-1]
    else:
        kind, bi = path[0], path[1]
        gi = path[3]
        attn_name = path[-1]
    return (kind, bi, gi, attn_name, proj) in selections


def layer_assignments(unet_params, mask_dictionary_content: Dict,
                      mask_dictionary_style: Dict,
                      **expand_kw) -> Dict[Path, Optional[str]]:
    """Column-separation assignment per (attention_path, proj):

      'both'    — in both dicts (or neither): both branches get sparse
                  column masks
      'style'   — style-only selection: style sparse, content all-on
      'content' — content-only: content sparse, style all-on

    Mirrors lora_merge_cone_select's masked_key routing
    (unziplora_unet/utils.py:648-700).
    """
    sel_c = expand_block_patterns(mask_dictionary_content, **expand_kw)
    sel_s = expand_block_patterns(mask_dictionary_style, **expand_kw)
    out: Dict[Path, Optional[str]] = {}
    for path in iter_spatial_attention_paths(unet_params):
        for proj in PROJS:
            in_c = selection_matches(path, proj, sel_c)
            in_s = selection_matches(path, proj, sel_s)
            if in_c and in_s:
                label = "both"
            elif in_s:
                label = "style"
            elif in_c:
                label = "content"
            else:
                label = "both"
            out[path + (proj,)] = label
    return out


# ---------------------------------------------------------------------------
# State-tree utilities
# ---------------------------------------------------------------------------

def iter_lora_state_paths(state) -> Iterator[Path]:
    """All projection-level entries in a lora state tree."""
    def walk(node, path):
        if isinstance(node, dict):
            if "mask_content" in node:
                yield path
            else:
                for k, v in node.items():
                    yield from walk(v, path + (k,))
    yield from walk(state, ())


def map_lora_state(state, fn: Callable):
    """fn(path, entry) -> new entry, applied to every projection entry
    (immutable spine copies only — leaves are shared, not copied)."""
    new = state
    for path in iter_lora_state_paths(state):
        entry = _get(state, path)
        updated = fn(path, entry)
        if updated is not entry:
            new = _set(new, path, updated)
    return new


def fold_unziplora(unet_params, lora_state, *, mode: str = "both",
                   fold_cross_kv: bool = False):
    """Serving-time LoRA folding: wherever the content/style input
    streams are guaranteed identical (self-attention entirely; cross-attn
    q/out always — they take hidden states; cross-attn k/v ONLY when the
    pipeline feeds one shared prompt, e.g. the reference's video
    inference), fold the fully-gated delta into the base kernel and drop
    the 'lora' entry. Remaining projections keep their dynamic LoRA.

    Returns (params, n_folded). At rank 64 the dual fp32 LoRA branches
    cost ~40-100% of the base projection matmul; folding removes that for
    10 of 12 projections per block pair (12/12 with fold_cross_kv).
    """
    from video_style_transfer_tpu.lora.unzip import folded_delta

    params = unet_params
    n = 0
    for path in iter_spatial_attention_paths(unet_params):
        is_cross = path[-1] == "attn2"
        attn = _get(params, path)
        for proj in PROJS:
            p = attn[proj]
            if "lora" not in p:
                continue
            if is_cross and proj in ("to_k", "to_v") and not fold_cross_kv:
                continue
            st = _get(lora_state, path + (proj,)) if lora_state else None
            delta = jax.vmap(
                lambda lp, s: folded_delta(lp, s, mode=mode)
            )(p["lora"], st)
            new_p = {k: v for k, v in p.items() if k != "lora"}
            new_p["kernel"] = (p["kernel"].astype(jnp.float32)
                               + delta).astype(p["kernel"].dtype)
            params = _set(params, path + (proj,), new_p)
            n += 1
    return params, n


def set_branch_gates(state, off_paths: set, branch: str):
    """Inference block separation: zero entire branches at the given
    projection paths (reference UnZipLoRALinearLayerInfer masked_matrix
    semantics, unziplora_linear_layer.py:308-317)."""
    def fn(path, entry):
        if path in off_paths:
            e = dict(entry)
            # preserve the stacked (n_layers,) leaf shape — a 0-d write
            # breaks the lax.scan over layer-stacked state trees
            e[f"on_{branch}"] = jnp.zeros_like(entry[f"on_{branch}"])
            return e
        return entry
    return map_lora_state(state, fn)


tree_get = _get
tree_set = _set
