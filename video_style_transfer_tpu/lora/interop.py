"""Reference-format LoRA artifact interop.

The reference's save format (unet_inverse_ziplora_state_dict,
unziplora_unet/utils.py:289-312; final save train_unziplora.py:2384-2417):

  <name>_content/  safetensors: unet.{module_path}.lora.up.weight (out, r)
                                unet.{module_path}.lora.down.weight (r, in)
  <name>_style/    same keys for the style branch
  <name>_merger_content.pth / _merger_style.pth:
                   unet.{module_path}.lora.merge_{branch} -> (out,)

with the column gate folded into `up`: the hard mask when the column
filter is active, else the merger (get_unziplora_weight,
unziplora_linear_layer.py:104-115). Per-branch safetensors are
diffusers-`load_lora_weights` compatible, which is how the reference does
content-only / style-only generation (infer.py:173-199).

This module converts both directions between that format and the stacked
params/state pytrees (module paths are per transformer layer; stacked
leaves unstack along axis 0).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from video_style_transfer_tpu.lora import surgery
from video_style_transfer_tpu.lora.surgery import (
    PROJS, iter_spatial_attention_paths, tree_get, tree_set)


def _module_name(path, proj: str, layer: int) -> str:
    """('down_blocks', 1, 'attentions', 0, 'transformer_blocks', 'attn1')
    + to_q + layer 2 -> 'down_blocks.1.attentions.0.transformer_blocks.2.
    attn1.to_q' ('to_out' maps to diffusers' 'to_out.0')."""
    parts = []
    for k in path[:-1]:
        parts.append(str(k))
        if k == "transformer_blocks":
            parts.append(str(layer))
    parts.append(path[-1])  # attn1 / attn2
    parts.append(proj if proj != "to_out" else "to_out.0")
    return ".".join(parts)


def iter_layer_modules(params):
    """Yields (path, proj, layer_idx, module_name) for every per-layer
    projection of every spatial attention stack."""
    for path in iter_spatial_attention_paths(params):
        attn = tree_get(params, path)
        n_layers = attn["to_q"]["kernel"].shape[0]
        for proj in PROJS:
            for k in range(n_layers):
                yield path, proj, k, _module_name(path, proj, k)


def export_state_dicts(params, state, branch: str):
    """-> (lora_dict, merger_dict) of numpy arrays in reference key
    format and torch orientation (up (out, r), down (r, in))."""
    lora_sd: Dict[str, np.ndarray] = {}
    merger_sd: Dict[str, np.ndarray] = {}
    for path, proj, k, name in iter_layer_modules(params):
        p = tree_get(params, path)[proj]
        if "lora" not in p:
            continue
        lp = p["lora"]
        st = tree_get(state, path + (proj,)) if state is not None else None
        down = np.asarray(lp[branch]["down"][k], np.float32).T   # (r, in)
        up = np.asarray(lp[branch]["up"][k], np.float32).T       # (out, r)
        merge = np.asarray(lp[f"merge_{branch}"][k], np.float32)
        if st is not None and bool(st[f"use_mask_{branch}"][k]):
            gate = np.asarray(st[f"mask_{branch}"][k], np.float32)
        else:
            gate = merge
        lora_sd[f"unet.{name}.lora.up.weight"] = up * gate[:, None]
        lora_sd[f"unet.{name}.lora.down.weight"] = down
        merger_sd[f"unet.{name}.lora.merge_{branch}"] = merge
    return lora_sd, merger_sd


def import_state_dicts(params, content_sd: Dict, style_sd: Dict,
                       merger_content: Optional[Dict] = None,
                       merger_style: Optional[Dict] = None,
                       dtype=jnp.float32):
    """Install reference-format LoRA dicts into a params tree (the
    inference path — reference insert_unziplora_to_unet,
    unziplora_unet/utils.py:388-484). Returns (params, lora_state).

    Note the reference quirk preserved here: exported `up` weights
    already carry the fold-in of mask-or-merger; loading them and
    multiplying by the loaded merger again at 'both'-mode inference
    reproduces the reference inference math exactly.
    """
    # group per stack: path+proj -> arrays per layer
    staged: Dict[Tuple, Dict] = {}
    for path, proj, k, name in iter_layer_modules(params):
        cu = content_sd.get(f"unet.{name}.lora.up.weight")
        cd = content_sd.get(f"unet.{name}.lora.down.weight")
        su = style_sd.get(f"unet.{name}.lora.up.weight")
        sd_ = style_sd.get(f"unet.{name}.lora.down.weight")
        present = [x is not None for x in (cu, cd, su, sd_)]
        if not any(present):
            continue
        if not all(present):
            # a partial artifact (up without down, or one branch only)
            # would otherwise either crash on asarray(None) or silently
            # shift later layers down the stack
            raise ValueError(
                f"incomplete LoRA artifact for {name}: up/down must be "
                f"present in BOTH branch dicts (got content up/down="
                f"{present[0]}/{present[1]}, style={present[2]}/"
                f"{present[3]})")
        mc = (merger_content or {}).get(f"unet.{name}.lora.merge_content")
        ms = (merger_style or {}).get(f"unet.{name}.lora.merge_style")
        ent = staged.setdefault(path + (proj,), {
            "cu": [], "cd": [], "su": [], "sd": [], "mc": [], "ms": []})
        out_f = np.asarray(cu).shape[0]
        ent["cu"].append(np.asarray(cu, np.float32).T)   # (r, out)
        ent["cd"].append(np.asarray(cd, np.float32).T)   # (in, r)
        ent["su"].append(np.asarray(su, np.float32).T)
        ent["sd"].append(np.asarray(sd_, np.float32).T)
        ent["mc"].append(np.asarray(mc, np.float32) if mc is not None
                         else np.ones((out_f,), np.float32))
        ent["ms"].append(np.asarray(ms, np.float32) if ms is not None
                         else np.ones((out_f,), np.float32))

    state: Dict = {}
    new_params = params
    for ppath, ent in staged.items():
        # contiguity: the staged layer count must equal the base stack's
        # depth — a layer present in the dicts for k but missing for k' < k
        # would silently shift weights down the stacked axis
        base_depth = tree_get(params, ppath)["kernel"].shape[0]
        if len(ent["cu"]) != base_depth:
            raise ValueError(
                f"LoRA artifact covers {len(ent['cu'])} of "
                f"{base_depth} layers for stack {ppath}")
        lora = {
            "content": {"down": jnp.asarray(np.stack(ent["cd"]), dtype),
                        "up": jnp.asarray(np.stack(ent["cu"]), dtype)},
            "style": {"down": jnp.asarray(np.stack(ent["sd"]), dtype),
                      "up": jnp.asarray(np.stack(ent["su"]), dtype)},
            "merge_content": jnp.asarray(np.stack(ent["mc"]), dtype),
            "merge_style": jnp.asarray(np.stack(ent["ms"]), dtype),
        }
        new_params = tree_set(new_params, ppath + ("lora",), lora)
        n_layers, _, out_f = lora["content"]["up"].shape
        state = surgery._set_nested(
            state, ppath, surgery.stacked_unzip_state(n_layers, out_f))
    return new_params, state


def import_single_lora(params, sd: Dict, *, branch: str = "content",
                       scale: float = 1.0, dtype=jnp.float32):
    """Load ONE exported per-branch LoRA file (the diffusers-
    `load_lora_weights`-compatible artifact, reference infer.py:173-199)
    into a base UNet: the chosen branch carries the adapter (scaled), the
    other branch is zeroed, mergers are ones. Use mode='content' (or
    'style') at generation so mergers are skipped — exactly how the
    reference does content-only / style-only recontextualization.
    Returns (params, lora_state)."""
    other = "style" if branch == "content" else "content"
    staged: Dict[Tuple, Dict] = {}
    for path, proj, k, name in iter_layer_modules(params):
        up = sd.get(f"unet.{name}.lora.up.weight")
        down = sd.get(f"unet.{name}.lora.down.weight")
        if up is None or down is None:
            continue
        ent = staged.setdefault(path + (proj,), {"u": [], "d": []})
        ent["u"].append(np.asarray(up, np.float32).T * scale)
        ent["d"].append(np.asarray(down, np.float32).T)

    state: Dict = {}
    new_params = params
    for ppath, ent in staged.items():
        up = jnp.asarray(np.stack(ent["u"]), dtype)
        down = jnp.asarray(np.stack(ent["d"]), dtype)
        n_layers, _, out_f = up.shape
        zero_pair = {"down": jnp.zeros_like(down),
                     "up": jnp.zeros_like(up)}
        lora = {
            branch: {"down": down, "up": up},
            other: zero_pair,
            "merge_content": jnp.ones((n_layers, out_f), dtype),
            "merge_style": jnp.ones((n_layers, out_f), dtype),
        }
        new_params = tree_set(new_params, ppath + ("lora",), lora)
        state = surgery._set_nested(
            state, ppath, surgery.stacked_unzip_state(n_layers, out_f))
    return new_params, state


# ---------------------------------------------------------------------------
# File IO (safetensors for LoRA dicts, torch .pth for mergers — the
# reference's exact on-disk formats)
# ---------------------------------------------------------------------------

def save_safetensors(sd: Dict[str, np.ndarray], path: str):
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file
    return load_file(path)


def save_merger_pth(sd: Dict[str, np.ndarray], path: str):
    import torch
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)


def load_merger_pth(path: str) -> Dict[str, np.ndarray]:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in obj.items()}
