"""Motion-weight bridge: diffusers MotionAdapter / UNetMotionModel
state dicts and the reference's ``motion_modules.pth`` <-> the
motion_modules pytree subtree.

Reference load surface: ``animatediff/utils.py:13-63`` — a checkpoint
path is either a diffusers MotionAdapter directory
(guoyww/animatediff-motion-adapter-sdxl-beta) or a trained
``motion_modules.pth`` picked up by ``_find_pth`` (:56-63, a torch-saved
dict of merged motion weights under original UNetMotionModel key names,
produced by ``get_merged_motion_state_dict``, temporal_lora.py:169-192).
Save surface: ``animatediff/utils.py:102-145``.

Both formats use the same key namespace, which the motion pytree mirrors
exactly (models/motion.py docstring):

  {down_blocks.{i}|mid_block|up_blocks.{i}}.motion_modules.{j}.
      {norm,proj_in,proj_out}.{weight,bias}
      transformer_blocks.{k}.{norm1,norm2,norm3}.{weight,bias}
      transformer_blocks.{k}.attn{1,2}.{to_q,to_k,to_v}.weight
      transformer_blocks.{k}.attn{1,2}.to_out.0.{weight,bias}
      transformer_blocks.{k}.ff.net.0.proj.{weight,bias}
      transformer_blocks.{k}.ff.net.2.{weight,bias}
      transformer_blocks.{k}.pos_embed.pe        (persistent buffer in
          UNetMotionModel state dicts; deterministic sinusoidal table —
          validated and dropped on import, recomputed on export)
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp


def _is_motion(path) -> bool:
    return "motion_modules" in path


def reference_pe_table(dim: int, max_len: int = 32) -> np.ndarray:
    """The diffusers SinusoidalPositionalEmbedding buffer, shape
    (1, max_len, dim)."""
    from video_style_transfer_tpu.models.embeddings import (
        temporal_positional_encoding)
    return np.asarray(temporal_positional_encoding(max_len, dim,
                                                   max_len=max_len),
                      np.float32)[None]


def import_motion_state_dict(unet_params, sd: Dict[str, np.ndarray], *,
                             dtype=None, strict: bool = True):
    """Graft a motion-module state dict (MotionAdapter safetensors or a
    UNetMotionModel-derived ``motion_modules.pth``) into the UNet params
    pytree. Non-motion keys in ``sd`` are ignored (UNetMotionModel full
    state dicts work); ``pos_embed.pe`` buffers are checked against the
    deterministic sinusoidal table and dropped.

    dtype defaults to the dtype of the existing motion kernels so a bf16
    serving tree stays bf16."""
    from video_style_transfer_tpu.utils.hf_convert import convert_to_pytree

    motion_sd = {k: np.asarray(v) for k, v in sd.items()
                 if "motion_modules" in k}
    if not motion_sd:
        raise KeyError("state dict contains no 'motion_modules' keys")
    for k in [k for k in motion_sd if k.endswith("pos_embed.pe")]:
        pe = motion_sd.pop(k)
        want = reference_pe_table(pe.shape[-1], pe.shape[-2])
        if not np.allclose(pe, want, atol=1e-4):
            raise ValueError(
                f"{k}: positional-encoding buffer does not match the "
                "sinusoidal table — checkpoint was trained with a "
                "different PE scheme")
    if dtype is None:
        probe = unet_params
        for part in ("down_blocks", 0, "motion_modules", 0, "proj_in",
                     "kernel"):
            probe = probe[part]
        dtype = probe.dtype
    return convert_to_pytree(motion_sd, unet_params, dtype=dtype,
                             strict=strict, select=_is_motion)


def export_motion_state_dict(params, *, fold_tlora: bool = True,
                             include_pe: bool = True,
                             max_seq_length: int = 32
                             ) -> Dict[str, np.ndarray]:
    """Motion-module state dict in UNetMotionModel key naming, fp32
    numpy. With fold_tlora the temporal-LoRA deltas are merged into the
    base kernels (wrapper-free checkpoints, reference
    get_merged_motion_state_dict); include_pe emits the ``pos_embed.pe``
    buffers exactly as ``unet.state_dict()`` would."""
    from video_style_transfer_tpu.utils.hf_convert import (
        export_to_state_dict)

    merged = fold_temporal_lora(params) if fold_tlora else params
    sd = export_to_state_dict(merged, select=_is_motion)
    if include_pe:
        import re
        for key in list(sd):
            m = re.fullmatch(r"(.*transformer_blocks\.\d+\.)norm1\.weight",
                             key)
            if m:
                sd[m.group(1) + "pos_embed.pe"] = reference_pe_table(
                    sd[key].shape[-1], max_seq_length)
    return sd


def fold_temporal_lora(params):
    """Return params with every 'tlora' delta folded into its base
    kernel and the adapters removed (reference merged_weight,
    temporal_lora.py:38-41)."""
    from video_style_transfer_tpu.lora.surgery import (
        PROJS, iter_motion_attention_paths, tree_get, tree_set)
    from video_style_transfer_tpu.lora.temporal import merge_into_kernel

    merged = params
    for apath in iter_motion_attention_paths(params):
        attn = tree_get(merged, apath)
        for proj in PROJS:
            p = attn[proj]
            if "tlora" not in p:
                continue
            kernel = jax.vmap(merge_into_kernel)(p["kernel"], p["tlora"])
            new_p = {k: v for k, v in p.items() if k != "tlora"}
            new_p["kernel"] = kernel
            merged = tree_set(merged, apath + (proj,), new_p)
    return merged


# ---------------------------------------------------------------------------
# File I/O (.pth via torch, .safetensors via interop)
# ---------------------------------------------------------------------------

def find_motion_checkpoint(path: str) -> Optional[str]:
    """Reference _find_pth semantics (animatediff/utils.py:56-63) widened
    to the safetensors artifact this repo's trainer writes."""
    if os.path.isfile(path):
        return path
    if os.path.isdir(path):
        for name in ("motion_modules.pth", "motion_modules.safetensors"):
            cand = os.path.join(path, name)
            if os.path.isfile(cand):
                return cand
    return None


def load_motion_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a motion checkpoint file or directory: ``.pth`` (torch,
    the reference's format) or ``.safetensors``."""
    found = find_motion_checkpoint(path)
    if found is None:
        raise FileNotFoundError(f"no motion checkpoint at {path}")
    if found.endswith(".pth"):
        import torch
        sd = torch.load(found, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    from video_style_transfer_tpu.lora.interop import load_safetensors
    return load_safetensors(found)


def save_motion_checkpoint(sd: Dict[str, np.ndarray], path: str):
    """Write ``.pth`` (torch.save — loadable by the reference's
    load_unet_with_motion) or ``.safetensors`` by extension."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if path.endswith(".pth"):
        import torch
        torch.save({k: torch.from_numpy(
            np.array(v, np.float32, copy=True)) for k, v in sd.items()},
            path)
        return path
    from video_style_transfer_tpu.lora.interop import save_safetensors
    save_safetensors(sd, path)
    return path
