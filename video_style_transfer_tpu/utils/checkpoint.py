"""Checkpoint / resume via orbax + reference-format artifact export.

The reference saves state but never implemented resume
(--resume_from_checkpoint raises NotImplementedError,
train_unziplora.py:1985-1986); checkpoint rotation keeps
checkpoints_total_limit newest (:2190-2217). Here:

- save_checkpoint / restore_checkpoint: full train state (params,
  opt_state, lora_state, step) via orbax — preemption-safe real resume
- rotation with the same keep-newest semantics
- export_stage1_artifacts: the reference's 4 stage-1 artifacts
  (*_content/ *_style/ safetensors + merger .pth pair,
  train_unziplora.py:2384-2417)
- export_motion_checkpoint: stage-2 motion_modules weights with temporal
  LoRA folded in (animatediff/utils.py:102-145)
"""
from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional

from video_style_transfer_tpu.lora import interop


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, state: Any, step: int, *,
                    total_limit: Optional[int] = None):
    """Write <ckpt_dir>/checkpoint-<step>; rotate to keep the newest
    `total_limit` INCLUDING the new one (reference rotation semantics,
    train_unziplora.py:2190-2217).

    Preemption safety: the new checkpoint is committed (orbax writes to
    a tmp dir and atomically renames on completion) BEFORE any old one
    is deleted — a kill at any point leaves at least the previous good
    checkpoint on disk, and `latest_checkpoint` never sees a
    half-written directory (the orbax tmp name doesn't match the
    checkpoint-<step> pattern)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(ckpt_dir, f"checkpoint-{step}"))
    ckptr = _ckptr()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    if total_limit is not None:
        existing = sorted(
            (d for d in os.listdir(ckpt_dir) if
             re.fullmatch(r"checkpoint-\d+", d)),
            key=lambda d: int(d.split("-")[1]))
        while len(existing) > total_limit:
            shutil.rmtree(os.path.join(ckpt_dir, existing.pop(0)))
    return path


def save_checkpoint_main_process(ckpt_dir: str, state: Any, step: int, *,
                                 total_limit: Optional[int] = None):
    """Multi-process-safe checkpoint write: only process 0 touches the
    filesystem (the reference gates on accelerator.is_main_process,
    train_unziplora.py:2187); other processes return None immediately.

    Two multi-process traps this codifies (both observed as hangs of
    the 2-process CLI test):
      - a default orbax checkpointer runs cross-process commit barriers
        inside save(), so a process-0-only call deadlocks; the
        checkpointer here is built with
        MultiprocessingOptions(active_processes={0}) so process 0 saves
        alone, barrier-free;
      - replicated global jax.Arrays are fetched to host numpy first —
        orbax would otherwise try its per-process ocdbt sharded write,
        which assumes one SHARED checkpoint directory across hosts."""
    import jax
    if jax.process_count() <= 1:
        return save_checkpoint(ckpt_dir, state, step,
                               total_limit=total_limit)
    if jax.process_index() != 0:
        return None
    import numpy as np
    import orbax.checkpoint as ocp
    state = jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
        state)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(ckpt_dir, f"checkpoint-{step}"))
    ckptr = ocp.AsyncCheckpointer(
        ocp.StandardCheckpointHandler(),
        multiprocessing_options=ocp.options.MultiprocessingOptions(
            primary_host=0, active_processes={0}))
    ckptr.save(path, args=ocp.args.StandardSave(state))
    ckptr.wait_until_finished()
    if total_limit is not None:
        existing = sorted(
            (d for d in os.listdir(ckpt_dir) if
             re.fullmatch(r"checkpoint-\d+", d)),
            key=lambda d: int(d.split("-")[1]))
        while len(existing) > total_limit:
            shutil.rmtree(os.path.join(ckpt_dir, existing.pop(0)))
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = [d for d in os.listdir(ckpt_dir)
             if re.fullmatch(r"checkpoint-\d+", d)]
    if not ckpts:
        return None
    newest = max(ckpts, key=lambda d: int(d.split("-")[1]))
    return os.path.abspath(os.path.join(ckpt_dir, newest))


def restore_checkpoint(path: str, abstract_state: Any) -> Any:
    """abstract_state: a pytree of arrays (or ShapeDtypeStructs) matching
    the saved structure."""
    return _ckptr().restore(path, abstract_state)


# ---------------------------------------------------------------------------
# Reference-format artifacts
# ---------------------------------------------------------------------------

def export_stage1_artifacts(out_dir: str, name: str, params, lora_state):
    """Write the reference's final stage-1 artifact set
    (train_unziplora.py:2384-2417):
      {name}_content/pytorch_lora_weights.safetensors
      {name}_style/pytorch_lora_weights.safetensors
      {name}_merger_content.pth / {name}_merger_style.pth
    """
    paths = {}
    for branch in ("content", "style"):
        lora_sd, merger_sd = interop.export_state_dicts(params, lora_state,
                                                        branch)
        d = os.path.join(out_dir, f"{name}_{branch}")
        os.makedirs(d, exist_ok=True)
        f = os.path.join(d, "pytorch_lora_weights.safetensors")
        interop.save_safetensors(lora_sd, f)
        m = os.path.join(out_dir, f"{name}_merger_{branch}.pth")
        interop.save_merger_pth(merger_sd, m)
        paths[branch] = f
        paths[f"merger_{branch}"] = m
    return paths


def export_motion_checkpoint(out_path: str, params):
    """Stage-2 checkpoint: every motion-module weight with the temporal
    LoRA delta folded into the base kernels (wrapper-free inference,
    reference get_merged_motion_state_dict, temporal_lora.py:169-192),
    in diffusers UNetMotionModel key naming. Format by extension:
    ``.pth`` = the reference's torch format (incl. pos_embed.pe buffers,
    loadable by its load_unet_with_motion), else safetensors."""
    from video_style_transfer_tpu.utils.motion_convert import (
        export_motion_state_dict, save_motion_checkpoint)

    sd = export_motion_state_dict(params,
                                  include_pe=out_path.endswith(".pth"))
    save_motion_checkpoint(sd, out_path)
    return sd
