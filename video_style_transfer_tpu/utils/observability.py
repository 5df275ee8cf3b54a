"""Observability: cone diagnostics, per-block LoRA norm/merger logging,
metrics sinks.

Equivalent of the reference's load-bearing gradient diagnostics
(record_utils/cone.py; online logging train_unziplora.py:2224-2254 via
lora_norm_log/lora_merge_log, unziplora_unet/utils.py:552-607). Cone
values are computed inside the jitted train step from the grads pytree
(lora/unzip.py:cone_*); this module does the host-side aggregation and
rendering.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from video_style_transfer_tpu.lora.surgery import (
    PROJS, iter_spatial_attention_paths, path_str, tree_get)
from video_style_transfer_tpu.lora.unzip import composed_delta


# ---------------------------------------------------------------------------
# Cone diagnostics (offline analysis of saved weights+grads,
# reference record_utils/cone.py:54-108)
# ---------------------------------------------------------------------------

def cone_from_arrays(weight: np.ndarray, grad: np.ndarray) -> np.ndarray:
    """cone = W .* dW elementwise (reference cone_matrix :54-73)."""
    return np.asarray(weight) * np.asarray(grad)


def cone_column_sparsity(cone: np.ndarray,
                         threshold: float = 1e-5) -> np.ndarray:
    """Fraction of rows per column with |cone| above threshold
    (reference cone_column_sparsity :75-81)."""
    return (np.abs(cone) > threshold).sum(axis=0) / cone.shape[0]


def render_cone_heatmaps(cone_by_layer: Dict[str, np.ndarray],
                         out_path: Optional[str] = None):
    """Column-sparsity heatmap strips per layer (reference
    draw_concatenated_heatmap :83-108). Returns the figure or saves to
    out_path."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(cone_by_layer)
    fig, axes = plt.subplots(max(n, 1), 1,
                             figsize=(10, 1.2 * max(n, 1)),
                             squeeze=False)
    if n == 0:
        axes[0, 0].axis("off")
    for ax, (name, cone) in zip(axes[:, 0], sorted(cone_by_layer.items())):
        row = cone_column_sparsity(cone)[None, :]
        ax.imshow(row, aspect="auto", cmap="viridis", vmin=0, vmax=1)
        ax.set_yticks([])
        ax.set_title(name, fontsize=6, loc="left")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        return out_path
    return fig


# ---------------------------------------------------------------------------
# Per-block LoRA norms and merger means (wandb-style scalars)
# ---------------------------------------------------------------------------

def _block_group(path) -> str:
    """'down_blocks.1.attentions.0' style grouping key (the reference
    groups by the prefix before 'transformer',
    unziplora_unet/utils.py:581)."""
    parts = []
    for k in path:
        if k == "transformer_blocks":
            break
        parts.append(str(k))
    return ".".join(parts)


def lora_norm_log(params, branch: str, *, with_merge: bool = False,
                  norm: str = "L2") -> Dict:
    """Mean norm of the composed LoRA delta per block group (reference
    lora_norm_log, utils.py:578-592; norm kinds 'L2' (Frobenius) or 'L1'
    mirroring get_unziplora_norm, unziplora_linear_layer.py:95-98)."""
    groups: Dict[str, list] = {}
    for path in iter_spatial_attention_paths(params):
        attn = tree_get(params, path)
        for proj in PROJS:
            if "lora" not in attn[proj]:
                continue
            lp = attn[proj]["lora"]
            delta = jax.vmap(
                lambda p: composed_delta(p, branch, with_merge))(lp)
            df = delta.astype(jnp.float32)
            if norm == "L1":
                norms = jnp.sum(jnp.abs(df), axis=(1, 2))
            else:
                norms = jnp.sqrt(jnp.sum(df ** 2, axis=(1, 2)))
            groups.setdefault(f"{branch}_{_block_group(path)}_norm",
                              []).append(norms)
    return {k: float(jnp.mean(jnp.concatenate(v)))
            for k, v in groups.items()}


def lora_merge_log(params, branch: str) -> Dict:
    """Mean merger value per block group (reference lora_merge_log,
    utils.py:596-607)."""
    groups: Dict[str, list] = {}
    for path in iter_spatial_attention_paths(params):
        attn = tree_get(params, path)
        for proj in PROJS:
            if "lora" not in attn[proj]:
                continue
            m = attn[proj]["lora"][f"merge_{branch}"]
            groups.setdefault(f"{branch}_{_block_group(path)}_merge",
                              []).append(jnp.mean(m.astype(jnp.float32)))
    return {k: float(jnp.mean(jnp.stack(v))) for k, v in groups.items()}


# ---------------------------------------------------------------------------
# Metrics sinks
# ---------------------------------------------------------------------------

class MetricsLogger:
    """JSONL scalar sink + optional tensorboard/wandb (both gated on
    availability, mirroring the reference's accelerate trackers)."""

    def __init__(self, log_dir: str, *, use_tensorboard: bool = False,
                 use_wandb: bool = False, project: str = "vst-tpu",
                 enabled: bool = True):
        """enabled=False turns every sink into a no-op (nothing is
        opened or written) — multi-process trainers pass
        `enabled=is_main_process()` so only process 0 writes, like the
        reference's is_main_process-gated trackers
        (train_unziplora.py:1867-1890)."""
        self.enabled = enabled
        self._f = None
        self._tb = None
        self._wandb = None
        if not enabled:
            self.path = None
            return
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                pass
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project=project, dir=log_dir,
                                         mode=os.environ.get(
                                             "WANDB_MODE", "offline"))
            except Exception:
                pass

    def log(self, step: int, scalars: Dict[str, float]):
        if not self.enabled:
            return
        clean = {k: float(v) for k, v in scalars.items()}
        self._f.write(json.dumps({"step": int(step), "time": time.time(),
                                  **clean}) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(clean, step=step)

    def log_images(self, step: int, images: Dict[str, "object"]):
        """Log validation images to the active trackers (reference logs
        per-mode validation grids to wandb/tensorboard,
        train_unziplora.py:2329-2340). images: name -> (H, W, 3) uint8
        or float [0, 1] array. No-op for the JSONL sink (paths are
        logged as scalar-less entries instead)."""
        if not self.enabled:
            return
        import numpy as np
        for name, img in images.items():
            arr = np.asarray(img)
            if arr.dtype != np.uint8:
                arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
            if self._tb is not None:
                self._tb.add_image(name, arr, step, dataformats="HWC")
            if self._wandb is not None:
                import wandb
                self._wandb.log({name: wandb.Image(arr)}, step=step)
        self._f.write(json.dumps({
            "step": int(step), "time": time.time(),
            "validation_images": sorted(images)}) + "\n")
        self._f.flush()

    def close(self):
        if self._f is not None:
            self._f.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()


class StepTimer:
    """Wall-clock per-step timing with jax profiler hooks (the reference
    has no profiling at all — SURVEY.md §5 tracing row)."""

    def __init__(self):
        self._last = time.time()

    def lap(self) -> float:
        now = time.time()
        dt = now - self._last
        self._last = now
        return dt


def start_profiler_trace(log_dir: str):
    jax.profiler.start_trace(log_dir)


def stop_profiler_trace():
    jax.profiler.stop_trace()
