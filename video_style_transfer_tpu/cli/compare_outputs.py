"""Output-quality comparison tool.

The driver's quality gate is per-frame LPIPS <= 0.02 vs the reference
(BASELINE.md north star). Pass ``--lpips <weights>`` (a .pth or
.safetensors holding torchvision VGG16 ``features.*`` weights merged
with the lpips-package ``lin*.model.1.weight`` heads — neither file is
in this environment) to add per-frame LPIPS to the report
(models/lpips.py); PSNR + SSIM (pure numpy) are always reported and
suffice to detect numerical drift between this framework's outputs and
reference outputs from the same checkpoint and seed. Accepts image
files or videos.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def load_frames(path: str) -> np.ndarray:
    """Image or video path -> (N, H, W, 3) uint8."""
    if path.lower().endswith((".png", ".jpg", ".jpeg", ".webp")):
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"))[None]
    import cv2
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise IOError(f"no frames in {path}")
    return np.stack(frames)


# identical frames would give PSNR=inf, which json.dumps serializes as
# the non-RFC-8259 token `Infinity` — cap at a finite sentinel instead
PSNR_MAX = 100.0


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return PSNR_MAX
    return float(min(10 * np.log10(255.0 ** 2 / mse), PSNR_MAX))


def ssim(a: np.ndarray, b: np.ndarray, *, c1=(0.01 * 255) ** 2,
         c2=(0.03 * 255) ** 2, win: int = 8) -> float:
    """Windowed SSIM (pure numpy, uniform window, per-channel mean)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)

    def blocks(x):
        h, w = x.shape[:2]
        hh, ww = h // win * win, w // win * win
        x = x[:hh, :ww]
        return x.reshape(hh // win, win, ww // win, win, -1) \
                .transpose(0, 2, 4, 1, 3).reshape(-1, win * win)

    pa, pb = blocks(a), blocks(b)
    mu_a, mu_b = pa.mean(-1), pb.mean(-1)
    va, vb = pa.var(-1), pb.var(-1)
    cov = ((pa - mu_a[:, None]) * (pb - mu_b[:, None])).mean(-1)
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2))
    return float(s.mean())


def load_lpips_weights(path: str):
    """Load merged VGG16+lin LPIPS weights (.pth or .safetensors) into
    the models/lpips.py params tree."""
    from video_style_transfer_tpu.models.lpips import convert_lpips
    if path.endswith(".safetensors"):
        from video_style_transfer_tpu.lora.interop import load_safetensors
        sd = load_safetensors(path)
    else:
        import torch
        raw = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in raw.items()}
    return convert_lpips(sd)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ours", required=True)
    p.add_argument("--reference", required=True)
    p.add_argument("--lpips", default=None, metavar="WEIGHTS",
                   help="VGG16+lin LPIPS weight file; adds per-frame "
                        "LPIPS to the report")
    p.add_argument("--json_out", default=None)
    args = p.parse_args(argv)

    a = load_frames(args.ours)
    b = load_frames(args.reference)
    n = min(len(a), len(b))

    lpips_vals = None
    if args.lpips:
        import jax.numpy as jnp
        from video_style_transfer_tpu.models.lpips import lpips_distance
        lp = load_lpips_weights(args.lpips)
        to_unit = lambda x: jnp.asarray(  # noqa: E731
            x[:n], jnp.float32) / 127.5 - 1.0
        lpips_vals = np.asarray(lpips_distance(lp, to_unit(a), to_unit(b)))

    per_frame = []
    for i in range(n):
        ai, bi = a[i], b[i]
        if ai.shape != bi.shape:
            raise SystemExit(f"shape mismatch at frame {i}: "
                             f"{ai.shape} vs {bi.shape}")
        row = {"frame": i, "psnr": psnr(ai, bi), "ssim": ssim(ai, bi)}
        if lpips_vals is not None:
            row["lpips"] = float(lpips_vals[i])
        per_frame.append(row)
    report = {
        "frames": n,
        "psnr_mean": float(np.mean([f["psnr"] for f in per_frame])),
        "ssim_mean": float(np.mean([f["ssim"] for f in per_frame])),
        "per_frame": per_frame,
    }
    if lpips_vals is not None:
        report["lpips_mean"] = float(np.mean(lpips_vals))
        report["lpips_max"] = float(np.max(lpips_vals))
    print(json.dumps({k: v for k, v in report.items()
                      if k != "per_frame"}))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)
    return report


if __name__ == "__main__":
    main()
