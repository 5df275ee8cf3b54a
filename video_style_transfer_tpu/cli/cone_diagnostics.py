"""Offline cone diagnostics CLI.

Equivalent of record_utils/cone.py:110-145: load saved LoRA weights and
gradient dumps, compute cone = W .* dW per layer, render column-sparsity
heatmap strips.

Inputs: two .npz (or reference-format .safetensors) files with matching
keys — composed weights and composed gradients per layer.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def load_arrays(path: str):
    if path.endswith(".npz"):
        return dict(np.load(path))
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    raise SystemExit(f"unsupported file type: {path}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights")
    p.add_argument("--grads")
    p.add_argument("--scores", default=None,
                   help="a grad_records/stepN.npz dumped by the stage-1 "
                        "trainer's --with_grad_record: per-layer cone "
                        "COLUMN scores; rendered directly as strips")
    p.add_argument("--output", default="cone_heatmap.png")
    p.add_argument("--threshold", type=float, default=1e-5)
    p.add_argument("--layers", nargs="*", default=None,
                   help="subset of layer keys (default: all common keys)")
    args = p.parse_args(argv)

    from video_style_transfer_tpu.utils.observability import (
        cone_column_sparsity, cone_from_arrays, render_cone_heatmaps)

    if args.scores:
        scores = load_arrays(args.scores)
        keys = args.layers or sorted(scores)
        # column scores are already the per-column cone aggregate: a
        # (L, out) strip per stacked projection renders as-is
        strips = {k: scores[k].reshape(-1, scores[k].shape[-1])
                  for k in keys}
        out = render_cone_heatmaps(strips, args.output)
        print("wrote", out)
        return out
    if not args.weights or not args.grads:
        raise SystemExit("need --weights and --grads (or --scores)")

    w = load_arrays(args.weights)
    g = load_arrays(args.grads)
    keys = args.layers or sorted(set(w) & set(g))
    if not keys:
        raise SystemExit("no common layer keys between weights and grads")
    cones = {k: cone_from_arrays(w[k], g[k]) for k in keys}
    out = render_cone_heatmaps(cones, args.output)
    for k in keys:
        sp = cone_column_sparsity(cones[k], args.threshold)
        print(f"{k}: avg column sparsity {sp.mean():.4f}")
    print("wrote", out)
    return out


if __name__ == "__main__":
    main()
