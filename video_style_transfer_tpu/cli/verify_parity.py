"""Weight-arrival-day parity gate — the ONE command to run when real
SDXL weights and reference outputs first become available.

No SDXL checkpoint, LPIPS weights, or network exists in the build
environment, so the north-star quality gate (per-frame LPIPS <= 0.02 vs
the reference, BASELINE.md) has never been evaluated; this runbook
stages everything so that evaluation is a single invocation:

  python -m video_style_transfer_tpu.cli.verify_parity \\
      --pretrained_model_name_or_path /ckpts/stable-diffusion-xl-base-1.0 \\
      --unziplora_name_or_path /artifacts --unziplora_name unziplora \\
      --prompt "a sks dog in szn style" \\
      --reference_outputs /ref_outputs \\
      --lpips /ckpts/lpips_vgg16.safetensors \\
      --report parity_report.json

Stages (each recorded in the JSON report; exit 0 iff every evaluated
gate passes — matching the reference's load surface at
train_unziplora.py:1240-1287 and its fixed-seed generation settings at
infer.py:14,99):

 1. inventory — diff every on-disk key -> shape table (safetensors
    headers only; no tensor data is read) against the converter's
    declared load contract (utils/hf_convert.state_dict_shapes /
    clip_source_shapes). Missing keys, unexpected keys, and shape
    mismatches are itemized per component BEFORE any load is attempted.
 2. load      — run the converter (its own per-key shape asserts fire on
    any transpose/size drift the inventory classified).
 3. generate  — cli.infer with the reference's settings (the REAL
    serving CLI, not a parallel code path), fixed seeds, fp32 decode.
 4. compare   — cli.compare_outputs per reference file matched by name:
    PSNR/SSIM always; per-frame LPIPS and the <= 0.02 gate when
    --lpips weights are supplied (models/lpips.py).

The full chain is smoke-tested end-to-end against a tiny synthetic
checkpoint (tests/test_verify_parity.py builds one with
make_synthetic_checkpoint below), so on weight-arrival day only the
paths change.
"""
from __future__ import annotations

import argparse
import json
import os
import struct
import sys
from typing import Dict, Tuple

import numpy as np

# keys diffusers/transformers checkpoints carry that the converters
# deliberately ignore (non-weights or precomputed buffers)
IGNORABLE = ("position_ids", "logit_scale", "attn.masked_bias",
             "model_ema")


def safetensors_header(path: str) -> Dict[str, Tuple[int, ...]]:
    """key -> shape from a .safetensors header (8-byte LE length + JSON;
    tensor data is never read, so inventorying a 10 GB checkpoint is
    instant)."""
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(n))
    return {k: tuple(v["shape"]) for k, v in header.items()
            if k != "__metadata__"}


def dir_header(path: str) -> Dict[str, Tuple[int, ...]]:
    out: Dict[str, Tuple[int, ...]] = {}
    for fname in sorted(os.listdir(path)):
        if fname.endswith(".safetensors"):
            out.update(safetensors_header(os.path.join(path, fname)))
    if not out:
        raise FileNotFoundError(f"no .safetensors under {path}")
    return out


def diff_inventory(disk: Dict[str, Tuple[int, ...]],
                   contract: Dict[str, Tuple[int, ...]]) -> Dict:
    missing = sorted(set(contract) - set(disk))
    extra = sorted(set(disk) - set(contract))
    ignorable = [k for k in extra if any(t in k for t in IGNORABLE)]
    extra = [k for k in extra if k not in ignorable]
    mismatch = sorted(
        (k, list(disk[k]), list(contract[k]))
        for k in set(disk) & set(contract)
        if tuple(disk[k]) != tuple(contract[k]))
    return {
        "keys_on_disk": len(disk),
        "keys_in_contract": len(contract),
        "missing": missing,
        "unexpected": extra,
        "ignored_buffers": ignorable,
        "shape_mismatch": [
            {"key": k, "disk": d, "expected": e} for k, d, e in mismatch],
        "ok": not missing and not extra and not mismatch,
    }


def stage_inventory(model_dir: str, configs) -> Dict:
    """Diff unet/ vae/ text_encoder/ text_encoder_2/ against the load
    contract, header-only."""
    import jax

    from video_style_transfer_tpu.models.unet import init_unet
    from video_style_transfer_tpu.models.vae import init_vae
    from video_style_transfer_tpu.utils.hf_convert import (
        clip_source_shapes, state_dict_shapes)

    ucfg, vcfg, lcfg, gcfg = configs

    def abstract(fn):
        return jax.eval_shape(fn, jax.random.PRNGKey(0))

    report = {}
    report["unet"] = diff_inventory(
        dir_header(os.path.join(model_dir, "unet")),
        state_dict_shapes(abstract(lambda k: init_unet(k, ucfg))))
    report["vae"] = diff_inventory(
        dir_header(os.path.join(model_dir, "vae")),
        state_dict_shapes(abstract(lambda k: init_vae(k, vcfg))))
    report["text_encoder"] = diff_inventory(
        dir_header(os.path.join(model_dir, "text_encoder")),
        clip_source_shapes(lcfg))
    report["text_encoder_2"] = diff_inventory(
        dir_header(os.path.join(model_dir, "text_encoder_2")),
        clip_source_shapes(gcfg))
    report["ok"] = all(report[c]["ok"] for c in
                       ("unet", "vae", "text_encoder", "text_encoder_2"))
    return report


def make_synthetic_checkpoint(out_dir: str, seed: int = 0):
    """Build a tiny diffusers-layout checkpoint directory (random
    weights, tiny_checkpoint_configs topology, synthetic byte-level
    tokenizers) — the smoke substrate for this runbook's tests."""
    import jax

    from video_style_transfer_tpu.cli.common import tiny_checkpoint_configs
    from video_style_transfer_tpu.data.tokenizer import bytes_to_unicode
    from video_style_transfer_tpu.lora.interop import save_safetensors
    from video_style_transfer_tpu.models.unet import init_unet
    from video_style_transfer_tpu.models.vae import init_vae
    from video_style_transfer_tpu.utils.hf_convert import (
        clip_source_shapes, export_to_state_dict)

    ucfg, vcfg, lcfg, gcfg = tiny_checkpoint_configs()
    key = jax.random.PRNGKey(seed)

    os.makedirs(os.path.join(out_dir, "unet"), exist_ok=True)
    save_safetensors(
        export_to_state_dict(init_unet(key, ucfg)),
        os.path.join(out_dir, "unet",
                     "diffusion_pytorch_model.safetensors"))
    os.makedirs(os.path.join(out_dir, "vae"), exist_ok=True)
    save_safetensors(
        export_to_state_dict(init_vae(jax.random.fold_in(key, 1), vcfg)),
        os.path.join(out_dir, "vae",
                     "diffusion_pytorch_model.safetensors"))

    # CLIP weights synthesized directly from the load contract (the
    # converter is one-way; the contract IS the checkpoint-side shape
    # table). Scale ~N(0, 0.02) like transformers' init.
    rng = np.random.default_rng(seed)
    for sub, cfg in (("text_encoder", lcfg), ("text_encoder_2", gcfg)):
        sd = {k: rng.normal(0, 0.02, s).astype(np.float32)
              for k, s in clip_source_shapes(cfg).items()}
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
        save_safetensors(sd, os.path.join(out_dir, sub,
                                          "model.safetensors"))

    # byte-level tokenizers: every single byte is a token, no merges —
    # valid BPE, vocab 514 (256 + 256</w> + bos/eos) fits tiny vocab 1000
    syms = list(bytes_to_unicode().values())
    vocab = {}
    for s in syms:
        vocab[s] = len(vocab)
    for s in syms:
        vocab[s + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    for sub in ("tokenizer", "tokenizer_2"):
        d = os.path.join(out_dir, sub)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "vocab.json"), "w") as f:
            json.dump(vocab, f)
        with open(os.path.join(d, "merges.txt"), "w") as f:
            f.write("#version: 0.2\n")
    return out_dir


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pretrained_model_name_or_path", required=True)
    p.add_argument("--pretrained_vae_model_name_or_path", default=None)
    p.add_argument("--unziplora_name_or_path", default=None)
    p.add_argument("--unziplora_name", default="unziplora")
    p.add_argument("--prompt", default=None,
                   help="generation prompt (use the reference run's "
                        "exact prompt); omit to stop after inventory")
    p.add_argument("--mode", default=None,
                   choices=["both", "content", "style", "base"],
                   help="default: both when --unziplora_name_or_path is "
                        "given, else base")
    p.add_argument("--seeds", type=int, nargs="+",
                   default=[0, 1000, 111, 1234],
                   help="the reference's fixed seed set (infer.py:14)")
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=5.0)
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--sampler", default="euler", choices=["euler", "dpm"])
    p.add_argument("--reference_outputs", default=None,
                   help="directory of reference-generated images named "
                        "like ours ({mode}_seed{N}.png); enables the "
                        "compare stage")
    p.add_argument("--lpips", default=None, metavar="WEIGHTS",
                   help="VGG16+lin LPIPS weight file; enables the "
                        "<= 0.02 per-frame LPIPS gate (BASELINE.md)")
    p.add_argument("--lpips_gate", type=float, default=0.02)
    p.add_argument("--psnr_min", type=float, default=None,
                   help="optional PSNR gate (dB) for runs without LPIPS "
                        "weights")
    p.add_argument("--output_dir", default="out/verify_parity")
    p.add_argument("--report", default="parity_report.json")
    p.add_argument("--config_preset", default="sdxl",
                   choices=["sdxl", "tiny"],
                   help="tiny = synthetic-checkpoint smoke topology")
    p.add_argument("--stop_after", default=None,
                   choices=["inventory", "load", "generate"],
                   help="run a prefix of the stage chain")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from video_style_transfer_tpu.cli import common

    if args.config_preset == "tiny":
        configs = common.tiny_checkpoint_configs()
    else:
        from video_style_transfer_tpu.config import (CLIPConfig, UNetConfig,
                                                     VAEConfig)
        configs = (UNetConfig.sdxl(), VAEConfig.sdxl(),
                   CLIPConfig.sdxl_clip_l(), CLIPConfig.sdxl_big_g())

    report = {"model_dir": args.pretrained_model_name_or_path,
              "stages": {}}
    ok = True

    # ---- stage 1: inventory ------------------------------------------
    inv = stage_inventory(args.pretrained_model_name_or_path, configs)
    report["stages"]["inventory"] = inv
    ok &= inv["ok"]
    print(f"[1/4] inventory: {'OK' if inv['ok'] else 'MISMATCH'}")
    for comp in ("unet", "vae", "text_encoder", "text_encoder_2"):
        c = inv[comp]
        print(f"      {comp}: {c['keys_on_disk']} keys on disk, "
              f"{len(c['missing'])} missing, "
              f"{len(c['unexpected'])} unexpected, "
              f"{len(c['shape_mismatch'])} shape mismatches")
    if args.stop_after == "inventory" or not inv["ok"] \
            or args.prompt is None:
        if args.prompt is None and inv["ok"] \
                and args.stop_after != "inventory":
            print("      (no --prompt: stopping after inventory)")
        _finish(report, args, ok)
        return 0 if ok else 1

    # ---- stage 2: load ------------------------------------------------
    try:
        bundle = common.load_models(
            args.pretrained_model_name_or_path, configs=configs,
            vae_path=args.pretrained_vae_model_name_or_path)
        report["stages"]["load"] = {"ok": True}
        print("[2/4] load: OK (converter shape asserts passed)")
    except Exception as e:  # noqa: BLE001 — report, don't crash the gate
        report["stages"]["load"] = {"ok": False, "error": str(e)[:500]}
        print(f"[2/4] load: FAILED — {e}")
        _finish(report, args, False)
        return 1
    if args.stop_after == "load":
        _finish(report, args, ok)
        return 0 if ok else 1

    # ---- stage 3: generate (the real serving CLI) ---------------------
    from video_style_transfer_tpu.cli import infer
    mode = args.mode or ("both" if args.unziplora_name_or_path else "base")
    gen_argv = [
        "--pretrained_model_name_or_path",
        args.pretrained_model_name_or_path,
        "--prompt", args.prompt,
        "--mode", mode,
        "--num_inference_steps", str(args.num_inference_steps),
        "--guidance_scale", str(args.guidance_scale),
        "--resolution", str(args.resolution),
        "--sampler", args.sampler,
        "--config_preset", args.config_preset,
        "--output_dir", args.output_dir,
        "--seeds", *[str(s) for s in args.seeds],
    ]
    if args.pretrained_vae_model_name_or_path:
        # keep the flag on the argv too (for report reproducibility) even
        # though the prebuilt bundle already carries the override VAE —
        # the reference swaps in e.g. sdxl-vae-fp16-fix and decode parity
        # requires generating with the same VAE it used
        gen_argv += ["--pretrained_vae_model_name_or_path",
                     args.pretrained_vae_model_name_or_path]
    if args.unziplora_name_or_path:
        gen_argv += ["--unziplora_name_or_path",
                     args.unziplora_name_or_path,
                     "--unziplora_name", args.unziplora_name]
    # the load-stage bundle is passed through so the checkpoint is read
    # and converted once, not twice (it already has the VAE override)
    outs = infer.main(gen_argv, bundle=bundle)
    report["stages"]["generate"] = {"ok": True, "outputs": outs,
                                    "mode": mode}
    print(f"[3/4] generate: {len(outs)} image(s) -> {args.output_dir}")
    if args.stop_after == "generate" or not args.reference_outputs:
        if not args.reference_outputs and args.stop_after != "generate":
            print("      (no --reference_outputs: compare skipped)")
        _finish(report, args, ok)
        return 0 if ok else 1

    # ---- stage 4: compare against the reference outputs ---------------
    from video_style_transfer_tpu.cli import compare_outputs
    comps = []
    gates_ok = True
    for out in outs:
        ref = os.path.join(args.reference_outputs, os.path.basename(out))
        if not os.path.exists(ref):
            comps.append({"ours": out, "reference": None,
                          "skipped": "no matching reference file"})
            continue
        cmp_argv = ["--ours", out, "--reference", ref]
        if args.lpips:
            cmp_argv += ["--lpips", args.lpips]
        row = compare_outputs.main(cmp_argv)
        row = {k: v for k, v in row.items() if k != "per_frame"}
        row.update(ours=out, reference=ref)
        if args.lpips:
            row["lpips_gate"] = row["lpips_max"] <= args.lpips_gate
            gates_ok &= row["lpips_gate"]
        if args.psnr_min is not None:
            row["psnr_gate"] = row["psnr_mean"] >= args.psnr_min
            gates_ok &= row["psnr_gate"]
        comps.append(row)
    matched = [c for c in comps if "skipped" not in c]
    gates_ok &= bool(matched)
    report["stages"]["compare"] = {
        "ok": gates_ok, "pairs": comps,
        "lpips_gate_evaluated": bool(args.lpips),
        "lpips_gate_threshold": args.lpips_gate}
    ok &= gates_ok
    print(f"[4/4] compare: {len(matched)}/{len(comps)} matched, "
          f"gates {'PASS' if gates_ok else 'FAIL'}"
          + ("" if args.lpips else
             "  (LPIPS gate NOT evaluated — pass --lpips to enable the "
             "<= 0.02 north-star gate)"))
    _finish(report, args, ok)
    return 0 if ok else 1


def _finish(report, args, ok):
    report["ok"] = bool(ok)
    with open(args.report, "w") as f:
        json.dump(report, f, indent=1)
    print(f"verdict: {'PASS' if ok else 'FAIL'} -> {args.report}")


if __name__ == "__main__":
    sys.exit(main())
