"""Parity-gate runbook smoke (cli/verify_parity.py): the full
inventory -> load -> generate -> compare chain runs end to end against a
tiny synthetic diffusers-layout checkpoint, and each failure class a
real weight drop could present (missing key, unexpected key, wrong
shape) is detected at the INVENTORY stage, before any load.

On weight-arrival day only the paths change — README points here.
"""
import json
import os
import shutil

import numpy as np
import pytest

from video_style_transfer_tpu.cli import verify_parity
from video_style_transfer_tpu.cli.verify_parity import (
    dir_header, make_synthetic_checkpoint, safetensors_header,
    stage_inventory)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    return make_synthetic_checkpoint(
        str(tmp_path_factory.mktemp("ckpt") / "model"))


def test_safetensors_header_matches_load(ckpt):
    """Header-only shapes agree with a full tensor load."""
    from video_style_transfer_tpu.lora.interop import load_safetensors
    path = os.path.join(ckpt, "unet", "diffusion_pytorch_model.safetensors")
    hdr = safetensors_header(path)
    full = load_safetensors(path)
    assert set(hdr) == set(full)
    for k in hdr:
        assert hdr[k] == full[k].shape


def test_inventory_clean(ckpt):
    from video_style_transfer_tpu.cli.common import tiny_checkpoint_configs
    inv = stage_inventory(ckpt, tiny_checkpoint_configs())
    assert inv["ok"], {c: inv[c] for c in inv if c != "ok"
                       and not inv[c]["ok"]}


def _copy_ckpt(ckpt, tmp_path):
    dst = str(tmp_path / "mutated")
    shutil.copytree(ckpt, dst)
    return dst


def _mutate_unet(dst, fn):
    """fn(state_dict) -> state_dict; rewrites the unet safetensors."""
    from video_style_transfer_tpu.lora.interop import (load_safetensors,
                                                       save_safetensors)
    path = os.path.join(dst, "unet", "diffusion_pytorch_model.safetensors")
    sd = fn(load_safetensors(path))
    save_safetensors(sd, path)


def test_inventory_flags_missing_key(ckpt, tmp_path):
    dst = _copy_ckpt(ckpt, tmp_path)

    def drop_one(sd):
        victim = sorted(sd)[0]
        del sd[victim]
        drop_one.victim = victim
        return sd

    _mutate_unet(dst, drop_one)
    from video_style_transfer_tpu.cli.common import tiny_checkpoint_configs
    inv = stage_inventory(dst, tiny_checkpoint_configs())
    assert not inv["ok"]
    assert inv["unet"]["missing"] == [drop_one.victim]


def test_inventory_flags_shape_mismatch_and_extra(ckpt, tmp_path):
    dst = _copy_ckpt(ckpt, tmp_path)

    def corrupt(sd):
        victim = next(k for k in sorted(sd) if sd[k].ndim == 2)
        sd[victim] = np.ascontiguousarray(sd[victim].T)  # transposed!
        corrupt.victim = victim
        sd["totally.unexpected.weight"] = np.zeros((3, 3), np.float32)
        # known-ignorable buffers must NOT fail the gate
        sd["text_model.embeddings.position_ids"] = np.zeros(
            (1, 77), np.float32)
        return sd

    _mutate_unet(dst, corrupt)
    from video_style_transfer_tpu.cli.common import tiny_checkpoint_configs
    inv = stage_inventory(dst, tiny_checkpoint_configs())
    assert not inv["ok"]
    u = inv["unet"]
    assert [m["key"] for m in u["shape_mismatch"]] == [corrupt.victim]
    assert u["unexpected"] == ["totally.unexpected.weight"]
    assert u["ignored_buffers"] == ["text_model.embeddings.position_ids"]


@pytest.mark.slow
def test_full_chain_self_compare(ckpt, tmp_path):
    """inventory -> load -> generate (real infer CLI, tiny topology,
    2 steps @ 16 px) -> compare against a byte-copy of our own outputs:
    every stage runs, PSNR gate passes at the self-compare ceiling."""
    out_dir = str(tmp_path / "ours")
    report_path = str(tmp_path / "report.json")
    rc = verify_parity.main([
        "--pretrained_model_name_or_path", ckpt,
        "--config_preset", "tiny",
        "--prompt", "a photo of a dog",
        "--num_inference_steps", "2",
        "--resolution", "16",
        "--seeds", "0",
        "--output_dir", out_dir,
        "--report", report_path,
        "--stop_after", "generate",
    ])
    assert rc == 0
    report = json.load(open(report_path))
    outs = report["stages"]["generate"]["outputs"]
    assert len(outs) == 1 and os.path.exists(outs[0])

    # stage 4 against a copy of our own outputs: gates pass trivially
    ref_dir = str(tmp_path / "refs")
    os.makedirs(ref_dir)
    for o in outs:
        shutil.copy(o, ref_dir)
    rc = verify_parity.main([
        "--pretrained_model_name_or_path", ckpt,
        "--config_preset", "tiny",
        "--prompt", "a photo of a dog",
        "--num_inference_steps", "2",
        "--resolution", "16",
        "--seeds", "0",
        "--output_dir", out_dir,
        "--report", report_path,
        "--reference_outputs", ref_dir,
        "--psnr_min", "99.0",
    ])
    assert rc == 0
    report = json.load(open(report_path))
    cmp_stage = report["stages"]["compare"]
    assert cmp_stage["ok"]
    assert cmp_stage["pairs"][0]["psnr_gate"]
    assert not cmp_stage["lpips_gate_evaluated"]  # no LPIPS weights here


@pytest.mark.slow
def test_unmatched_reference_fails_gate(ckpt, tmp_path):
    """An empty reference dir (no name-matched files) must FAIL, not
    silently pass with zero comparisons."""
    ref_dir = str(tmp_path / "empty_refs")
    os.makedirs(ref_dir)
    rc = verify_parity.main([
        "--pretrained_model_name_or_path", ckpt,
        "--config_preset", "tiny",
        "--prompt", "a photo of a dog",
        "--num_inference_steps", "2",
        "--resolution", "16",
        "--seeds", "0",
        "--output_dir", str(tmp_path / "ours2"),
        "--report", str(tmp_path / "r2.json"),
        "--reference_outputs", ref_dir,
    ])
    assert rc == 1


def test_inventory_stop_without_prompt(ckpt, tmp_path):
    rc = verify_parity.main([
        "--pretrained_model_name_or_path", ckpt,
        "--config_preset", "tiny",
        "--report", str(tmp_path / "r3.json"),
    ])
    assert rc == 0
    report = json.load(open(str(tmp_path / "r3.json")))
    assert report["stages"]["inventory"]["ok"]
    assert "generate" not in report["stages"]
