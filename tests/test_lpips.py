"""LPIPS (models/lpips.py) tests with tiny random weights: torch-mirror
parity of the full metric, converter shape handling, metric properties,
and the compare_outputs --lpips CLI path."""
import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from video_style_transfer_tpu.models.lpips import (  # noqa: E402
    _SCALE, _SHIFT, VGG16_SLICE_CONV_IDX, convert_lpips, init_lpips,
    lpips_distance)

CH = (4, 8, 8, 8, 8)  # tiny channel plan, VGG16 conv counts per slice
NC = (2, 2, 3, 3, 3)


def _rand_sd(seed=0, channels=CH, in_ch=3):
    """Random weights in the two source naming conventions (torchvision
    features.* OIHW + lpips lin*.model.1.weight)."""
    rng = np.random.RandomState(seed)
    sd = {}
    c_in = in_ch
    for s, idxs in enumerate(VGG16_SLICE_CONV_IDX):
        for i in idxs:
            sd[f"features.{i}.weight"] = rng.randn(
                channels[s], c_in, 3, 3).astype(np.float32) * 0.2
            sd[f"features.{i}.bias"] = rng.randn(
                channels[s]).astype(np.float32) * 0.05
            c_in = channels[s]
        sd[f"lin{s}.model.1.weight"] = rng.uniform(
            0, 1, (1, channels[s], 1, 1)).astype(np.float32)
    return sd


def _torch_lpips(sd, x, y):
    """Mirror of the richzhang LPIPS v0.1 eval math in torch."""
    F = torch.nn.functional
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def feats(z):
        h = (z - shift) / scale
        out = []
        for s, idxs in enumerate(VGG16_SLICE_CONV_IDX):
            if s > 0:
                h = F.max_pool2d(h, 2)
            for i in idxs:
                h = F.relu(F.conv2d(
                    h, torch.from_numpy(sd[f"features.{i}.weight"]),
                    torch.from_numpy(sd[f"features.{i}.bias"]),
                    padding=1))
            out.append(h)
        return out

    fx, fy = feats(x), feats(y)
    total = 0.0
    for s, (a, b) in enumerate(zip(fx, fy)):
        na = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
        nb = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
        d = (na - nb) ** 2
        w = torch.from_numpy(sd[f"lin{s}.model.1.weight"])
        total = total + F.conv2d(d, w).mean(dim=(1, 2, 3))
    return total


def test_lpips_torch_parity():
    sd = _rand_sd()
    params = convert_lpips(sd)
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    y = np.clip(x + rng.randn(*x.shape).astype(np.float32) * 0.1, -1, 1)
    got = np.asarray(lpips_distance(params, jnp.asarray(x), jnp.asarray(y)))
    with torch.no_grad():
        want = _torch_lpips(sd, torch.from_numpy(x).permute(0, 3, 1, 2),
                            torch.from_numpy(y).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lpips_metric_properties():
    params = init_lpips(jax.random.PRNGKey(0), channels=CH,
                        convs_per_slice=NC)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3),
                           minval=-1, maxval=1)
    y = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3),
                           minval=-1, maxval=1)
    d_xx = np.asarray(lpips_distance(params, x, x))
    d_xy = np.asarray(lpips_distance(params, x, y))
    np.testing.assert_allclose(d_xx, 0.0, atol=1e-6)
    assert (d_xy > 0).all()
    np.testing.assert_allclose(
        d_xy, np.asarray(lpips_distance(params, y, x)), rtol=1e-6)


def test_compare_outputs_cli_lpips(tmp_path):
    from PIL import Image

    from video_style_transfer_tpu.cli.compare_outputs import main

    rng = np.random.RandomState(3)
    a = rng.randint(0, 255, (48, 48, 3), np.uint8)
    b = np.clip(a.astype(int) + rng.randint(-20, 20, a.shape), 0,
                255).astype(np.uint8)
    pa, pb = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    Image.fromarray(a).save(pa)
    Image.fromarray(b).save(pb)

    wpath = str(tmp_path / "lpips.pth")
    torch.save({k: torch.from_numpy(v) for k, v in _rand_sd().items()},
               wpath)
    out = str(tmp_path / "report.json")
    report = main(["--ours", pa, "--reference", pb, "--lpips", wpath,
                   "--json_out", out])
    assert "lpips_mean" in report and report["lpips_mean"] > 0
    assert "lpips" in report["per_frame"][0]
    assert json.load(open(out))["lpips_mean"] == report["lpips_mean"]
