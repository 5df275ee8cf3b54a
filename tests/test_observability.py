"""Observability tests: cone tools, per-block logging, metrics sink."""
import json
import os

import numpy as np
import jax

from video_style_transfer_tpu.config import UNetConfig
from video_style_transfer_tpu.lora.surgery import insert_unziplora
from video_style_transfer_tpu.models.unet import init_unet
from video_style_transfer_tpu.utils import observability as obs


def test_cone_tools(tmp_path):
    rng = np.random.RandomState(0)
    w = rng.randn(16, 32).astype(np.float32)
    g = rng.randn(16, 32).astype(np.float32) * 1e-3
    cone = obs.cone_from_arrays(w, g)
    np.testing.assert_allclose(cone, w * g)
    sp = obs.cone_column_sparsity(cone, threshold=1e-5)
    assert sp.shape == (32,) and np.all((0 <= sp) & (sp <= 1))
    out = obs.render_cone_heatmaps({"layer_a": cone, "layer_b": cone},
                                   str(tmp_path / "cone.png"))
    assert os.path.getsize(out) > 0


def test_block_logs():
    cfg = UNetConfig.tiny()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    params, _ = insert_unziplora(params, jax.random.PRNGKey(1), rank=4)
    norms = obs.lora_norm_log(params, "content")
    merges = obs.lora_merge_log(params, "style")
    assert norms and merges
    assert any("down_blocks.1.attentions.0" in k for k in norms)
    assert all(v > 0 for v in norms.values())
    # mergers init to 1.0
    assert all(abs(v - 1.0) < 1e-6 for v in merges.values())


def test_metrics_logger(tmp_path):
    logger = obs.MetricsLogger(str(tmp_path))
    logger.log(0, {"loss": 1.5})
    logger.log(5, {"loss": 0.5, "lr": 1e-4})
    logger.close()
    lines = [json.loads(x) for x in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[0]["step"] == 0 and lines[0]["loss"] == 1.5
    assert lines[1]["lr"] == 1e-4


def test_cone_cli(tmp_path):
    rng = np.random.RandomState(1)
    w = {"l1": rng.randn(8, 16).astype(np.float32)}
    g = {"l1": rng.randn(8, 16).astype(np.float32)}
    np.savez(tmp_path / "w.npz", **w)
    np.savez(tmp_path / "g.npz", **g)
    from video_style_transfer_tpu.cli.cone_diagnostics import main
    out = main(["--weights", str(tmp_path / "w.npz"),
                "--grads", str(tmp_path / "g.npz"),
                "--output", str(tmp_path / "heat.png")])
    assert os.path.getsize(out) > 0


def test_lora_norm_l1():
    cfg = UNetConfig.tiny()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    params, _ = insert_unziplora(params, jax.random.PRNGKey(1), rank=4)
    l1 = obs.lora_norm_log(params, "content", norm="L1")
    l2 = obs.lora_norm_log(params, "content", norm="L2")
    assert set(l1) == set(l2)
    # L1 >= L2 elementwise for any matrix
    assert all(l1[k] >= l2[k] for k in l1)


def test_profiler_hooks(tmp_path):
    obs.start_profiler_trace(str(tmp_path))
    import jax.numpy as jnp
    _ = float(jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8))))
    obs.stop_profiler_trace()
    files = list(os.walk(tmp_path))
    assert any(fn for _, _, fns in files for fn in fns), "no trace written"


def test_compare_outputs_tool(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(0)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "a.png")
    noisy = np.clip(img.astype(int) + rng.randint(-3, 4, img.shape),
                    0, 255).astype(np.uint8)
    Image.fromarray(noisy).save(tmp_path / "b.png")
    from video_style_transfer_tpu.cli.compare_outputs import main
    rep = main(["--ours", str(tmp_path / "a.png"),
                "--reference", str(tmp_path / "b.png")])
    assert rep["psnr_mean"] > 35
    assert 0.8 < rep["ssim_mean"] <= 1.0
    rep_same = main(["--ours", str(tmp_path / "a.png"),
                     "--reference", str(tmp_path / "a.png")])
    assert rep_same["ssim_mean"] == 1.0


def test_metrics_logger_images(tmp_path):
    import numpy as np
    logger = obs.MetricsLogger(str(tmp_path))
    logger.log_images(3, {"validation/both":
                          np.zeros((8, 8, 3), np.uint8),
                          "validation/style":
                          np.ones((8, 8, 3), np.float32) * 0.5})
    logger.close()
    lines = [json.loads(x) for x in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[-1]["step"] == 3
    assert lines[-1]["validation_images"] == ["validation/both",
                                              "validation/style"]


def test_metrics_logger_disabled_writes_nothing(tmp_path):
    """enabled=False (non-main processes in multi-process training) must
    not create or write anything — the process-0 gating contract."""
    import os

    from video_style_transfer_tpu.utils import observability as obs

    d = str(tmp_path / "empty")
    logger = obs.MetricsLogger(d, enabled=False)
    logger.log(0, {"loss": 1.0})
    logger.log_images(0, {"img": __import__("numpy").zeros((2, 2, 3))})
    logger.close()
    assert not os.path.exists(d)
