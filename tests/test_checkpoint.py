"""Checkpoint/resume + artifact export tests (the reference never
implemented resume — SURVEY.md §5 requires it here)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_style_transfer_tpu.config import UNetConfig
from video_style_transfer_tpu.lora.surgery import (
    insert_temporal_lora, insert_unziplora, iter_motion_attention_paths,
    tree_get)
from video_style_transfer_tpu.models.unet import init_unet
from video_style_transfer_tpu.utils import checkpoint as ckpt


def test_save_restore_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.asarray(7)}
    p = ckpt.save_checkpoint(str(tmp_path), state, 7)
    assert ckpt.latest_checkpoint(str(tmp_path)) == p
    restored = ckpt.restore_checkpoint(
        p, jax.tree.map(lambda a: jnp.zeros_like(a), state))
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(restored["step"]) == 7


def test_rotation(tmp_path):
    state = {"x": jnp.zeros(2)}
    for step in (1, 2, 3):
        ckpt.save_checkpoint(str(tmp_path), state, step, total_limit=2)
    names = sorted(os.listdir(tmp_path))
    assert "checkpoint-1" not in names
    assert "checkpoint-2" in names and "checkpoint-3" in names


def test_kill_mid_save_never_loses_the_only_checkpoint(tmp_path,
                                                       monkeypatch):
    """Preemption safety (SURVEY §5 'preemption-safe saves'): a save
    that dies mid-write must leave the previous good checkpoint on disk
    and restorable, even at total_limit=1 — rotation only prunes AFTER
    the new checkpoint is committed."""
    state = {"x": jnp.arange(3.0)}
    ckpt.save_checkpoint(str(tmp_path), state, 1, total_limit=1)

    class Boom(RuntimeError):
        pass

    class DyingCkptr:
        def save(self, path, s):
            # what a kill leaves behind: orbax's uncommitted tmp dir
            # (the atomic rename to `checkpoint-<step>` never happened)
            os.makedirs(path + ".orbax-checkpoint-tmp-1700000000")
            raise Boom()

        def wait_until_finished(self):
            pass

    monkeypatch.setattr(ckpt, "_ckptr", DyingCkptr)
    with pytest.raises(Boom):
        ckpt.save_checkpoint(str(tmp_path), state, 2, total_limit=1)
    monkeypatch.undo()

    latest = ckpt.latest_checkpoint(str(tmp_path))
    assert latest is not None and latest.endswith("checkpoint-1")
    restored = ckpt.restore_checkpoint(
        latest, {"x": jnp.zeros(3)})
    np.testing.assert_array_equal(np.asarray(restored["x"]),
                                  np.arange(3.0))


def test_latest_checkpoint_skips_uncommitted_tmp_dirs(tmp_path):
    """A process killed mid-save leaves `checkpoint-N.orbax-...-tmp-*`;
    resume must pick the newest COMMITTED checkpoint, not the corpse."""
    state = {"x": jnp.arange(2.0)}
    good = ckpt.save_checkpoint(str(tmp_path), state, 5)
    os.makedirs(os.path.join(
        str(tmp_path), "checkpoint-9.orbax-checkpoint-tmp-1700000001"))
    assert ckpt.latest_checkpoint(str(tmp_path)) == good


@pytest.mark.slow
def test_stage1_artifacts(tmp_path):
    cfg = UNetConfig.tiny()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    params, state = insert_unziplora(params, jax.random.PRNGKey(1), rank=4)
    paths = ckpt.export_stage1_artifacts(str(tmp_path), "horse", params,
                                         state)
    for k in ("content", "style", "merger_content", "merger_style"):
        assert os.path.exists(paths[k]), k
    from video_style_transfer_tpu.lora.interop import (
        load_merger_pth, load_safetensors)
    sd = load_safetensors(paths["content"])
    assert all(k.startswith("unet.") for k in sd)
    m = load_merger_pth(paths["merger_content"])
    assert all(k.endswith(".lora.merge_content") for k in m)


def test_motion_checkpoint_folds_tlora(tmp_path):
    cfg = UNetConfig.tiny(use_motion_modules=True)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    params = insert_temporal_lora(params, jax.random.PRNGKey(1), rank=4)
    # make the delta nonzero
    apath = next(iter_motion_attention_paths(params))
    from video_style_transfer_tpu.lora.surgery import tree_set
    tl = tree_get(params, apath + ("to_q", "tlora"))
    tl = dict(tl, b=jnp.ones_like(tl["b"]) * 0.1)
    params = tree_set(params, apath + ("to_q", "tlora"), tl)

    out = str(tmp_path / "motion_modules.safetensors")
    sd = ckpt.export_motion_checkpoint(out, params)
    assert os.path.exists(out)
    assert all("motion_modules" in k for k in sd)
    # folded kernel == base + a@b*scale
    base = np.asarray(tree_get(params, apath + ("to_q", "kernel")))[0]
    a = np.asarray(tl["a"])[0]
    b = np.asarray(tl["b"])[0]
    scale = float(np.asarray(tl["scale"])[0])
    want = base + (a @ b) * scale
    key = [k for k in sd
           if "motion_modules" in k and k.endswith("attn1.to_q.weight")][0]
    np.testing.assert_allclose(np.asarray(sd[key]).T, want, rtol=1e-5,
                               atol=1e-6)
