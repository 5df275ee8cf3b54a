"""Tensor parallelism (parallel/tensor.py): TP-sharded UNet forward
matches the replicated forward on the virtual 8-device CPU mesh.

The reference has no TP (SURVEY.md §2.3); this is optional capability —
Megatron column/row sharding of the spatial transformer weights over a
'model' mesh axis, collectives inserted by GSPMD."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from video_style_transfer_tpu.config import UNetConfig
from video_style_transfer_tpu.models.unet import init_unet, unet_apply
from video_style_transfer_tpu.parallel.mesh import create_mesh
from video_style_transfer_tpu.parallel.tensor import (
    shard_params_tp, tp_spec, tp_spec_tree)


def _inputs(cfg, batch=4):
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    lat = jax.random.normal(ks[0], (batch, 8, 8, cfg.in_channels))
    t = jnp.full((batch,), 7.0)
    ctx = jax.random.normal(ks[1], (batch, 7, cfg.cross_attention_dim))
    pooled = jax.random.normal(ks[2], (batch, 32))
    tids = jnp.tile(jnp.asarray([[16, 16, 0, 0, 16, 16]], jnp.float32),
                    (batch, 1))
    return lat, t, ctx, pooled, tids


def test_spec_tree_shapes():
    cfg = UNetConfig.tiny()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    specs = tp_spec_tree(params)
    # stacked transformer-block leaves: (L, C, H*D) kernels
    blk = params["up_blocks"][0]["attentions"][0]["transformer_blocks"]
    sblk = specs["up_blocks"][0]["attentions"][0]["transformer_blocks"]
    assert sblk["attn1"]["to_q"]["kernel"] == P(None, None, "model")
    assert sblk["attn1"]["to_out"]["kernel"] == P(None, "model", None)
    assert sblk["attn1"]["to_out"]["bias"] == P()
    assert sblk["ff"]["proj"]["kernel"] == P(None, None, "model")
    assert sblk["ff"]["out"]["kernel"] == P(None, "model", None)
    assert sblk["norm1"]["scale"] == P()
    # non-attention leaves replicated
    assert specs["conv_in"]["kernel"] == P()
    assert specs["mid_block"]["resnets"][0]["conv1"]["kernel"] == P()
    del blk


def test_motion_and_lora_leaves_replicated():
    from video_style_transfer_tpu.lora.surgery import insert_unziplora
    cfg = UNetConfig.tiny(use_motion_modules=True)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    params, _ = insert_unziplora(params, jax.random.PRNGKey(1), rank=4)
    specs = tp_spec_tree(params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    for path, spec in flat:
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "motion_modules" in keys or "lora" in keys:
            assert spec == P(), (keys, spec)


@pytest.mark.parametrize("model_size", [2, 4])
def test_tp_forward_matches_replicated(model_size):
    cfg = UNetConfig.tiny()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    args = _inputs(cfg)

    ref = unet_apply(params, cfg, args[0], args[1], (args[2], None, None),
                     args[3], args[4], mode="base")

    devices = jax.devices()[:8]
    mesh = create_mesh(devices, data=8 // model_size, frame=1,
                       model=model_size)
    assert dict(mesh.shape)["model"] == model_size
    p_tp = shard_params_tp(params, mesh)
    lat = jax.device_put(args[0], NamedSharding(mesh, P("data")))

    def fwd(p, lat, t, ctx, pooled, tids):
        return unet_apply(p, cfg, lat, t, (ctx, None, None), pooled, tids,
                          mode="base")

    with mesh:
        out = jax.jit(fwd)(p_tp, lat, *args[1:])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_tp_with_unziplora_mode_both():
    """LoRA branches stay replicated; TP forward still matches."""
    from video_style_transfer_tpu.lora.surgery import insert_unziplora
    cfg = UNetConfig.tiny()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    params, state = insert_unziplora(params, jax.random.PRNGKey(1), rank=4)
    args = _inputs(cfg)

    ref = unet_apply(params, cfg, args[0], args[1],
                     (args[2], args[2], args[2]), args[3], args[4],
                     mode="both", state=state)

    mesh = create_mesh(jax.devices()[:8], data=2, frame=1, model=4)
    p_tp = shard_params_tp(params, mesh)

    def fwd(p, lat, t, ctx, pooled, tids):
        return unet_apply(p, cfg, lat, t, (ctx, ctx, ctx), pooled, tids,
                          mode="both", state=state)

    with mesh:
        out = jax.jit(fwd)(p_tp, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.e2e
def test_infer_cli_tp_smoke(tmp_path):
    """--tp 2 shards the smoke model over the virtual mesh and still
    writes an image."""
    from video_style_transfer_tpu.cli.infer import main as infer
    outs = infer(["--smoke", "--prompt", "a sbu dog in szn style",
                  "--mode", "both", "--tp", "2", "--seeds", "0",
                  "--output_dir", str(tmp_path)])
    assert len(outs) == 1
    import os
    assert os.path.exists(outs[0])


def test_tp_spec_rule_unstacked_leaf():
    """Axis indexing is from the right, so unstacked 2D kernels get the
    same split."""
    import collections
    DictKey = jax.tree_util.DictKey
    path = (DictKey("down_blocks"), jax.tree_util.SequenceKey(1),
            DictKey("attentions"), jax.tree_util.SequenceKey(0),
            DictKey("transformer_blocks"), DictKey("attn2"),
            DictKey("to_k"), DictKey("kernel"))
    leaf = collections.namedtuple("L", "ndim")(2)
    assert tp_spec(path, leaf) == P(None, "model")
    del collections
