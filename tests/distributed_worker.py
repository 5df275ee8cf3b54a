"""Worker program for the REAL 2-process jax.distributed test
(tests/test_distributed.py::test_two_process_cpu_training_step).

Each process runs this file with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set; init_distributed then performs
a genuine jax.distributed.initialize over localhost gRPC — the TPU
equivalent of the reference's Accelerate process-group init
(train_unziplora.py:1129-1139; launched multi-process by
accelerate launch, train.sh:44). With
--xla_force_host_platform_device_count=4 per process the global CPU
mesh spans 8 devices across the 2 processes, so the 'data'-axis
collectives in the checks below genuinely cross a process boundary.

Checks executed (every process must pass them; process 0 additionally
dumps the train-step result for the parent's single-process parity
compare):
  1. global device count == 8, local == 4
  2. cross-process reduction: sum of a 'data'-sharded arange == 28
  3. one stage-1 DP train step over the global mesh, batch rows sharded
     across both processes

The model/batch builders live here so the pytest parent imports THIS
module and computes the single-process reference from byte-identical
inputs.
"""
import os
import sys

import numpy as np

# the package is used from the repo root, not installed; subprocesses
# don't inherit pytest's rootdir path insertion
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_problem():
    """Deterministic tiny stage-1 training problem (same recipe as
    __graft_entry__.dryrun_multichip's stage-1 leg)."""
    import jax
    import jax.numpy as jnp

    from video_style_transfer_tpu.config import UNetConfig
    from video_style_transfer_tpu.lora.surgery import (
        insert_unziplora, layer_assignments)
    from video_style_transfer_tpu.models.unet import init_unet
    from video_style_transfer_tpu.schedulers.ddpm import make_schedule
    from video_style_transfer_tpu.training import stage1

    cfg = UNetConfig.tiny()
    p, ls = insert_unziplora(init_unet(jax.random.PRNGKey(7), cfg),
                             jax.random.PRNGKey(8), rank=4)
    assignments = layer_assignments(p, {}, {}, layers_per_block=1)
    sep = stage1.ColumnSepConfig(enabled=True, max_steps=8, sample_times=2,
                                 steps_per_epoch=1, column_ratio=0.25)
    opt = stage1.make_optimizer(p, total_steps=8)
    sched = make_schedule(num_train_timesteps=50)
    step = stage1.make_train_step(cfg, sched, opt, sep_cfg=sep,
                                  assignments=assignments, remat=False,
                                  mask=stage1.trainable_mask(p))
    state = stage1.init_state(p, ls, opt)

    bsz, d = 8, cfg.cross_attention_dim
    batch = {
        "latents": np.asarray(jax.random.normal(
            jax.random.PRNGKey(9), (bsz, 8, 8, 4))),
        "ctx": np.asarray(jax.random.normal(
            jax.random.PRNGKey(10), (bsz, 7, d))),
        "ctx_content": np.asarray(jax.random.normal(
            jax.random.PRNGKey(11), (bsz, 7, d))),
        "ctx_style": np.asarray(jax.random.normal(
            jax.random.PRNGKey(12), (bsz, 7, d))),
        "pooled": np.asarray(jax.random.normal(
            jax.random.PRNGKey(13), (bsz, 32))),
        "time_ids": np.tile(np.asarray([[16, 16, 0, 0, 16, 16]],
                                       np.float32), (bsz, 1)),
    }
    return step, state, batch


def build_serving_problem():
    """Deterministic tiny frame-parallel serving problem (motion UNet +
    UnZipLoRA state + VAE): shared by the worker and the pytest parent
    so the single-process reference decodes byte-identical inputs."""
    import jax

    from video_style_transfer_tpu.config import UNetConfig, VAEConfig
    from video_style_transfer_tpu.lora.surgery import insert_unziplora
    from video_style_transfer_tpu.models.unet import init_unet
    from video_style_transfer_tpu.models.vae import init_vae
    from video_style_transfer_tpu.pipelines.image import default_time_ids
    from video_style_transfer_tpu.pipelines.sampling import Conditioning

    cfg = UNetConfig.tiny(use_motion_modules=True)
    params, state = insert_unziplora(
        init_unet(jax.random.PRNGKey(20), cfg), jax.random.PRNGKey(21),
        rank=4)
    vcfg = VAEConfig.tiny()
    vae = init_vae(jax.random.PRNGKey(22), vcfg)
    d = cfg.cross_attention_dim

    def cond_of(seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), 2)
        return Conditioning(
            ctx=(jax.random.normal(ks[0], (1, 7, d)), None, None),
            pooled=jax.random.normal(ks[1], (1, 32)),
            time_ids=default_time_ids(16, 16, 1))

    return cfg, params, state, vcfg, vae, cond_of(23), cond_of(24)


def main(out_path: str):
    import jax

    # the container sitecustomize force-registers the TPU plugin via
    # jax.config.update; pin CPU before ANY backend query
    jax.config.update("jax_platforms", "cpu")

    from video_style_transfer_tpu.parallel.distributed import \
        init_distributed

    assert init_distributed() is True, "topology env vars not picked up"
    pid = jax.process_index()
    assert jax.process_count() == 2, jax.process_count()

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 8, f"global devices {len(devs)}"
    assert len(jax.local_devices()) == 4, "local devices"

    mesh = Mesh(np.asarray(devs), ("data",))
    row = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    # --- 2. cross-process psum: the 'data' axis spans both processes,
    # so this reduction's partial sums meet over the gRPC transport ---
    x = jax.make_array_from_callback(
        (8,), row, lambda idx: np.arange(8.0, dtype=np.float32)[idx])
    total = jax.jit(jnp.sum, out_shardings=rep)(x)
    np.testing.assert_allclose(np.asarray(total), 28.0)

    # --- 3. one DP train step, batch rows sharded over the mesh ---
    step, state, batch = build_problem()
    gbatch = {
        k: jax.make_array_from_callback(
            v.shape, row, lambda idx, v=v: v[idx])
        for k, v in batch.items()
    }
    state = jax.device_put(state, rep)
    with mesh:
        new_state, metrics = jax.jit(step)(state, gbatch,
                                           jax.random.PRNGKey(14))
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss

    # --- 4. frame-parallel SERVING across processes: the production
    # video layout (all devices on 'frame') with the global mesh
    # spanning both processes, so the motion module's frame-exchange
    # all-to-all and the GN stat psums genuinely cross the gRPC
    # transport. The shard_map motion path must dispatch (asserted via
    # spy) — this is the multi-host half of the serving claim the
    # single-process CPU-mesh tests can't cover. ---
    from video_style_transfer_tpu.models import motion as mmotion
    from video_style_transfer_tpu.pipelines.video import (
        decode_video_frame_sharded, generate_video_latents)

    scfg, up, ls, vcfg, vp, uncond, cond = build_serving_problem()
    fmesh = Mesh(np.asarray(devs).reshape(1, 8), ("data", "frame"))
    rep_f = NamedSharding(fmesh, P())
    up_g = jax.device_put(up, rep_f)
    vp_g = jax.device_put(vp, rep_f)

    def serve(unet_p, vae_p, key):
        lat = generate_video_latents(
            unet_p, scfg, uncond, cond, key, num_frames=8, height=16,
            width=16, num_steps=2, mode="both", state=ls,
            dtype=jnp.float32, vae_scale_factor=2)
        lat = jax.lax.with_sharding_constraint(
            lat, NamedSharding(fmesh, P("frame")))
        return decode_video_frame_sharded(vae_p, vcfg, lat, fmesh)

    hits = []
    orig_info = mmotion._sharded_mesh_info

    def spy(b, nf, hw):
        r = orig_info(b, nf, hw)
        hits.append(r is not None)
        return r

    mmotion._sharded_mesh_info = spy
    try:
        with fmesh:
            frames = jax.jit(serve, out_shardings=rep_f)(
                up_g, vp_g, jax.random.PRNGKey(25))
            frames.block_until_ready()
    finally:
        mmotion._sharded_mesh_info = orig_info
    assert any(hits), "shard_map motion path never dispatched"
    assert frames.shape == (8, 16, 16, 3), frames.shape
    frames_np = np.asarray(frames)  # fully replicated -> local fetch

    if pid == 0:
        leaves = jax.tree.leaves(new_state.params)
        np.savez(out_path, loss=np.float64(loss),
                 n_leaves=len(leaves), frames=frames_np,
                 **{f"leaf_{i}": np.asarray(a)
                    for i, a in enumerate(leaves)})
    print(f"worker {pid}: psum ok, step loss={loss:.6f}, "
          f"serving frames {frames_np.shape}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
