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

    if pid == 0:
        leaves = jax.tree.leaves(new_state.params)
        np.savez(out_path, loss=np.float64(loss),
                 n_leaves=len(leaves),
                 **{f"leaf_{i}": np.asarray(a)
                    for i, a in enumerate(leaves)})
    print(f"worker {pid}: psum ok, step loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
