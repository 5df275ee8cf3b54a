"""Explicit frame-parallel motion module (models/motion.py shard_map
path): forward and gradient parity against the single-device path, on
the forced 8-device CPU mesh.

Why this path exists: GSPMD cannot partition the motion modules'
(B,F,HW,C)->(F,B,HW,C) chunk shuffle under frame sharding — its
spmd_partitioner falls back to "involuntary full rematerialization"
(replicate), i.e. a full-activation all-gather at every module, audited
at 109 GB of collectives per 16-frame SDXL UNet call
(benchmarks/collective_volume.py). The shard_map path exchanges
frame-shard <-> pixel-shard with one all-to-all pair per module and
psums the GroupNorm statistics.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from video_style_transfer_tpu.models.motion import (init_motion_module,
                                                    motion_module)
from video_style_transfer_tpu.parallel.mesh import create_mesh


def _mk(b, f, h, w, c, heads=2, layers=1, seed=0):
    p = init_motion_module(jax.random.PRNGKey(seed), c, num_layers=layers,
                           heads=heads)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (b * f, h, w, c),
                          jnp.float32)
    return p, x


def _run(p, x, f, mesh=None, shard_spec=None, remat=False):
    def fn(p, x):
        return motion_module(p, x, num_frames=f, heads=2,
                             norm_num_groups=4, remat=remat)
    if mesh is None:
        return jax.jit(fn)(p, x)
    xs = jax.device_put(x, NamedSharding(mesh, shard_spec))
    with mesh:
        out = jax.jit(fn)(p, xs)
    return out


@pytest.mark.parametrize("data,frame,b,f", [
    (1, 8, 2, 16),   # serving layout: CFG pair, every device on 'frame'
    (2, 4, 2, 8),    # stage-2 training layout
])
def test_sharded_matches_local(data, frame, b, f):
    p, x = _mk(b, f, h=4, w=8, c=16)
    want = np.asarray(_run(p, x, f))
    mesh = create_mesh(jax.devices()[:8], data=data, frame=frame)
    got = np.asarray(_run(p, x, f, mesh, P(("data", "frame"))))
    # GN stats sum in a different (two-pass, psum) order; everything
    # else is the same math on the same values
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sharded_grad_matches_local():
    b, f = 2, 8
    p, x = _mk(b, f, h=4, w=8, c=16)

    def loss(p, x):
        y = motion_module(p, x, num_frames=f, heads=2, norm_num_groups=4,
                          remat=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    lw, gw = jax.value_and_grad(loss)(p, x)
    mesh = create_mesh(jax.devices()[:8], data=2, frame=4)
    xs = jax.device_put(x, NamedSharding(mesh, P(("data", "frame"))))
    with mesh:
        ls, gs = jax.jit(jax.value_and_grad(loss))(p, xs)
    np.testing.assert_allclose(float(ls), float(lw), rtol=1e-5)
    for a, bb in zip(jax.tree.leaves(gw), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   rtol=3e-4, atol=3e-4)


def test_uneven_frames_take_fallback():
    """F=12 on an 8-way frame mesh is non-divisible: the dispatch must
    fall back to the GSPMD path and still match the local result. The
    12-row input can't be device_put 8-way, so it enters replicated and
    GSPMD reshards at the fallback's interior constraint (the
    production pipelines constrain inside jit, where GSPMD pads)."""
    b, f = 1, 12
    p, x = _mk(b, f, h=4, w=8, c=16)
    want = np.asarray(_run(p, x, f))
    mesh = create_mesh(jax.devices()[:8])  # all 'frame'
    got = np.asarray(_run(p, x, f, mesh, P()))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_rowsharded_flash_matches_local():
    """The row-sharding shard_map wrapper around the Pallas flash
    kernel (parallel/mesh.rowsharded_kernel; GSPMD would replicate the
    custom call otherwise): forward and gradient parity vs the same
    kernel without a mesh. Forced impl='pallas' — the tiny mesh-test
    shapes otherwise route to the XLA path and never cover this."""
    from video_style_transfer_tpu.ops.attention import (merge_heads, sdpa,
                                                        split_heads)

    q = jax.random.normal(jax.random.PRNGKey(0), (8, 256, 2, 64),
                          jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (8, 256, 2, 64),
                          jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (8, 256, 2, 64),
                          jnp.float32)

    def loss(q, k, v):
        return jnp.sum(sdpa(q, k, v, impl="pallas") ** 2)

    lw, gw = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
    mesh = create_mesh(jax.devices()[:8])
    qs = jax.device_put(q, NamedSharding(mesh, P(("data", "frame"))))
    with mesh:
        ls, gs = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))(
            qs, k, v)
    np.testing.assert_allclose(float(ls), float(lw), rtol=1e-5)
    for a, b in zip(gw, gs):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)
    del merge_heads, split_heads


def test_rowsharded_geglu_matches_local():
    """feed_forward's GEGLU Pallas kernel under the row-sharding
    wrapper: forward + grad parity vs no mesh."""
    from video_style_transfer_tpu.models.attention import (
        feed_forward, init_feed_forward)

    p = init_feed_forward(jax.random.PRNGKey(0), 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 64), jnp.float32)

    def loss(p, x):
        return jnp.sum(feed_forward(p, x) ** 2)

    lw, gw = jax.value_and_grad(loss)(p, x)
    mesh = create_mesh(jax.devices()[:8])
    xs = jax.device_put(x, NamedSharding(mesh, P(("data", "frame"))))
    with mesh:
        ls, gs = jax.jit(jax.value_and_grad(loss))(p, xs)
    np.testing.assert_allclose(float(ls), float(lw), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gw), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


def test_no_mesh_unchanged():
    """Without a mesh context the dispatch takes the local path (the
    sharded helper must not activate from stale state)."""
    from video_style_transfer_tpu.models.motion import _sharded_mesh_info
    assert _sharded_mesh_info(2, 16, 64) is None
