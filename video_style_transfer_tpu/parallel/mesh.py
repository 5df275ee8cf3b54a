"""Device mesh + sharding rules.

The reference's only distribution layer is HF Accelerate DDP
(train_unziplora.py:1132-1139, SURVEY.md §2.3); the TPU-native equivalent
is a ('data', 'frame') jax.sharding.Mesh:

- stage-1 training shards the image batch over 'data'
- stage-2 training / video inference shard the frame axis over 'frame'
  (spatial layers are embarrassingly parallel over frames; temporal
  attention costs one F<=32 all-gather per pixel block on ICI)
- parameters are replicated (LoRA training state is tiny; the bf16 base
  model fits each v5e chip)

XLA inserts the psum/all-gather collectives from the sharding
annotations — there is no hand-written communication here by design.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FRAME_AXIS = "frame"
MODEL_AXIS = "model"


def create_mesh(devices: Optional[Sequence] = None, *,
                data: Optional[int] = None,
                frame: Optional[int] = None,
                model: int = 0) -> Mesh:
    """('data', 'frame') mesh — or ('data', 'frame', 'model') when a
    tensor-parallel size is given (parallel/tensor.py). With only one of
    data/frame given the other absorbs the remaining devices; default
    puts everything on 'frame' (the video-serving layout). The model
    axis is innermost so TP collectives ride the closest ICI links."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    tp = max(model, 1)
    assert n % tp == 0, (model, n)
    n_df = n // tp
    if data is None and frame is None:
        data, frame = 1, n_df
    elif data is None:
        data = n_df // frame
    elif frame is None:
        frame = n_df // data
    assert data * frame == n_df, (data, frame, model, n)
    if model:
        arr = np.asarray(devices).reshape(data, frame, tp)
        return Mesh(arr, (DATA_AXIS, FRAME_AXIS, MODEL_AXIS))
    arr = np.asarray(devices).reshape(data, frame)
    return Mesh(arr, (DATA_AXIS, FRAME_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rows(mesh: Mesh, *, frames_only: bool = False) -> NamedSharding:
    """Shard a flattened (B*F, ...) leading axis over the whole mesh (or
    only the frame axis)."""
    if frames_only:
        return NamedSharding(mesh, P(FRAME_AXIS))
    return NamedSharding(mesh, P((DATA_AXIS, FRAME_AXIS)))


def context_mesh() -> Optional[Mesh]:
    """The enclosing `with mesh:` context's physical mesh, or None.
    Lets model code adapt to a mesh without threading one through the
    functional API (single-chip callers see None and trace the exact
    single-device graph)."""
    from jax._src.mesh import thread_resources
    mesh = thread_resources.env.physical_mesh
    return None if mesh.empty else mesh


import contextlib as _contextlib
import contextvars as _contextvars

_IN_MANUAL = _contextvars.ContextVar("vst_in_manual_shardmap",
                                     default=False)


@_contextlib.contextmanager
def manual_region():
    """Marks (at trace time) that the code below already runs inside an
    explicit shard_map — rowsharded_kernel must not nest another one."""
    tok = _IN_MANUAL.set(True)
    try:
        yield
    finally:
        _IN_MANUAL.reset(tok)


def in_manual_region() -> bool:
    return _IN_MANUAL.get()


def rowsharded_kernel(fn, x, *args, n_row_args: int = 0):
    """Run row-local `fn(x, *args)` (first dim of x = independent
    batch rows, e.g. a Pallas kernel whose grid is per-row) under a
    shard_map that splits the rows of x AND of the first `n_row_args`
    extra arguments over ('data', 'frame') while replicating the rest
    (weights), when an enclosing `with mesh:` context is active.
    Identity call otherwise.

    Why: GSPMD cannot partition Pallas custom calls — under a sharded
    mesh it replicates their operands (a full all-gather per call site,
    per scan iteration for the transformer stacks; audited in
    benchmarks/collective_volume.py). Row-local kernels need no
    communication at all, so the shard_map makes each device run the
    kernel on its own rows. Skipped when: no mesh; already inside an
    explicit shard_map (nesting); a tensor-parallel 'model' axis is
    active (its weights are sharded, P() would gather them); or rows
    don't divide the mesh."""
    from jax import shard_map

    mesh = context_mesh()
    if mesh is None or in_manual_region():
        return fn(x, *args)
    if mesh.shape.get("model", 1) != 1:
        return fn(x, *args)
    d = mesh.shape.get("data", 1) * mesh.shape.get("frame", 1)
    if d <= 1 or x.shape[0] % d:
        return fn(x, *args)
    rows = tuple(a for a in ("data", "frame") if a in mesh.shape)
    spec = P(rows)

    def local(x_, *a):
        with manual_region():
            return fn(x_, *a)

    # check_vma=False: Pallas out_shapes carry no varying-mesh-axes
    # annotation (see models/motion.py)
    in_specs = ((spec,) + (spec,) * n_row_args
                + (P(),) * (len(args) - n_row_args))
    return shard_map(local, mesh=mesh, in_specs=in_specs,
                     out_specs=spec, check_vma=False)(x, *args)


def make_global_array(mesh: Mesh, spec: P, arr):
    """Host array (identical on every process) -> sharded global
    jax.Array. `jax.device_put` with a NamedSharding only accepts
    addressable devices, so multi-process trainers build global batches
    through `make_array_from_callback`: every process holds the full
    host batch (deterministic from the step seed) and contributes its
    local shards. Single-process this is equivalent to device_put."""
    arr = np.asarray(arr)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def shard_batch_tree(mesh: Mesh, batch, spec_of):
    """Shard every array leaf of a (possibly nested-dict) batch built
    identically on all processes. ``spec_of(key, ndim)`` returns the
    PartitionSpec for a leaf under dict key `key`."""
    def walk(node, key):
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        return make_global_array(mesh, spec_of(key, np.ndim(node)), node)
    return walk(batch, None)


def context_constraint(x, *spec):
    """`lax.with_sharding_constraint(x, P(*spec))` iff an enclosing
    `with mesh:` context defines every named axis and their product is
    > 1; identity otherwise. Model code calls this to pin the layout at
    reshard points (the motion modules' frame<->pixel transition)
    without threading a mesh through the functional API — single-chip
    traces are bit-identical because the call is a no-op there.

    Why it exists: GSPMD's default solution for the temporal-attention
    cross-frame dependency under frame sharding is to ALL-GATHER the
    full activation at every motion module (audited at 109 GB of
    collectives per 16-frame UNet call, ~2.1 s of ICI on v5e-8 —
    benchmarks/collective_volume.py), erasing the frame-parallel
    speedup. Pinning the module interior to pixel sharding turns the
    transition into a pair of all-to-alls moving ~1/n of the activation
    per device."""
    from jax._src.mesh import thread_resources
    mesh = thread_resources.env.physical_mesh
    if mesh.empty:
        return x
    names = [n for e in spec if e is not None
             for n in ((e,) if isinstance(e, str) else e)]
    if not all(n in mesh.shape for n in names):
        return x
    if int(np.prod([mesh.shape[n] for n in names])) <= 1:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
