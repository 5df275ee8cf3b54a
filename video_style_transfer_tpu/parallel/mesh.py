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
