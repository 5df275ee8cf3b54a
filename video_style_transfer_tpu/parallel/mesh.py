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


def create_mesh(devices: Optional[Sequence] = None, *,
                data: Optional[int] = None,
                frame: Optional[int] = None) -> Mesh:
    """('data', 'frame') mesh. With only one size given the other axis
    absorbs the remaining devices; default puts everything on 'frame'
    (the video-serving layout)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None and frame is None:
        data, frame = 1, n
    elif data is None:
        data = n // frame
    elif frame is None:
        frame = n // data
    assert data * frame == n, (data, frame, n)
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
