"""Shared bits for the Pallas kernels."""
from __future__ import annotations

import os

import jax

# exp(x) == exp2(x * LOG2E); exp2 is the VPU-native transcendental, so
# softmax math runs in base 2 and converts back only at boundaries
LOG2E = 1.4426950408889634


def should_interpret() -> bool:
    """Kernels run in pallas interpreter mode off-TPU (the CPU test mesh)
    or when VST_FLASH_INTERPRET=1 forces it for debugging."""
    return jax.default_backend() != "tpu" or \
        os.environ.get("VST_FLASH_INTERPRET") == "1"
