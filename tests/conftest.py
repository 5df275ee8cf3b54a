"""Test config: force an 8-device virtual CPU mesh (the TPU answer to
multi-device testing without a pod, SURVEY.md §4).

The container's sitecustomize registers the TPU ('axon') PJRT plugin and
sets jax_platforms via jax.config.update at interpreter startup, which
overrides JAX_PLATFORMS env vars — so we must update the config again here
(conftest imports before any test module touches a backend).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
