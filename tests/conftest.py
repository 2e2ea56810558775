"""Test configuration: run everything on an 8-device virtual CPU mesh.

Mirrors the reference's test strategy of exercising multi-node paths in one
process (velox/exec/tests/MultiFragmentTest.cpp:41-46): we force the JAX CPU
backend with 8 virtual devices so sharding/collective code paths compile and
run without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
