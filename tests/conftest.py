"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference has CUDA-only unit tests (SURVEY.md §4); here every test is
CPU-runnable and multi-device tests use XLA's forced host platform device
count, so CI never needs TPU hardware.

Note: the environment may force a TPU platform plugin at interpreter startup
(JAX_PLATFORMS=axon via sitecustomize); we override to CPU *after* import,
which is the supported path, and clear any pre-initialized backends so the
XLA_FLAGS device-count flag takes effect.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
except Exception:
    pass

assert jax.device_count() >= 8, (
    f"expected 8 virtual CPU devices for sharding tests, got {jax.device_count()}")
