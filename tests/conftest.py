"""Test configuration: run on a virtual 8-device CPU mesh.

Real TPU hardware is exercised by bench.py / the driver; unit tests use the
CPU backend with 8 virtual devices so sharding logic is testable anywhere.
Exception: RTEN_TPU_TESTS=1 keeps the real backend for tests/test_on_tpu.py.

NOTE: this environment's sitecustomize imports jax at interpreter startup
(registering the remote-TPU plugin), so setting JAX_PLATFORMS via os.environ
here is too late — use jax.config instead, which works post-import as long
as no backend has been initialized yet.
"""

import os

import jax

if not os.environ.get("RTEN_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"  # harmless if jax already imported
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the CPU backend; TPU backend was already initialized"
    )
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
