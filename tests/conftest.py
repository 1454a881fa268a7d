"""Test environment: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests run over
``--xla_force_host_platform_device_count=8`` virtual CPU devices (the
standard JAX single-host multi-device simulation).

Note: this environment pre-registers a TPU ('axon') PJRT backend from a
sitecustomize hook *before* any env var we set here can take effect, so
the platform must be overridden through jax.config after import (backends
initialize lazily, so the XLA flag below still lands in time).
"""
import os

ON_TPU = bool(os.environ.get("EKF_VIO_TESTS_ON_TPU"))

if not ON_TPU:
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

if not ON_TPU:
    assert jax.devices()[0].platform == "cpu", jax.devices()
