"""Root pytest conftest: force tests onto an 8-device virtual CPU mesh.

Installed pytest plugins may import jax before tests/conftest.py runs, so
env vars alone are not reliable; jax.config.update works as long as no
backend has been initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
