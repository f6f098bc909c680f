"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via XLA's host-platform device-count
override, replacing the reference's (nonexistent) distributed tests with real
ones that run anywhere.
"""

import os

# Force override: the environment may pin JAX_PLATFORMS to a TPU backend
# (e.g. axon); unit tests must run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms="axon,cpu" via jax.config at
# interpreter start; env vars alone cannot override it. Force CPU here,
# before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
