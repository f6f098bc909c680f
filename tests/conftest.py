"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via XLA's host-platform device-count
override, replacing the reference's (nonexistent) distributed tests with real
ones that run anywhere.
"""

import os

if os.environ.get("HIERDIFF_TEST_PLATFORM", "cpu") == "cpu":
    # Force override: the environment may pin JAX_PLATFORMS to a TPU backend
    # (e.g. axon); unit tests must run on the virtual CPU mesh regardless.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

    import jax

    # The axon sitecustomize pins jax_platforms="axon,cpu" via jax.config at
    # interpreter start; env vars alone cannot override it. Force CPU here,
    # before any backend is initialized.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
else:
    # HIERDIFF_TEST_PLATFORM=native: keep the environment's real backend —
    # used by the subprocess runner in test_pallas.py so the TPU kernel
    # tests are exercised by CI instead of skipping under the CPU pin.
    # The persistent compilation cache makes repeat kernel-suite runs
    # skip the multi-minute tunnel compiles.
    import jax  # noqa: F401

    from hierdiff_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()


def pytest_collection_modifyitems(config, items):
    # HIERDIFF_CHEM_BACKEND=real (scripts/verify_chem.py): the conformance
    # suite runs against real RDKit; tests that poke fake-rdkit internals
    # (FAIL_EMBED, _explicit_hs) are meaningless there and are skipped.
    import os

    import pytest

    if os.environ.get("HIERDIFF_CHEM_BACKEND") == "real":
        skip = pytest.mark.skip(reason="fake-rdkit-internal test under real backend")
        for item in items:
            if "fake_only" in item.keywords:
                item.add_marker(skip)
