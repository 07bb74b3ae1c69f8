"""Test configuration: run on CPU with 8 virtual devices and float64 enabled.

Must run before jax initialises a backend, hence the env mutation at import
time. TPU-only tests opt back in via the ``requires_tpu`` marker and a
separate process (see benchmarks/).
"""
import os

# Force CPU with 8 virtual devices (the ambient environment pins
# JAX_PLATFORMS to the TPU platform; tests must override it, not default it).
# Set SIGKERNEL_TEST_TPU=1 to run the suite on the real chip instead.
if not os.environ.get("SIGKERNEL_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("SIGKERNEL_TEST_TPU"):
    # the ambient sitecustomize registers the TPU plugin through jax.config
    # (overriding JAX_PLATFORMS); undo it here.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_paths(rng, batch, length, dim, dtype=np.float64, scale=0.3):
    """Smooth-ish random paths (cumsum of small increments)."""
    steps = rng.normal(size=(batch, length, dim)) * scale / np.sqrt(length)
    return np.cumsum(steps, axis=1).astype(dtype)


@pytest.fixture
def paths():
    return make_paths


# ---------------------------------------------------------------------------
# fast / slow split: `pytest -m fast` is the < 5 min iteration gate; the
# full suite (no -m) stays the round gate. Slow = interpret-mode Pallas
# kernels (each step simulated in Python), 8-device shard_map tests, and
# subprocess-spawning bench smoke tests.
# ---------------------------------------------------------------------------

_SLOW_FILES = {
    "test_pallas.py", "test_pallas_adjoint.py", "test_pallas_blocked.py",
    "test_pallas_ckpt.py", "test_pallas_derivatives.py",
    "test_pallas_df64.py", "test_pallas_fused.py", "test_pallas_gen32.py",
    "test_gen_df_adjoint.py", "test_routes.py", "test_sharding.py",
    "test_bench_smoke.py", "test_uea_cross_impl.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in _SLOW_FILES or item.get_closest_marker("slow"):
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)
