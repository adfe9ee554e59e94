"""Test configuration: run everything on a virtual 8-device CPU mesh.

The analog of the reference's CPU compile path of the CUDA sources
(``GPUandCPU/CMakeLists.txt:35-51``): the same code, exercised on a
deterministic host backend.  Sharding tests use the 8 virtual CPU devices;
real-TPU behavior is exercised by ``bench.py`` and the driver's
compile checks.

Must set the environment before the first ``import jax`` anywhere in the
test process (the axon sitecustomize pins ``JAX_PLATFORMS=axon``).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
# The production default (512, tuned on the TPU) makes the CPU/interpret
# suite several times slower; tests run the same code at 128.  Block-size
# invariance itself is covered by the chunked/TP partition tests (results
# tie-break on global triangle id, so images are block-size independent).
os.environ.setdefault("RT_BLOCK_SIZE", "128")

import pathlib

import numpy as np
import pytest

import jax

# The axon sitecustomize may have eagerly initialized backends (on the
# remote-TPU platform, ignoring the env we just set).  Re-pin the platform
# and drop any already-created clients so the CPU backend is rebuilt with
# our XLA_FLAGS (8 virtual devices for sharding tests).
jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb

    if _xb._backends:
        _xb.backends.cache_clear() if hasattr(_xb.backends, "cache_clear") else None
        _xb._clear_backends()
except Exception:
    pass

# Persistent compile cache: keeps repeat test runs fast despite the
# environment's variable first-compile latency.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.device_count() >= 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()} — backend was "
    "initialized before conftest could configure it"
)

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def repo_root() -> pathlib.Path:
    return REPO


@pytest.fixture(scope="session")
def reference_root() -> pathlib.Path:
    if not REFERENCE.exists():
        pytest.skip("reference tree not mounted")
    return REFERENCE


@pytest.fixture(scope="session")
def sphere_mesh_path(reference_root) -> str:
    return str(reference_root / "HW1/assets/meshes/sphere.obj")


@pytest.fixture(scope="session")
def frog_mesh_path(reference_root) -> str:
    return str(reference_root / "HW1/assets/meshes/frog.obj")


def assert_images_close(ours: np.ndarray, golden: np.ndarray, max_bad_frac=2e-3,
                        max_mean=0.5, context=""):
    """Quantized-image comparison tolerant of last-ulp float divergence.

    Compares uint8 images: at most ``max_bad_frac`` of channel samples may
    differ by more than 1 step, and the mean absolute difference must stay
    under ``max_mean`` steps.
    """
    assert ours.shape == golden.shape, f"{context}: shape {ours.shape} vs {golden.shape}"
    diff = np.abs(ours.astype(np.int32) - golden.astype(np.int32))
    bad_frac = float((diff > 1).mean())
    mean = float(diff.mean())
    assert bad_frac <= max_bad_frac and mean <= max_mean, (
        f"{context}: bad_frac={bad_frac:.5f} (limit {max_bad_frac}), "
        f"mean={mean:.4f} (limit {max_mean}), max={diff.max()}"
    )
