"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4: XLA_FLAGS device-count fakes).
x64 is enabled so the pipeline's explicit float64 casts (the reference computes
atan2 in f64, lib.rs:715/869-871) are real f64 on the test backend; all other
dtypes are pinned to f32 in the library itself.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU backend and forces
# jax_platforms="axon,cpu"; tests must run on the virtual 8-device CPU mesh,
# so re-force cpu AFTER the jax import (env vars alone are overridden).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables():
    """Free each module's compiled executables when it finishes: the XLA:CPU
    compiler (LLVM) segfaults once a process accumulates the full tier's
    worth of large compiled Pallas interpret programs (see pytest.ini)."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def reference_root():
    import os

    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not available")
    return REFERENCE_ROOT


@pytest.fixture(scope="session")
def bird_small(reference_root):
    from sift_features_tpu.io.image import load_gray

    return load_gray(f"{reference_root}/images/bird_small.jpg", "image-crate")


@pytest.fixture(scope="session")
def bird_small_cv2(reference_root):
    from sift_features_tpu.io.image import load_gray

    return load_gray(f"{reference_root}/images/bird_small.jpg", "cv2")


@pytest.fixture(scope="session")
def bird_small_golden(reference_root):
    """bird_small decoded with the PINNED golden-test variant (float DCT +
    fancy upsampling + BT.709-trunc; tools/decoder_sweep.py)."""
    from sift_features_tpu.io.image import load_gray

    return load_gray(f"{reference_root}/images/bird_small.jpg", "golden")


@pytest.fixture(scope="session")
def tree_small_golden(reference_root):
    from sift_features_tpu.io.image import load_gray

    return load_gray(f"{reference_root}/images/tree_small.jpg", "golden")
