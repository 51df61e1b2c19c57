"""Pyramid construction: JAX vs NumPy twin (bit-level) and vs OpenCV (ULP)."""

import numpy as np
import pytest
import jax.numpy as jnp

from sift_features_tpu.config import DEFAULT_CONFIG as CFG
from sift_features_tpu.ops import gaussian, pyramid, resize
from sift_features_tpu.oracle import oracle
from sift_features_tpu.oracle.processing import NumpyProcessing


pytestmark = pytest.mark.smoke


def test_kernel_matches_cv2():
    import cv2

    for sigma in [1.2489995996796797] + [s for s in CFG.octave_sigmas()[1:]]:
        ks = gaussian.cv_ksize(sigma)
        ours = gaussian.gaussian_kernel(sigma, ks)
        cv = cv2.getGaussianKernel(ks, sigma, cv2.CV_32F).ravel()
        np.testing.assert_allclose(ours, cv, atol=4e-9)


def test_blur_matches_cv2_ulp(bird_small_cv2):
    import cv2

    img = (bird_small_cv2[:96, :128].astype(np.float32)) / np.float32(255.0)
    for sigma in (1.2489995996796797, 2.01, 3.1):
        ours = np.asarray(gaussian.gaussian_blur(jnp.asarray(img), sigma))
        cv = cv2.GaussianBlur(img, (0, 0), sigma)
        assert np.abs(ours - cv).max() < 1e-6


def test_blur_tiny_images():
    """Reflect-101 must iterate for kernels larger than the image (top
    pyramid octaves are 3x5 pixels with ksize 25)."""
    import cv2

    rng = np.random.RandomState(0)
    for shape in [(3, 5), (1, 7), (5, 3), (2, 2)]:
        img = rng.rand(*shape).astype(np.float32)
        for sigma in (1.2489995996796797, 3.09):
            ours = np.asarray(gaussian.gaussian_blur(jnp.asarray(img), sigma))
            cv = cv2.GaussianBlur(img, (0, 0), sigma)
            assert np.abs(ours - cv).max() < 1e-6, (shape, sigma)


def test_resize_linear_matches_cv2(bird_small_cv2):
    import cv2

    img = bird_small_cv2.astype(np.float32) / np.float32(255.0)
    h, w = img.shape
    ours = np.asarray(resize.resize_linear(jnp.asarray(img), h * 2, w * 2))
    cv = cv2.resize(img, (w * 2, h * 2), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours - cv).max() < 3e-7


def test_nearest_half_matches_cv2(bird_small_cv2):
    import cv2

    img = bird_small_cv2.astype(np.float32)
    h, w = img.shape
    ours = np.asarray(resize.resize_nearest_half(jnp.asarray(img)))
    cv = cv2.resize(img, (w // 2, h // 2), interpolation=cv2.INTER_NEAREST)
    assert np.array_equal(ours, cv)


def test_jax_pyramid_ulp_equal_numpy_twin(bird_small_cv2):
    """The JAX pyramid and its NumPy twin agree to ~1 ULP on CPU (XLA fuses
    the tap multiply-adds into FMAs, so exact bit equality is off by the
    FMA's skipped intermediate rounding; logic differences would show up far
    above this tolerance)."""
    import jax

    img = bird_small_cv2[:96, :128]  # small crop: 1-core CPU test budget
    seed_np = oracle.create_seed_image(img, proc=NumpyProcessing)
    n_oct = CFG.n_octaves(seed_np.shape[0], seed_np.shape[1])

    @jax.jit
    def jx_pyramid(u8):
        seed = pyramid.create_seed_image(u8)
        ss = pyramid.build_scale_space(seed, n_oct)
        return ss, pyramid.build_dog(ss)

    ss_jx, dog_jx = jx_pyramid(jnp.asarray(img[None]))
    seed_jx = np.asarray(ss_jx[0])[0, 0]
    np.testing.assert_allclose(seed_np, seed_jx, rtol=0, atol=3e-7)

    ss_np = oracle.build_gaussian_scale_space(seed_np, n_oct, proc=NumpyProcessing)
    dog_np = oracle.build_dog(ss_np)
    for o in range(n_oct):
        np.testing.assert_allclose(np.asarray(ss_jx[o])[0], ss_np[o],
                                   rtol=0, atol=5e-7, err_msg=f"octave {o}")
        np.testing.assert_allclose(np.asarray(dog_jx[o])[0], dog_np[o],
                                   rtol=0, atol=1e-6, err_msg=f"dog {o}")
