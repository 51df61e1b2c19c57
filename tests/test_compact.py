"""compact_indices vs np.nonzero ground truth (order, overflow, vmap)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sift_features_tpu.utils.compact import compact_indices


pytestmark = pytest.mark.smoke


def _check(mask, cap, block=512):
    idx, valid, count = jax.jit(
        lambda m: compact_indices(m, cap, block))(jnp.asarray(mask))
    idx, valid, count = np.asarray(idx), np.asarray(valid), int(count)
    true_idx = np.nonzero(mask)[0]
    assert count == len(true_idx)
    k = min(cap, len(true_idx))
    np.testing.assert_array_equal(idx[:k], true_idx[:k])
    assert valid[:k].all() and not valid[k:].any()
    assert (idx[k:] == 0).all()


def test_compact_random():
    rng = np.random.RandomState(0)
    for n, p, cap in [(10_000, 0.01, 256), (10_000, 0.5, 512),
                      (100_000, 0.001, 128), (777, 0.3, 64),
                      (512, 0.9, 1024), (24_883_200, 0.0005, 4096)]:
        _check(rng.rand(n) < p, cap)


def test_compact_edge_cases():
    _check(np.zeros(5000, bool), 128)           # empty
    _check(np.ones(300, bool), 64)              # overflow, small input
    m = np.zeros(5000, bool)
    m[4999] = True                              # last element only
    _check(m, 16)
    m = np.zeros(2048, bool)
    m[[0, 511, 512, 1023, 1024, 2047]] = True   # block boundaries
    _check(m, 16)


def test_compact_vmapped():
    rng = np.random.RandomState(1)
    masks = rng.rand(3, 8192) < 0.05
    idx, valid, count = jax.jit(jax.vmap(
        lambda m: compact_indices(m, 256)))(jnp.asarray(masks))
    for i in range(3):
        t = np.nonzero(masks[i])[0]
        assert int(count[i]) == len(t)
        k = min(256, len(t))
        np.testing.assert_array_equal(np.asarray(idx)[i][:k], t[:k])


def test_compact_packed_matches_dense():
    from sift_features_tpu.utils.compact import compact_indices, compact_indices_packed

    rng = np.random.RandomState(7)
    for n, p, cap in [(1 << 15, 0.001, 64), (1 << 15, 0.01, 512),
                      (100000, 0.0005, 128), (4096, 0.5, 4096), (33, 1.0, 64)]:
        mask = jnp.asarray(rng.rand(n) < p)
        ia, va, ca = compact_indices(mask, cap)
        ib, vb, cb = compact_indices_packed(mask, cap)
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
        assert int(ca) == int(cb)


def test_compact_packed_overflow():
    from sift_features_tpu.utils.compact import compact_indices_packed

    mask = jnp.asarray(np.ones(1000, bool))
    idx, valid, count = compact_indices_packed(mask, 64)
    assert int(count) == 1000 and valid.all()
    np.testing.assert_array_equal(np.asarray(idx), np.arange(64))
