"""Aux subsystems: metrics, descriptor DB persistence, runner recovery."""

import numpy as np


import pytest


@pytest.mark.smoke
def test_batch_runner_retries_and_health():
    import jax.numpy as jnp

    from sift_features_tpu.parallel.runner import BatchRunner, barrier

    calls = {"n": 0}

    def flaky_step(frames):
        calls["n"] += 1
        if calls["n"] == 2:  # second dispatch dies (simulated device loss)
            raise RuntimeError("injected device failure")
        return jnp.asarray(frames) * 2

    runner = BatchRunner(flaky_step, max_retries=2, health_check_every=2)
    batches = [(i, np.full((2, 2), i, np.float32)) for i in range(3)]
    done = dict(runner.run(batches))
    assert set(done) == {0, 1, 2}
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(done[i]), batches[i][1] * 2)
    assert runner.retried == 1 and runner.completed == 3

    assert barrier(timeout_s=30.0) >= 0.0

from sift_features_tpu.config import DEFAULT_CONFIG
from sift_features_tpu.io.database import DescriptorDB
from sift_features_tpu.models import extractor
from sift_features_tpu.utils.profiling import extraction_metrics


def test_metrics_and_db(bird_small_cv2, tmp_path):
    img = bird_small_cv2[:96, :128]
    res = extractor.extract_batch(img[None])
    m = extraction_metrics(res, image_hw=img.shape, cfg=DEFAULT_CONFIG)
    assert m["frames"] == 1
    assert m["keypoints_per_frame"][0] > 0
    assert not any(m["capacity_overflow_per_octave"])

    db = DescriptorDB.from_batch(res)
    k0, d0 = db.frame(0)
    assert len(k0) == m["keypoints_per_frame"][0]
    db.save(str(tmp_path / "db.npz"))
    db2 = DescriptorDB.load(str(tmp_path / "db.npz"))
    np.testing.assert_array_equal(db2.descriptors, db.descriptors)

    # sharded roundtrip over 3 shards with 2 frames: uneven split
    res2 = extractor.extract_batch(np.stack([img, img[::-1, ::-1].copy()]))
    db3 = DescriptorDB.from_batch(res2)
    db3.save_sharded(str(tmp_path / "shards"), 2)
    back = DescriptorDB.load_all(str(tmp_path / "shards"))
    np.testing.assert_array_equal(back.descriptors, db3.descriptors)
    np.testing.assert_array_equal(back.offsets, db3.offsets)
    k1a, _ = db3.frame(1)
    k1b, _ = back.frame(1)
    np.testing.assert_array_equal(k1a, k1b)


@pytest.mark.smoke
def test_scaling_model():
    from sift_features_tpu.utils.scaling import projected_efficiency, step_traffic

    tr = step_traffic(8, 14000, 1024, n_data=8)
    assert tr.ring_bytes > 0 and tr.halo_bytes == 0
    effs = [projected_efficiency(6.3, 4, 14000, 1024, n)["efficiency"]
            for n in (2, 8, 64)]
    assert all(0 < e <= 1 for e in effs)
    assert effs[0] >= effs[1] >= effs[2]
    # the >=80% multi-host target holds across the modeled range
    assert effs[-1] >= 0.8
