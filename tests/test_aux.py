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


@pytest.mark.smoke
def test_descriptor_index_service(tmp_path):
    """service.DescriptorIndex: add -> query -> (frame, keypoint) mapping ->
    save/load roundtrip. Self-queries must hit their own DB rows at
    distance 0 (synthetic descriptors keep this extraction-free)."""
    from sift_features_tpu.service import DescriptorIndex

    rng = np.random.RandomState(3)
    counts = [5, 0, 9, 3]
    B, M = len(counts), max(counts)
    valid = np.zeros((B, M), bool)
    for i, c in enumerate(counts):
        valid[i, :c] = True
    desc = rng.randint(0, 256, (B, M, 128)).astype(np.uint8)
    kps = rng.rand(B, M, 5).astype(np.float32)
    res = {"kps": kps, "desc": desc, "valid": valid}

    idx = DescriptorIndex()
    idx.add_batch_result(res, frame_ids=np.array([10, 11, 12, 13]))
    assert len(idx.db.descriptors) == sum(counts)

    # query frame 12's descriptors: exact self-matches
    q = desc[2, :counts[2]]
    r = idx.query(q)
    assert (r.distance == 0).all()
    sel = np.argsort(r.query_idx)
    np.testing.assert_array_equal(r.frame_id[sel], np.full(counts[2], 12))
    np.testing.assert_array_equal(r.keypoint_idx[sel],
                                  np.arange(counts[2]))

    # roundtrip
    idx.save(str(tmp_path / "svc"), n_shards=2)
    idx2 = DescriptorIndex.load(str(tmp_path / "svc"))
    np.testing.assert_array_equal(idx2.db.descriptors, idx.db.descriptors)
    r2 = idx2.query(q)
    np.testing.assert_array_equal(r2.keypoint_idx[np.argsort(r2.query_idx)],
                                  np.arange(counts[2]))

    # empty index / empty query edge cases
    empty = DescriptorIndex()
    assert len(empty.query(q).query_idx) == 0
    assert len(idx.query(np.zeros((0, 128), np.uint8)).query_idx) == 0
