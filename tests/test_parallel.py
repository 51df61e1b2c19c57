"""Multi-chip sharding tests on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8): data-parallel extraction equals the
single-chip path, halo-exchange blur is bit-identical to the unsharded blur,
ring matcher equals the dense matcher, and the full extract+match step runs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sift_features_tpu.models import extractor
from sift_features_tpu.ops.gaussian import gaussian_blur, gaussian_kernel
from sift_features_tpu.ops.matcher import match_brute_force
from sift_features_tpu.parallel import (extract_batch_dp, extract_match_step,
                                        make_mesh, ring_match)
from sift_features_tpu.parallel.halo import gaussian_blur_sharded


def _imgs(bird_small_cv2, b=4, h=96, w=128):
    img = bird_small_cv2[:h, :w]
    rng = np.random.RandomState(0)
    out = [img]
    for _ in range(b - 1):
        out.append(np.roll(img, rng.randint(1, 20), axis=1))
    return np.stack(out)


def test_halo_blur_matches_unsharded():
    mesh = make_mesh(n_data=1, n_space=4)
    rng = np.random.RandomState(1)
    x = rng.rand(64, 40).astype(np.float32)
    sigma = 2.0

    from jax.sharding import PartitionSpec as P

    def body(xs):
        return gaussian_blur_sharded(xs, sigma, "space", 4)

    y_sharded = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P("space", None),
        out_specs=P("space", None)))(x)
    y_ref = gaussian_blur(jnp.asarray(x), sigma)
    # same tap order; XLA may fuse FMA differently across the two programs,
    # so allow a couple of ULPs
    np.testing.assert_allclose(np.asarray(y_sharded), np.asarray(y_ref),
                               rtol=0, atol=3e-7)


def test_halo_blur_radius_exceeds_shard():
    with pytest.raises(AssertionError):
        mesh = make_mesh(n_data=1, n_space=8)
        from jax.sharding import PartitionSpec as P

        x = np.ones((16, 16), np.float32)  # 2 rows/shard < radius
        jax.jit(jax.shard_map(
            lambda xs: gaussian_blur_sharded(xs, 4.0, "space", 8),
            mesh=mesh, in_specs=P("space", None),
            out_specs=P("space", None)))(x)


def test_extract_dp_matches_single_chip(bird_small_cv2):
    imgs = _imgs(bird_small_cv2, b=4)
    mesh = make_mesh(n_data=4, n_space=1)
    res_dp = extract_batch_dp(imgs, mesh)
    res_1 = extractor.extract_batch(imgs)
    assert np.array_equal(np.asarray(res_dp["valid"]), np.asarray(res_1["valid"]))
    v = np.asarray(res_1["valid"])
    np.testing.assert_array_equal(
        np.asarray(res_dp["kps"])[v], np.asarray(res_1["kps"])[v])
    np.testing.assert_array_equal(
        np.asarray(res_dp["desc"])[v], np.asarray(res_1["desc"])[v])


def test_ring_match_equals_dense():
    rng = np.random.RandomState(2)
    d1 = rng.randint(0, 256, (173, 128)).astype(np.uint8)
    d2 = rng.randint(0, 256, (97, 128)).astype(np.uint8)
    mesh = make_mesh(n_data=8, n_space=1)
    qi, ti, dist = ring_match(d1, d2, mesh)
    m = match_brute_force(d1, d2)
    np.testing.assert_array_equal(qi, m.query_idx)
    np.testing.assert_array_equal(ti, m.train_idx)
    np.testing.assert_allclose(dist, m.distance, rtol=1e-6)


def test_ring_match_no_crosscheck():
    rng = np.random.RandomState(3)
    d1 = rng.randint(0, 256, (64, 128)).astype(np.uint8)
    d2 = rng.randint(0, 256, (40, 128)).astype(np.uint8)
    mesh = make_mesh(n_data=4, n_space=1)
    qi, ti, dist = ring_match(d1, d2, mesh, cross_check=False)
    m = match_brute_force(d1, d2, cross_check=False)
    np.testing.assert_array_equal(qi, m.query_idx)
    np.testing.assert_array_equal(ti, m.train_idx)


@pytest.mark.slow
def test_extract_match_step_runs(bird_small_cv2):
    from sift_features_tpu.config import DEFAULT_CONFIG

    imgs = _imgs(bird_small_cv2, b=4)
    mesh = make_mesh(n_data=2, n_space=2)
    cfg = DEFAULT_CONFIG
    n_oct = cfg.n_octaves(imgs.shape[1] * 2, imgs.shape[2] * 2)
    res = extract_match_step(jnp.asarray(imgs), n_oct, cfg, mesh, 64)
    keep = np.asarray(res["match_keep"])
    assert keep.any(), "rolled copies of the same image must cross-match"
    # matched pairs should be the shifted keypoint (distance small for many)
    assert np.asarray(res["valid"]).sum() > 0


@pytest.mark.mid
def test_extract_match_step_budget(bird_small_cv2):
    """features_limit threads through the sharded step (C15): per-frame
    keypoint buffers shrink to the budget and hold exactly the unbudgeted
    run's response top-K (response-sorted)."""
    from sift_features_tpu.config import DEFAULT_CONFIG

    imgs = _imgs(bird_small_cv2, b=4)
    mesh = make_mesh(n_data=4, n_space=1)
    cfg = DEFAULT_CONFIG
    n_oct = cfg.n_octaves(imgs.shape[1] * 2, imgs.shape[2] * 2)
    limit = 32
    full = extract_match_step(jnp.asarray(imgs), n_oct, cfg, mesh, 16)
    res = extract_match_step(jnp.asarray(imgs), n_oct, cfg, mesh, 16, limit)
    kps = np.asarray(res["kps"])
    valid = np.asarray(res["valid"])
    assert kps.shape[1] == limit
    fk = np.asarray(full["kps"])
    fv = np.asarray(full["valid"])
    for b in range(kps.shape[0]):
        resp = np.where(fv[b], fk[b][:, 4], -np.inf)
        order = np.argsort(-resp, kind="stable")[:limit]
        order = order[resp[order] > -np.inf]
        np.testing.assert_allclose(kps[b][valid[b]][:, 4],
                                   fk[b][order][:, 4], rtol=0, atol=0)

    # spatial mesh: the budget resolves BEFORE description (round 4 —
    # members all_gather emission responses, take the per-frame top-K, and
    # describe only their own selected keypoints,
    # parallel/extract.py:_extract_single_spatial). Output semantics match
    # the unbudgeted run's top-K: same response SET and, row-for-row by
    # keypoint identity, byte-identical descriptors.
    mesh_s = make_mesh(n_data=2, n_space=2)
    res_s = extract_match_step(jnp.asarray(imgs[:2]), n_oct, cfg, mesh_s, 16,
                               limit)
    kps_s = np.asarray(res_s["kps"])
    desc_s = np.asarray(res_s["desc"])
    valid_s = np.asarray(res_s["valid"])
    fd = np.asarray(full["desc"])
    assert kps_s.shape[1] == limit
    for b in range(2):
        resp = np.where(fv[b], fk[b][:, 4], -np.inf)
        order = np.argsort(-resp, kind="stable")[:limit]
        order = order[resp[order] > -np.inf]
        np.testing.assert_allclose(np.sort(kps_s[b][valid_s[b]][:, 4]),
                                   np.sort(fk[b][order][:, 4]),
                                   rtol=0, atol=0)
        # descriptor bytes of the describe-selected-subset path: every
        # budgeted keypoint matches an unbudgeted top-K row (all 5 keypoint
        # columns equal) whose descriptor bytes are identical
        sel_k, sel_d = fk[b][order], fd[b][order]
        got_k, got_d = kps_s[b][valid_s[b]], desc_s[b][valid_s[b]]
        assert len(got_k) == len(sel_k)
        used = np.zeros(len(sel_k), bool)
        for i in range(len(got_k)):
            cand = np.where(~used
                            & (np.abs(sel_k - got_k[i]).sum(1) == 0))[0]
            assert cand.size, f"frame {b}: kp {i} missing from full top-K"
            # duplicates: prefer the identical-bytes row among equal kps
            j = next((c for c in cand if (sel_d[c] == got_d[i]).all()),
                     cand[0])
            used[j] = True
            np.testing.assert_array_equal(
                got_d[i], sel_d[j],
                err_msg=f"frame {b}: descriptor bytes differ for kp {i}")


def test_ring_match_u8_equals_f32():
    """u8 descriptors take the int8 MXU ring; retained matches and distances
    must equal the f32 ring exactly (integer distances < 2^24 are f32-exact)."""
    rng = np.random.RandomState(11)
    d1 = rng.randint(0, 256, (131, 128)).astype(np.uint8)
    d2 = rng.randint(0, 256, (77, 128)).astype(np.uint8)
    mesh = make_mesh(n_data=4, n_space=1)
    qi8, ti8, dist8 = ring_match(d1, d2, mesh)
    qif, tif, distf = ring_match(d1.astype(np.float32),
                                 d2.astype(np.float32), mesh)
    np.testing.assert_array_equal(qi8, qif)
    np.testing.assert_array_equal(ti8, tif)
    np.testing.assert_array_equal(dist8, distf)


def test_spatial_detection_equals_single(bird_small_cv2):
    """The space axis does REAL detection sharding now: at n_space=2 each
    member detects its own row band. Concatenated member results must be
    the same keypoint+descriptor SET as n_space=1 (byte-equal after a
    canonical sort; member-major order differs from global scan order)."""
    from sift_features_tpu.config import DEFAULT_CONFIG

    imgs = _imgs(bird_small_cv2, b=2)
    cfg = DEFAULT_CONFIG
    n_oct = cfg.n_octaves(imgs.shape[1] * 2, imgs.shape[2] * 2)
    mesh = make_mesh(n_data=2, n_space=2)
    res = extract_match_step(jnp.asarray(imgs), n_oct, cfg, mesh, 32)
    ref = extractor.extract_batch(imgs)

    def canon(kps, desc, valid):
        k, d = kps[valid], desc[valid]
        comb = np.concatenate([k, d.astype(np.float32)], axis=1)
        order = np.lexsort(comb.T[::-1])
        return comb[order]

    for f in range(imgs.shape[0]):
        a = canon(np.asarray(res["kps"])[f], np.asarray(res["desc"])[f],
                  np.asarray(res["valid"])[f])
        b = canon(np.asarray(ref["kps"])[f], np.asarray(ref["desc"])[f],
                  np.asarray(ref["valid"])[f])
        assert a.shape == b.shape, (a.shape, b.shape)
        np.testing.assert_array_equal(a, b, err_msg=f"frame {f}")
    # psum'd counters equal the single-chip counters
    np.testing.assert_array_equal(np.asarray(res["n_candidates"]),
                                  np.asarray(ref["n_candidates"]))


@pytest.mark.slow
def test_determinism_across_mesh_shapes(bird_small_cv2):
    """SURVEY §5.2: extract_match_step output must be identical across mesh
    shapes on fixed inputs. Data-parallel reshardings must be byte-equal;
    space reshardings reorder keypoints (member-major) so they are compared
    as canonically-sorted sets; match results are compared after mapping
    query indices through each frame's valid keypoints."""
    from sift_features_tpu.config import DEFAULT_CONFIG

    imgs = _imgs(bird_small_cv2, b=8)
    cfg = DEFAULT_CONFIG
    n_oct = cfg.n_octaves(imgs.shape[1] * 2, imgs.shape[2] * 2)

    def run(n_data, n_space):
        mesh = make_mesh(n_data=n_data, n_space=n_space)
        return extract_match_step(jnp.asarray(imgs), n_oct, cfg, mesh, 32)

    base = run(1, 1)

    def canon(res, f):
        v = np.asarray(res["valid"])[f]
        k = np.asarray(res["kps"])[f][v]
        d = np.asarray(res["desc"])[f][v]
        comb = np.concatenate([k, d.astype(np.float32)], axis=1)
        return comb[np.lexsort(comb.T[::-1])]

    for nd, ns in [(8, 1), (4, 2), (2, 4)]:
        res = run(nd, ns)
        for f in range(imgs.shape[0]):
            np.testing.assert_array_equal(
                canon(res, f), canon(base, f),
                err_msg=f"mesh ({nd},{ns}) frame {f}")
        if ns == 1:
            # pure data-parallel resharding: bitwise-identical results on
            # every VALID lane (invalid-lane padding is program-dependent)
            v = np.asarray(base["valid"])
            np.testing.assert_array_equal(np.asarray(res["valid"]), v)
            for key in ("kps", "desc"):
                np.testing.assert_array_equal(
                    np.asarray(res[key])[v], np.asarray(base[key])[v],
                    err_msg=f"mesh ({nd},{ns}) {key}")
            for key in ("n_candidates", "n_emitted", "query_idx"):
                np.testing.assert_array_equal(
                    np.asarray(res[key]), np.asarray(base[key]),
                    err_msg=f"mesh ({nd},{ns}) {key}")
            mk = np.asarray(base["match_keep"])
            np.testing.assert_array_equal(np.asarray(res["match_keep"]), mk)
            for key in ("match_train", "match_dist"):
                np.testing.assert_array_equal(
                    np.asarray(res[key])[mk], np.asarray(base[key])[mk],
                    err_msg=f"mesh ({nd},{ns}) {key}")


@pytest.mark.mid
def test_mesh_equality_one_case(bird_small_cv2):
    """Mid-tier cut of test_determinism_across_mesh_shapes: ONE sharded mesh
    (data=2, space=2) vs the unsharded step, canonical keypoint-set compare.
    Catches distribution regressions per-iteration without the full
    slow-tier sweep."""
    from sift_features_tpu.config import DEFAULT_CONFIG

    imgs = _imgs(bird_small_cv2, b=4)
    cfg = DEFAULT_CONFIG
    n_oct = cfg.n_octaves(imgs.shape[1] * 2, imgs.shape[2] * 2)

    def run(n_data, n_space):
        mesh = make_mesh(n_data=n_data, n_space=n_space)
        return extract_match_step(jnp.asarray(imgs), n_oct, cfg, mesh, 32)

    base = run(1, 1)
    res = run(2, 2)

    def canon(r, f):
        v = np.asarray(r["valid"])[f]
        k = np.asarray(r["kps"])[f][v]
        d = np.asarray(r["desc"])[f][v]
        comb = np.concatenate([k, d.astype(np.float32)], axis=1)
        return comb[np.lexsort(comb.T[::-1])]

    for f in range(imgs.shape[0]):
        np.testing.assert_array_equal(canon(res, f), canon(base, f),
                                      err_msg=f"mesh (2,2) frame {f}")
