"""Mikolajczyk-style repeatability / matching-score benchmark on synthetic
homography warps of the reference images (SURVEY.md §7 step 7 — no Oxford
dataset in this environment, so warps are generated with cv2).

For each (base, warped-by-H) pair:
  repeatability  = fraction of base keypoints whose H-projection lands
                   within eps px of a detected keypoint in the warp
  matching score = fraction of cross-checked descriptor matches that are
                   geometrically consistent with H

Compares this framework against cv2.SIFT on identical pairs.
Usage: python tools/repeatability.py [image|all|hpatches] [eps_px]
  'all' runs every small reference image plus a keypoint-budget sweep
  (features_limit curves, ROADMAP item 5).
  'hpatches' runs the HPatches-style photometric/degradation protocol
  (Gaussian blur, JPEG quality, gamma/brightness illumination, sensor
  noise; identity homography) on the small reference images — the
  viewpoint-free half of the HPatches split, synthesized locally.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def homographies(h, w):
    import cv2

    out = []
    c = np.array([w / 2, h / 2])
    for deg, scale, persp in [(10, 1.0, 0.0), (25, 0.9, 0.0),
                              (0, 0.7, 0.0), (5, 1.1, 1e-4)]:
        m = cv2.getRotationMatrix2D(tuple(c), deg, scale)
        H = np.vstack([m, [0, 0, 1]]).astype(np.float64)
        H[2, 0] = persp
        out.append(H)
    return out


def photometric_sequence(img):
    """HPatches-style non-viewpoint pairs: (name, transformed image).
    Geometry is identity, so repeatability/matching use H = I."""
    import cv2

    rng = np.random.RandomState(7)
    out = []
    for sigma in (1.0, 2.0):
        out.append((f"blur s={sigma}",
                    cv2.GaussianBlur(img, (0, 0), sigma)))
    for q in (60, 30):
        ok, enc = cv2.imencode(".jpg", img,
                               [cv2.IMWRITE_JPEG_QUALITY, q])
        assert ok
        out.append((f"jpeg q={q}", cv2.imdecode(enc, cv2.IMREAD_GRAYSCALE)))
    for gamma, gain in ((0.6, 1.0), (1.6, 1.0), (1.0, 0.6)):
        f = np.clip(((img / 255.0) ** gamma) * gain * 255.0, 0, 255)
        out.append((f"illum g={gamma} k={gain}", f.astype(np.uint8)))
    noisy = img.astype(np.float32) + rng.normal(0, 6, img.shape)
    out.append(("noise s=6", np.clip(noisy, 0, 255).astype(np.uint8)))
    return out


def project(H, pts):
    p = np.concatenate([pts, np.ones((len(pts), 1))], axis=1) @ H.T
    return p[:, :2] / p[:, 2:3]


def repeatability(k_base, k_warp, H, eps):
    if not len(k_base) or not len(k_warp):
        return 0.0
    proj = project(H, k_base[:, :2])
    d = np.sqrt(((proj[:, None, :] - k_warp[None, :, :2]) ** 2).sum(-1))
    return float((d.min(axis=1) < eps).mean())


def matching_score(k_base, d_base, k_warp, d_warp, H, eps, matcher):
    m = matcher(d_base, d_warp)
    if not len(m[0]):
        return 0.0
    qi, ti = m[0], m[1]
    proj = project(H, k_base[ti][:, :2])
    good = np.sqrt(((proj - k_warp[qi][:, :2]) ** 2).sum(-1)) < eps
    return float(good.mean())


def run_image(path, eps, budgets=()):
    import cv2

    from sift_features_tpu.io.image import load_gray
    import sift_features_tpu as sft

    img = load_gray(path, "cv2")
    h, w = img.shape

    def ours(im):
        k, d = sft.sift(im)
        return k, d  # (N,5), (N,128)

    def cv_sift(im):
        s = cv2.SIFT_create()
        kk, dd = s.detectAndCompute(im, None)
        arr = np.array([[k.pt[0], k.pt[1], k.size, k.angle, k.response]
                        for k in kk], np.float32).reshape(-1, 5)
        return arr, (dd if dd is not None else np.zeros((0, 128), np.float32))

    def our_matcher(d1, d2):
        m = sft.match_descriptors(d1, d2.astype(np.float32), cross_check=True)
        return m.query_idx, m.train_idx

    kb_o, db_o = ours(img)
    kb_c, db_c = cv_sift(img)
    print(f"image {path} {w}x{h}: ours {len(kb_o)} kps, cv2 {len(kb_c)} kps")
    rows = []
    for i, H in enumerate(homographies(h, w)):
        warp = cv2.warpPerspective(img, H, (w, h))
        kw_o, dw_o = ours(warp)
        kw_c, dw_c = cv_sift(warp)
        r_o = repeatability(kb_o, kw_o, H, eps)
        r_c = repeatability(kb_c, kw_c, H, eps)
        s_o = matching_score(kb_o, db_o, kw_o, dw_o, H, eps * 2, our_matcher)
        s_c = matching_score(kb_c, db_c, kw_c, dw_c, H, eps * 2, our_matcher)
        rows.append((r_o, r_c, s_o, s_c))
        print(f"  warp {i}: repeat ours {r_o:.3f} cv2 {r_c:.3f} | "
              f"match-score ours {s_o:.3f} cv2 {s_c:.3f}")
    m = np.mean(rows, axis=0)
    print(f"mean: repeat ours {m[0]:.3f} cv2 {m[1]:.3f} | "
          f"match-score ours {m[2]:.3f} cv2 {m[3]:.3f}")

    # keypoint-budget sweep: matching score under features_limit (the
    # reference's only runtime knob) on the first warp pair
    if budgets:
        H = homographies(h, w)[0]
        warp = cv2.warpPerspective(img, H, (w, h))
        for lim in budgets:
            kb, db = sft.sift(img, features_limit=lim)
            kw, dw = sft.sift(warp, features_limit=lim)
            s = matching_score(kb, db, kw, dw, H, eps * 2, our_matcher)
            r = repeatability(kb, kw, H, eps)
            print(f"  budget {lim:>5}: kps {len(kb):>5} | repeat {r:.3f} "
                  f"| match-score {s:.3f}")
    return m


def run_hpatches(path, eps):
    """Photometric / degradation protocol (identity homography)."""
    import cv2  # noqa: F401

    from sift_features_tpu.io.image import load_gray
    import sift_features_tpu as sft

    img = load_gray(path, "cv2")
    H = np.eye(3)

    def our_matcher(d1, d2):
        m = sft.match_descriptors(d1, d2.astype(np.float32),
                                  cross_check=True)
        return m.query_idx, m.train_idx

    kb, db = sft.sift(img)
    print(f"image {path}: {len(kb)} kps (base)")
    rows = []
    for name, timg in photometric_sequence(img):
        kw, dw = sft.sift(timg)
        r = repeatability(kb, kw, H, eps)
        s = matching_score(kb, db, kw, dw, H, eps * 2, our_matcher)
        rows.append((r, s))
        print(f"  {name:18s}: kps {len(kw):>5} | repeat {r:.3f} | "
              f"match-score {s:.3f}")
    m = np.mean(rows, axis=0)
    print(f"mean: repeat {m[0]:.3f} | match-score {m[1]:.3f}")
    return m


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/images/bird_small.jpg"
    eps = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
    if arg == "all":
        for name in ("bird_small", "tree_small", "elephant"):
            run_image(f"/root/reference/images/{name}.jpg", eps,
                      budgets=(100, 500, 1000))
    elif arg == "hpatches":
        for name in ("bird_small", "tree_small"):
            run_hpatches(f"/root/reference/images/{name}.jpg", eps)
    else:
        run_image(arg, eps)


if __name__ == "__main__":
    main()
