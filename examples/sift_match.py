"""Two-image matching demo (reference examples/sift-match.rs analog).

Extracts with BOTH this framework's TPU pipeline and OpenCV's SIFT, matches
each pair with the framework's brute-force cross-check matcher (the reference
delegates to cv2.BFMatcher; ours is first-class), and renders
matches.jpg / cv_matches.jpg.

Usage: python examples/sift_match.py [img1 img2 [out_dir]]
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

import sift_features_tpu as sft  # noqa: E402
from sift_features_tpu.io.image import load_gray  # noqa: E402


def to_cv_kps(kps: np.ndarray):
    import cv2

    return [cv2.KeyPoint(float(k[0]), float(k[1]), float(k[2]) * 2,
                         float(k[3]), float(k[4])) for k in kps]


def draw(img1, kps1, img2, kps2, matches, path):
    """Render with the native output tier (no OpenCV in our output path,
    native/sift_output.cpp); fall back to cv2.drawMatches if the native
    toolchain is unavailable."""
    try:
        from sift_features_tpu.io.native_output import (render_matches,
                                                        write_jpeg)

        pairs = np.stack([matches.query_idx, matches.train_idx], axis=1)
        write_jpeg(path, render_matches(img1, kps1, img2, kps2, pairs))
    except Exception:
        import cv2

        dmatches = [cv2.DMatch(int(q), int(t), float(d))
                    for q, t, d in zip(matches.query_idx, matches.train_idx,
                                       matches.distance)]
        out = cv2.drawMatches(img1, to_cv_kps(kps1), img2, to_cv_kps(kps2),
                              dmatches, None,
                              flags=cv2.DrawMatchesFlags_NOT_DRAW_SINGLE_POINTS)
        cv2.imwrite(path, out)
    print(f"wrote {path} ({len(matches.query_idx)} matches)")


def main():
    img1_path = sys.argv[1] if len(sys.argv) > 2 else "/root/reference/images/tree.jpg"
    img2_path = sys.argv[2] if len(sys.argv) > 2 else "/root/reference/images/tree_small.jpg"
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "."
    img1 = load_gray(img1_path, "cv2")
    img2 = load_gray(img2_path, "cv2")

    # ours: TPU pipeline + our matcher (query = img2 descs, train = img1)
    k1, d1 = sft.sift(img1)
    k2, d2 = sft.sift(img2)
    print(f"ours: {len(k1)} / {len(k2)} keypoints")
    m = sft.match_descriptors(d1, d2, cross_check=True)
    draw(img2, k2, img1, k1, m, os.path.join(out_dir, "matches.jpg"))

    # OpenCV baseline pair, matched with OUR matcher
    import cv2

    s = cv2.SIFT_create()
    ck1, cd1 = s.detectAndCompute(img1, None)
    ck2, cd2 = s.detectAndCompute(img2, None)
    print(f"cv2 : {len(ck1)} / {len(ck2)} keypoints")
    cm = sft.match_descriptors(cd1, cd2, cross_check=True)
    dmatches = [cv2.DMatch(int(q), int(t), float(d))
                for q, t, d in zip(cm.query_idx, cm.train_idx, cm.distance)]
    out = cv2.drawMatches(img2, ck2, img1, ck1, dmatches, None,
                          flags=cv2.DrawMatchesFlags_NOT_DRAW_SINGLE_POINTS)
    path = os.path.join(out_dir, "cv_matches.jpg")
    cv2.imwrite(path, out)
    print(f"wrote {path} ({len(dmatches)} matches)")


if __name__ == "__main__":
    main()
