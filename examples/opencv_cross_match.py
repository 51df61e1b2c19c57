"""Cross-implementation compatibility proof (reference
examples/opencv-cross-match.rs analog): OpenCV descriptors on image 1 matched
against THIS framework's descriptors on image 2 with cross-check L2 matching.
If the two implementations were not descriptor-compatible, mutual matches
would be near-zero.

Usage: python examples/opencv_cross_match.py [img1 img2 [out.jpg]]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

import sift_features_tpu as sft  # noqa: E402
from sift_features_tpu.io.image import load_gray  # noqa: E402


def main():
    img1_path = sys.argv[1] if len(sys.argv) > 2 else "/root/reference/images/tree.jpg"
    img2_path = sys.argv[2] if len(sys.argv) > 2 else "/root/reference/images/tree_small.jpg"
    out_path = sys.argv[3] if len(sys.argv) > 3 else "matches-tpu-opencv.jpg"

    import cv2

    img1 = load_gray(img1_path, "cv2")
    img2 = load_gray(img2_path, "cv2")

    s = cv2.SIFT_create()
    cv_kps, cv_desc = s.detectAndCompute(img1, None)       # f32 descriptors
    k2, d2 = sft.sift(img2)                                # our u8 descriptors
    print(f"cv2: {len(cv_kps)} keypoints, ours: {len(k2)}")

    # u8 -> f32 upcast for NORM_L2 (opencv-cross-match.rs:75)
    m = sft.match_descriptors(cv_desc, d2.astype(np.float32), cross_check=True)
    print(f"mutual cross-implementation matches: {len(m.query_idx)}")

    our_kps = [cv2.KeyPoint(float(k[0]), float(k[1]), float(k[2]) * 2,
                            float(k[3]), float(k[4])) for k in k2]
    dmatches = [cv2.DMatch(int(q), int(t), float(d))
                for q, t, d in zip(m.query_idx, m.train_idx, m.distance)]
    out = cv2.drawMatches(img2, our_kps, img1, cv_kps, dmatches, None,
                          flags=cv2.DrawMatchesFlags_NOT_DRAW_SINGLE_POINTS)
    cv2.imwrite(out_path, out)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
