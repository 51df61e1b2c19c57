"""Minimal extraction CLI (reference examples/run-sift.rs:5-21 analog).

Usage: python examples/run_sift.py <image> [features_limit]
Prints the number of keypoints found.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import sift_features_tpu as sft  # noqa: E402
from sift_features_tpu.io.image import load_gray  # noqa: E402


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/images/bird_small.jpg"
    limit = int(sys.argv[2]) if len(sys.argv) > 2 else None
    img = load_gray(path, "cv2")
    kps, desc = sft.sift(img, features_limit=limit)
    print(f"found {len(kps)} keypoints")


if __name__ == "__main__":
    main()
