"""Descriptor-database service demo: index the reference images, then
query one of them back and report where its keypoints matched.

Usage: python examples/build_index.py [--budget N] [--save DIR]

The serving loop this demonstrates (SURVEY.md §5.4/§5.7): frames stream in,
budgeted extraction fills a persistent descriptor database, and new frames
are matched against the whole database (loop closure / retrieval). With a
device mesh the same query runs the ring-streamed matcher unchanged.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sift_features_tpu.io.image import load_gray
from sift_features_tpu.service import DescriptorIndex

IMAGES = ["bird_small.jpg", "tree_small.jpg", "elephant.jpg"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=512,
                    help="features_limit per frame (0 = unlimited)")
    ap.add_argument("--save", default="",
                    help="directory to persist the index shards")
    ap.add_argument("--images", default="/root/reference/images")
    args = ap.parse_args()

    idx = DescriptorIndex()
    budget = args.budget or None
    for i, name in enumerate(IMAGES):
        path = os.path.join(args.images, name)
        if not os.path.exists(path):
            continue
        img = load_gray(path, "cv2")
        t0 = time.time()
        idx.add_frames(img[None], frame_ids=np.array([i]),
                       features_limit=budget)
        n = int(idx.db.offsets[-1])
        print(f"indexed {name}: {n} rows total ({time.time()-t0:.1f}s)")

    # query a shifted crop of image 0: matches should land in frame 0
    img0 = load_gray(os.path.join(args.images, IMAGES[0]), "cv2")
    crop = img0[10:, 10:]
    kps, desc, r = idx.query_image(crop, features_limit=budget)
    per_frame = {int(f): int((r.frame_id == f).sum())
                 for f in np.unique(r.frame_id)}
    print(f"query crop of {IMAGES[0]}: {len(kps)} kps, "
          f"{len(r.query_idx)} cross-checked matches, per-frame {per_frame}")
    if len(r.query_idx):
        own = (r.frame_id == 0).mean()
        print(f"fraction matched into its own frame: {own:.3f}")

    if args.save:
        idx.save(args.save)
        print(f"saved shards to {args.save}")


if __name__ == "__main__":
    main()
