"""Streaming serving-loop demo: JPEG files -> features, fully pipelined.

The native C++ decode pool, host->device transfer, the device extraction
program, and host readback all overlap across batches
(sift_features_tpu/parallel/stream.py). This is the continuous-feed
counterpart of the reference's one-shot examples/run-sift.rs.

Usage: python examples/stream_features.py [jpegs...] [--batch B]
       [--budget N] [--index]

With --index the streamed features are appended to a DescriptorIndex
(loop-closure database) as they arrive.
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="*",
                    default=sorted(glob.glob("/root/reference/images/*.jpg")))
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--budget", type=int, default=512,
                    help="features_limit per frame (0 = unlimited)")
    ap.add_argument("--hw", default="608,800",
                    help="fixed H,W frames are cropped/padded to")
    ap.add_argument("--index", action="store_true",
                    help="append streamed features to a DescriptorIndex")
    args = ap.parse_args()
    if not args.paths:
        print("no JPEGs found", file=sys.stderr)
        return 1

    from sift_features_tpu.parallel.stream import stream_extract_paths

    h, w = (int(v) for v in args.hw.split(","))
    budget = args.budget or None
    index = None
    if args.index:
        from sift_features_tpu.service import DescriptorIndex

        index = DescriptorIndex()

    t0 = time.time()
    n_frames = n_kps = 0
    for batch in stream_extract_paths(args.paths, args.batch, (h, w),
                                      features_limit=budget):
        for kps, desc in batch:
            path = args.paths[n_frames]
            print(f"{os.path.basename(path):24s} {len(kps):6d} keypoints")
            if index is not None:
                index.add_batch_result(
                    {"kps": kps[None], "desc": desc[None],
                     "valid": np.ones((1, len(kps)), bool)},
                    frame_ids=np.array([n_frames]))
            n_frames += 1
            n_kps += len(kps)
    dt = time.time() - t0
    print(f"\n{n_frames} frames, {n_kps} keypoints in {dt:.1f}s "
          f"({n_frames / dt:.2f} frames/s end to end)")
    if index is not None:
        print(f"index: {int(index.db.offsets[-1])} descriptor rows from "
              f"{len(index.db.frame_ids)} frames")
    return 0


if __name__ == "__main__":
    sys.exit(main())
