"""Detection-level exactness of storage_dtype="split" vs float32 (TPU tool).

The fused-octave split kernel (ops/pallas/pyramid_kernel.py:build_octave_fused)
computes the DoG from the unrounded in-VMEM f32 blur chain, so everything
DETECTION reads is bit-exact vs the f32 pipeline; only the window stages
(orientation histograms, descriptor samples) read the bf16-stored Gaussian.
check_modes.py measures the end-to-end keypoint deltas (which include
orientation-peak flips at the 0.8-threshold boundary); this tool separates
the claims:

  detection  unique (x, y, size, response) rows — MUST be byte-identical
             sets if the split DoG is exact (positions, scales, responses
             all come from refinement on the DoG alone)
  emission   (x, y, size, response) rows WITH multiplicity — differences
             here are survivors whose bf16-window histogram emitted a
             different number of orientation peaks

Usage: python tools/check_split_detection.py [image ...]
"""

import dataclasses
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def rows_key(kps):
    """Byte-exact comparable rows of (x, y, size, response)."""
    r = kps[:, [0, 1, 2, 4]].astype(np.float32)
    return [tuple(v.tobytes() for v in row) for row in r]


def main():
    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.io.image import load_gray
    from sift_features_tpu.models.extractor import extract
    from sift_features_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    images = sys.argv[1:] or ["/root/reference/images/bird_small.jpg",
                              "/root/reference/images/tree_small.jpg"]
    cfg_split = dataclasses.replace(DEFAULT_CONFIG, storage_dtype="split")
    for image in images:
        img = load_gray(image, "cv2")
        k32, _ = extract(img, config=DEFAULT_CONFIG)
        ksp, _ = extract(img, config=cfg_split)
        name = image.rsplit("/", 1)[-1]
        print(f"== {name}: f32 {len(k32)} kps, split {len(ksp)} kps")
        a, b = rows_key(k32), rows_key(ksp)
        ua, ub = set(a), set(b)
        print(f"detection (unique x,y,size,resp): f32 {len(ua)} split "
              f"{len(ub)} | identical: {ua == ub}")
        if ua != ub:
            print(f"  only-f32: {len(ua - ub)}  only-split: {len(ub - ua)}")
        from collections import Counter

        ca, cb = Counter(a), Counter(b)
        flips = {k for k in (ca.keys() | cb.keys()) if ca[k] != cb[k]}
        print(f"emission multiplicity diffs (orientation-peak flips): "
              f"{len(flips)} position(s), "
              f"{sum(abs(ca[k] - cb[k]) for k in flips)} emission(s)")


if __name__ == "__main__":
    main()
