"""Config-mode parity deltas vs the default f32 pipeline (TPU tool).

Compares any SiftConfig variant against the default config on a real image
and prints keypoint/descriptor deltas in the BENCH.md table format:
counts, position-matched (1e-3 px + size), angle delta quantiles, and
descriptor L2 / byte-exactness over matched pairs.

Usage:
  python tools/check_modes.py gather_dtype=bfloat16
  python tools/check_modes.py storage_dtype=bfloat16
  python tools/check_modes.py refine_mode=walk window_kernel=perkey
  python tools/check_modes.py <field>=<value> ... [--image PATH]
"""

import dataclasses
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def compare(kps_a, desc_a, kps_b, desc_b):
    """Greedy nearest-position matching (a -> b), like the BENCH.md bf16
    table: position tolerance 1e-3 px, same size class."""
    used = np.zeros(len(kps_b), bool)
    matched = []
    for i in range(len(kps_a)):
        d = (np.abs(kps_b[:, :3] - kps_a[i, :3]).sum(1)
             + np.where(used, 1e9, 0))
        j = int(np.argmin(d)) if len(d) else -1
        if j >= 0 and d[j] < 1e-3:
            used[j] = True
            matched.append((i, j))
    print(f"counts: {len(kps_a)} {len(kps_b)}")
    print(f"position-matched {len(matched)}/{len(kps_a)}")
    if not matched:
        return
    mi = np.array([m[0] for m in matched])
    mj = np.array([m[1] for m in matched])
    a = np.abs(kps_a[mi, 3] - kps_b[mj, 3])
    a = np.minimum(a, 360 - a)
    print(f"angle delta: median {np.median(a):.4f} "
          f"p99 {np.percentile(a, 99):.3f} max {a.max():.2f}")
    l2 = np.sqrt(((desc_a[mi].astype(np.float32)
                   - desc_b[mj].astype(np.float32)) ** 2).sum(1))
    exact = int((desc_a[mi] == desc_b[mj]).all(1).sum())
    print(f"desc L2: median {np.median(l2):.2f} p99 "
          f"{np.percentile(l2, 99):.1f}; byte-exact rows "
          f"{exact}/{len(matched)}")


def main():
    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.io.image import load_gray
    from sift_features_tpu.models.extractor import extract
    from sift_features_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    image = "/root/reference/images/bird_small.jpg"
    overrides = {}
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--image":
            image = args[i + 1]
            i += 2
            continue
        k, v = args[i].split("=", 1)
        fields = {f.name: f.type for f in dataclasses.fields(DEFAULT_CONFIG)}
        if k not in fields:
            raise SystemExit(f"unknown SiftConfig field: {k}")
        cur = getattr(DEFAULT_CONFIG, k)
        overrides[k] = type(cur)(v) if not isinstance(cur, bool) \
            else v.lower() in ("1", "true")
        i += 1
    if not overrides:
        raise SystemExit("usage: check_modes.py field=value ... [--image P]")

    img = load_gray(image, "cv2")
    cfg = dataclasses.replace(DEFAULT_CONFIG, **overrides)
    print(f"image={image} overrides={overrides}")
    k32, d32 = extract(img, config=DEFAULT_CONFIG)
    kv, dv = extract(img, config=cfg)
    compare(k32, d32, kv, dv)


if __name__ == "__main__":
    main()
