"""On-TPU check: fused budgeted extraction (truncate-before-describe) vs
unlimited extraction + host-side truncation — keypoints AND descriptor bytes
must match exactly.
Usage: python tools/check_budget.py [image] [budget]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


import numpy as np  # noqa: E402


def main():
    import jax

    from sift_features_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from sift_features_tpu.io.image import load_gray
    from sift_features_tpu.models import extractor

    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/images/bird_small.jpg"
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    img = load_gray(path, "cv2")

    k_all, d_all = extractor.extract(img)
    k_b, d_b = extractor.extract(img, features_limit=budget)
    print(f"unlimited {len(k_all)} kps; budget {budget} -> {len(k_b)} rows",
          flush=True)

    if budget < len(k_all):
        order = np.argsort(-k_all[:, 4], kind="stable")[:budget]
        ref_k, ref_d = k_all[order], d_all[order]
    else:
        ref_k, ref_d = k_all, d_all
    assert np.array_equal(k_b, ref_k), "budgeted keypoints != host truncation"
    eq_rows = (d_b == ref_d).all(axis=1).mean()
    print(f"descriptor rows byte-equal: {eq_rows:.4f}", flush=True)
    assert eq_rows == 1.0, "budgeted descriptors != host truncation"
    print("budget parity OK", flush=True)


if __name__ == "__main__":
    main()
