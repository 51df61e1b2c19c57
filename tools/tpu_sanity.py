"""On-TPU end-to-end sanity: full extract on bird_small with the Pallas path
vs the forced-XLA path vs expectations. Run on the chip.
Usage: python tools/tpu_sanity.py
"""

import dataclasses
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    import jax

    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.io.image import load_gray
    from sift_features_tpu.models import extractor

    img = load_gray("/root/reference/images/bird_small.jpg", "cv2")
    cfg_p = DEFAULT_CONFIG
    cfg_x = dataclasses.replace(DEFAULT_CONFIG, use_pallas=False)

    t0 = time.perf_counter()
    kp, dp = extractor.extract(img, config=cfg_p)
    t_p = time.perf_counter() - t0
    t0 = time.perf_counter()
    kx, dx = extractor.extract(img, config=cfg_x)
    t_x = time.perf_counter() - t0
    print(f"pallas: {len(kp)} kps ({t_p:.1f}s incl compile) | "
          f"xla: {len(kx)} kps ({t_x:.1f}s incl compile)")
    n = min(len(kp), len(kx))
    if len(kp) == len(kx):
        d = np.abs(kp - kx)
        print("kp max |diff| [x y size ang resp]:", d.max(axis=0))
        rows = (dp == dx).all(axis=1).mean()
        byte1 = (np.abs(dp.astype(int) - dx.astype(int)) <= 1).mean()
        print(f"desc rows byte-exact: {rows:.4f}; bytes within +-1: {byte1:.5f}")
    else:
        print("COUNT MISMATCH")
        for a, b in [(kp, kx)]:
            print(a[:5])
            print(b[:5])


if __name__ == "__main__":
    main()
