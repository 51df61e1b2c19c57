"""On-TPU parity: Pallas-kernel extractor vs forced-XLA extractor.
Usage: python tools/parity_pallas.py [image]
"""

import dataclasses
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.io.image import load_gray
    from sift_features_tpu.models import extractor

    path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/images/bird_small.jpg"
    img = load_gray(path, "cv2")
    kp, dp = extractor.extract(img, config=DEFAULT_CONFIG)
    kx, dx = extractor.extract(
        img, config=dataclasses.replace(DEFAULT_CONFIG, use_pallas=False))
    print("counts:", len(kp), len(kx), flush=True)
    used = np.zeros(len(kx), bool)
    dang, dl2, exact = [], [], 0
    for i in range(len(kp)):
        d = np.abs(kx[:, :3] - kp[i, :3]).sum(1) + np.where(used, 1e9, 0)
        j = int(np.argmin(d))
        a = abs(float(kx[j, 3] - kp[i, 3]))
        a = min(a, 360 - a)
        if d[j] < 1e-3 and a < 5:
            used[j] = True
            dang.append(a)
            dl2.append(np.linalg.norm(dp[i].astype(float) - dx[j].astype(float)))
            exact += int((dp[i] == dx[j]).all())
    print(f"matched {len(dang)}/{len(kp)}; angle diff median "
          f"{np.median(dang):.4f} p99 {np.percentile(dang, 99):.3f}")
    print(f"desc L2 median {np.median(dl2):.2f} p99 "
          f"{np.percentile(dl2, 99):.1f}; byte-exact rows {exact}/{len(dang)}")


if __name__ == "__main__":
    main()
