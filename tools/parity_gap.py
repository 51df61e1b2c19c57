"""Attribute the residual oracle-vs-cv2.SIFT keypoint gap (VERDICT r1 weak #3).

For every cv2.SIFT keypoint not reproduced by the oracle at the test
tolerances, classify the failure:
  - 'absent'          : no oracle keypoint within 1 px at the same size class
  - 'position'        : nearest oracle kp >1e-3 px away (but <1 px)
  - 'size'/'response'/'angle': present at the position, field off by > tol
Run: python tools/parity_gap.py [image]
"""

import sys
from collections import Counter

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    import cv2

    from sift_features_tpu.io.image import load_gray
    from sift_features_tpu.oracle import oracle

    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/images/bird_small.jpg"
    img = load_gray(path, "cv2")
    kps, desc = oracle.sift(img)
    s = cv2.SIFT_create(contrastThreshold=0.04, edgeThreshold=10, sigma=1.6)
    ckps, cdesc = s.detectAndCompute(img, None)
    carr = np.array([[k.pt[0], k.pt[1], k.size / 2, k.angle, k.response]
                     for k in ckps], np.float32)
    coct = np.array([(k.octave & 255) - (256 if (k.octave & 255) > 127 else 0)
                     for k in ckps], np.int32)

    cls = Counter()
    details = []
    for i, c in enumerate(carr):
        d = np.hypot(kps[:, 0] - c[0], kps[:, 1] - c[1])
        j = int(np.argmin(d))
        if (d[j] < 1e-3 and abs(kps[j, 2] - c[2]) < 1e-3
                and abs(kps[j, 4] - c[4]) < 1e-4):
            cls["matched"] += 1
            continue
        if d[j] > 1.0:
            cls["absent"] += 1
            details.append(("absent", i, c, None))
        elif d[j] > 1e-3:
            cls["position"] += 1
            details.append(("position", i, c, kps[j]))
        elif abs(kps[j, 2] - c[2]) >= 1e-3:
            cls["size"] += 1
            details.append(("size", i, c, kps[j]))
        elif abs(kps[j, 4] - c[4]) >= 1e-4:
            cls["response"] += 1
            details.append(("response", i, c, kps[j]))
        else:
            cls["other"] += 1
            details.append(("other", i, c, kps[j]))

    total = len(carr)
    print(f"cv2 keypoints: {total}; oracle keypoints: {len(kps)}")
    for k, v in cls.most_common():
        print(f"  {k:>9s}: {v:5d}  ({v / total:.3%})")
    print("\nfirst 12 non-matches:")
    for kind, i, c, o in details[:12]:
        line = (f"  [{kind}] cv2 @({c[0]:8.3f},{c[1]:8.3f}) size {c[2]:7.4f} "
                f"resp {c[4]:.5f} ang {c[3]:7.2f} oct {coct[i]}")
        if o is not None:
            line += (f"\n     oracle @({o[0]:8.3f},{o[1]:8.3f}) size {o[2]:7.4f} "
                     f"resp {o[4]:.5f} ang {o[3]:7.2f}")
        print(line)


if __name__ == "__main__":
    main()
