"""Print the multi-host scaling projection table (utils.scaling model).
Usage: python tools/scaling_model.py [fps_per_chip]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sift_features_tpu.utils.scaling import projected_efficiency, ICI_BPS, DCN_BPS


def main():
    fps = float(sys.argv[1]) if len(sys.argv) > 1 else 6.3
    print(f"single-chip fps={fps}, B=4/chip, 14e3 kps/frame, 1024 queries")
    print(f"{'chips':>6} {'link':>5} {'MB/dev':>8} {'comm ms':>8} "
          f"{'eff':>7} {'agg fps':>9}")
    for link, bps in [("ICI", ICI_BPS), ("DCN", DCN_BPS)]:
        for n in (2, 4, 8, 16, 64, 256):
            r = projected_efficiency(fps, 4, 14000, 1024, n, bps)
            print(f"{n:>6} {link:>5} {r['collective_mb_per_device']:>8} "
                  f"{r['t_comm_exposed_ms']:>8} {r['efficiency']:>7} "
                  f"{r['aggregate_fps']:>9}")


if __name__ == "__main__":
    main()
