"""Golden-anchor decoder sweep (VERDICT r2 item 8): find the libjpeg decode
variant that best reproduces the reference's zune-jpeg-decoded pixels, as
measured by oracle-vs-golden keypoint correspondence, so the golden test can
pin it and raise its floor.

Sweeps DCT method (islow/ifast/float) x chroma upsampling (fancy/plain) via
the native loader's option bits (sift_loader.cpp decode options), always with
BT.709 truncating luma (the image crate's grayscale()), on bird_small and
tree_small. Prints one line per variant and a WINNER line.

Usage: python tools/decoder_sweep.py [image_name ...]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def correspondence(kps, desc, g_kps, g_desc):
    used = np.zeros(len(kps), bool)
    corr = 0
    for g in g_kps:
        d = np.hypot(kps[:, 0] - g[0], kps[:, 1] - g[1])
        ang = np.minimum(np.abs(kps[:, 3] - g[3]),
                         360 - np.abs(kps[:, 3] - g[3]))
        ok = (d < 0.5) & (np.abs(kps[:, 2] - g[2]) < 0.05 * g[2]) \
            & (ang < 2.0) & ~used
        if ok.any():
            j = np.where(ok)[0][np.argmin(d[ok])]
            used[j] = True
            corr += 1
    return corr / len(g_kps)


def main():
    import ctypes

    from sift_features_tpu.io import native_loader
    from sift_features_tpu.io.snapshots import load_golden
    from sift_features_tpu.oracle import oracle

    names = sys.argv[1:] or ["bird_small", "tree_small"]
    lib = native_loader._get_lib()

    def decode(path, dct, plain):
        opts = (dct | (4 if plain else 0)) << 8
        buf = np.zeros((2048, 2048), np.uint8)
        h, w = ctypes.c_int(), ctypes.c_int()
        rc = lib.sl_decode_gray(
            path.encode(), buf.ctypes.data_as(ctypes.c_void_p),
            ctypes.byref(h), ctypes.byref(w), 2048, 2048,
            native_loader._LUMA["bt709"] | opts)
        assert rc == 0, rc
        return buf[:h.value, :w.value].copy()

    best = {}
    for name in names:
        path = f"/root/reference/images/{name}.jpg"
        g_kps, g_desc = load_golden("/root/reference", name)
        for dct, dname in [(0, "islow"), (1, "ifast"), (2, "float")]:
            for plain in (False, True):
                img = decode(path, dct, plain)
                kps, desc = oracle.sift(img)
                frac = correspondence(kps, desc, g_kps, g_desc)
                tag = f"{dname}{'-plain' if plain else '-fancy'}"
                print(f"{name} {tag}: corr {frac:.4f} ({len(kps)} kps)",
                      flush=True)
                key = (dct, plain)
                best.setdefault(key, []).append(frac)
    if len(names) > 1:
        for key, fr in sorted(best.items(),
                              key=lambda kv: -float(np.mean(kv[1]))):
            print("variant", key, "mean", round(float(np.mean(fr)), 4),
                  [round(f, 4) for f in fr])


if __name__ == "__main__":
    main()
