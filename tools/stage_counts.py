"""Print per-octave candidate/survivor/emission counts + static capacities
for the bench frames (and optionally any image). The fixed-shape pipeline's
per-candidate stage costs scale with CAPACITY, not with the real counts —
this tool shows where capacity >> reality so _octave_capacities can be
right-sized with evidence. Run on the chip: python tools/stage_counts.py
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    from sift_features_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from bench import make_frames
    from sift_features_tpu.config import DEFAULT_CONFIG as cfg
    from sift_features_tpu.models.extractor import (_octave_capacities,
                                                    extract_batch)

    b = int(os.environ.get("BENCH_BATCH", "4"))
    frames = jnp.asarray(make_frames(b))
    res = extract_batch(frames, cfg)
    n_cand = np.asarray(res["n_candidates"])    # (B, n_oct)
    n_surv = np.asarray(res["n_survivors"])
    n_emit = np.asarray(res["n_emitted"])
    h, w = frames.shape[1] * 2, frames.shape[2] * 2
    print(f"{'oct':>3} {'h x w':>12} {'K':>7} {'K2':>6} {'M':>6} "
          f"{'cand(max/B)':>12} {'surv(max/B)':>12} {'emit(max/B)':>12}")
    for o in range(n_cand.shape[1]):
        K, K2, M = _octave_capacities(h, w, cfg)
        print(f"{o:>3} {h:>5}x{w:<6} {K:>7} {K2:>6} {M:>6} "
              f"{int(n_cand[:, o].max()):>12} {int(n_surv[:, o].max()):>12} "
              f"{int(n_emit[:, o].max()):>12}")
        h, w = h // 2, w // 2


if __name__ == "__main__":
    main()
