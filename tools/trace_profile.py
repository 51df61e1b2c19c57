"""Device-level op profile of the full fused pipeline via jax.profiler.

The per-phase microbench tools (refine_breakdown, csort_profile,
window_breakdown) time SEPARATE jits, and on this backend a lone dispatch
carries multi-ms tunnel overhead (tools/dispatch_calib.py: argsort measured
6.25 ms standalone vs ~0.1 ms in-graph) — so their absolute numbers cannot
be trusted to rank IN-GRAPH costs. This tool traces the real single-jit
bench program and aggregates per-op device time from the xplane proto, the
ground truth for where the frame time goes.

Run alone on the chip: python tools/trace_profile.py [batch]
"""

import glob
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from sift_features_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from bench import make_frames
    from sift_features_tpu.config import DEFAULT_CONFIG as cfg
    from sift_features_tpu.models.extractor import _extract_batch_jit

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    frames = jnp.asarray(make_frames(b))
    n_oct = cfg.n_octaves(frames.shape[1] * 2, frames.shape[2] * 2)

    def run():
        out = _extract_batch_jit(frames, n_oct, cfg, None)
        # block_until_ready returns before device completion on this
        # backend (bench.py NOTE) — sync via scalar readback
        float(np.asarray(out["n_candidates"]).sum())
        return out

    run()  # compile + warm
    run()

    log_dir = "/tmp/sift_trace"
    os.system(f"rm -rf {log_dir}")
    jax.profiler.start_trace(log_dir)
    t0 = time.perf_counter()
    for _ in range(3):
        run()
    wall = (time.perf_counter() - t0) / 3
    jax.profiler.stop_trace()
    print(f"wall: {wall * 1e3:.1f} ms/batch ({wall / b * 1e3:.1f} ms/frame)",
          flush=True)

    # aggregate device time per op name from the xplane proto
    files = glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True)
    if not files:
        print("no xplane produced; trace dir:")
        os.system(f"find {log_dir} | head -20")
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    for f in files:
        xs = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            totals = {}
            for line in plane.lines:
                for ev in line.events:
                    meta = plane.event_metadata[ev.metadata_id]
                    totals[meta.name] = (totals.get(meta.name, 0)
                                         + ev.duration_ps)
            rows = sorted(totals.items(), key=lambda kv: -kv[1])[:60]
            tot = sum(totals.values())
            print(f"== plane {plane.name}: total {tot / 1e9 / 3:.2f} "
                  "ms/batch (3 runs)")
            for name, ps in rows:
                print(f"  {ps / 1e9 / 3:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
