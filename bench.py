"""Headline benchmark: 1080p extract + match, frames/s per chip.

Runs the full TPU pipeline (seed -> pyramid -> detect -> orient -> describe)
on a batch of 1920x1080 gray frames plus brute-force cross-check matching of
consecutive frames' top descriptors (the serving workload; BASELINE.md
target: >= 500 frames/s/chip). Prints ONE JSON line.

Input frames are built from the reference repo's real images (tiled to
1080p) so keypoint density is realistic; falls back to synthetic texture if
the reference images are unavailable.
"""

import json
import os
import sys
import time

import numpy as np



def _enable_compile_cache():
    """Persistent XLA compilation cache (works with this backend; verified):
    repeat bench/driver runs skip the multi-minute remote compiles."""
    from sift_features_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()


def make_frames(b: int, h: int = 1080, w: int = 1920) -> np.ndarray:
    path = "/root/reference/images/tree.jpg"
    if os.path.exists(path):
        from sift_features_tpu.io.image import load_gray

        base = load_gray(path, "cv2")
    else:
        rng = np.random.RandomState(0)
        base = (rng.rand(600, 800) * 255).astype(np.uint8)
    ty = -(-h // base.shape[0])
    tx = -(-w // base.shape[1])
    tiled = np.tile(base, (ty, tx))[:h, :w]
    return np.stack([np.roll(tiled, 7 * i, axis=1) for i in range(b)])


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.models.extractor import extract_batch
    from sift_features_tpu.ops.matcher import _match_jit

    platform = jax.devices()[0].platform
    b = int(os.environ.get("BENCH_BATCH", "4"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    n_match = 1024
    if platform == "cpu":  # no TPU available: keep the run short
        b, iters = 1, 2

    frames = make_frames(b)
    cfg = DEFAULT_CONFIG
    if os.environ.get("BENCH_BF16") == "1":
        import dataclasses

        cfg = dataclasses.replace(cfg, gather_dtype="bfloat16")
    if os.environ.get("BENCH_STORAGE_BF16") == "1":
        import dataclasses

        cfg = dataclasses.replace(cfg, storage_dtype="bfloat16")
    if os.environ.get("BENCH_STORAGE"):
        import dataclasses

        cfg = dataclasses.replace(cfg,
                                  storage_dtype=os.environ["BENCH_STORAGE"])
    if os.environ.get("BENCH_REFINE_MODE"):
        import dataclasses

        cfg = dataclasses.replace(cfg,
                                  refine_mode=os.environ["BENCH_REFINE_MODE"])
    if os.environ.get("BENCH_WINDOW_KERNEL"):
        import dataclasses

        cfg = dataclasses.replace(
            cfg, window_kernel=os.environ["BENCH_WINDOW_KERNEL"])

    def step(imgs):
        res = extract_batch(imgs, cfg)
        resp = jnp.where(res["valid"], res["kps"][..., 4], -jnp.inf)
        _, top = jax.lax.top_k(resp, n_match)
        desc = jnp.take_along_axis(res["desc"], top[..., None], axis=1)
        # match consecutive frames (i -> i+1 mod B): queries frame i,
        # train frame i+1
        d = desc.astype(jnp.float32)
        bt, dist, keep = jax.vmap(
            lambda dt, dq: _match_jit(dt, dq, True))(jnp.roll(d, -1, axis=0), d)
        return res["kps"], res["desc"], res["valid"], bt, dist, keep

    # NOTE on timing: on this backend block_until_ready returns before device
    # execution finishes (verified: it reports 100x the chip's peak FLOPs on
    # a calibration matmul), so every iteration must be synced by an actual
    # host transfer of a (tiny) output-derived scalar.
    def fingerprint(out):
        return out[2].sum(dtype=jnp.int32) + out[5][0].sum(dtype=jnp.int32)

    imgs = jnp.asarray(frames)
    out = step(imgs)  # compile + warmup (extract_batch jits internally)
    int(fingerprint(out))
    out = step(imgs)
    int(fingerprint(out))

    t0 = time.perf_counter()
    s = None
    for _ in range(iters):
        out = step(imgs)
        s = fingerprint(out)
    int(s)  # device executes in order: last completion implies all done
    dt = time.perf_counter() - t0

    fps = b * iters / dt
    n_kp = int(np.asarray(out[2]).sum()) // b

    # capacity-overflow audit: the fixed-shape pipeline truncates when a
    # stage's true count exceeds its static capacity (round-3 silently
    # clipped 27% of octave-0 survivors at this density); surface any
    # octave where that happens so the kps_per_frame figure is honest
    overflow = None
    try:
        from sift_features_tpu.models.extractor import _octave_capacities

        res0 = extract_batch(imgs, cfg)
        hh, ww = frames.shape[1] * 2, frames.shape[2] * 2
        ovf = []
        for o in range(np.asarray(res0["n_candidates"]).shape[1]):
            caps = dict(zip(("n_candidates", "n_survivors", "n_emitted"),
                            _octave_capacities(hh, ww, cfg)))
            for name, cap in caps.items():
                v = int(np.asarray(res0[name][:, o]).max())
                if v > cap:
                    ovf.append(f"oct{o}:{name[2:]} {v}>{cap}")
            hh, ww = hh // 2, ww // 2
        overflow = ovf or None
    except Exception as e:
        overflow = [f"audit error: {repr(e)[:120]}"]

    # budgeted variant (C15, lib.rs:156-161): response top-K BEFORE the
    # descriptor stage — the serving configuration (the repo's budget sweep
    # shows budget <= 2k also improves match quality, BENCH.md)
    budget = int(os.environ.get("BENCH_BUDGET", "2048"))
    fps_budget = None
    if budget > 0:
        def step_b(imgs):
            res = extract_batch(imgs, cfg, features_limit=budget)
            k = min(n_match, budget)
            d = res["desc"][:, :k].astype(jnp.float32)
            bt, dist, keep = jax.vmap(
                lambda dt, dq: _match_jit(dt, dq, True))(
                jnp.roll(d, -1, axis=0), d)
            return res["kps"], res["desc"], res["valid"], bt, dist, keep

        out_b = step_b(imgs)
        int(fingerprint(out_b))
        out_b = step_b(imgs)
        int(fingerprint(out_b))
        t0 = time.perf_counter()
        s = None
        for _ in range(iters):
            out_b = step_b(imgs)
            s = fingerprint(out_b)
        int(s)
        fps_budget = round(b * iters / (time.perf_counter() - t0), 2)

    # streaming end-to-end variant (BENCH_STREAM=1): JPEG files -> native
    # threaded decode pool -> H2D -> device extract -> host readback, with
    # `depth` batches in flight (parallel/stream.py). Timing here is honest
    # by construction: every yielded batch is an actual host transfer.
    stream_fps = None
    if os.environ.get("BENCH_STREAM") == "1":
        try:
            import shutil
            import tempfile

            from sift_features_tpu.io.native_output import write_jpeg
            from sift_features_tpu.parallel.stream import stream_extract_paths

            d = tempfile.mkdtemp(prefix="bench_stream_")
            try:
                paths = []
                for i in range(b * iters):
                    p = os.path.join(d, f"f{i:03d}.jpg")
                    write_jpeg(p, frames[i % b])
                    paths.append(p)
                hw = frames.shape[1:]
                # warmup (compile) on one batch
                for _ in stream_extract_paths(paths[:b], b, hw, cfg,
                                              features_limit=budget or None):
                    pass
                t0 = time.perf_counter()
                got = 0
                for batch_out in stream_extract_paths(
                        paths, b, hw, cfg, features_limit=budget or None):
                    got += len(batch_out)
                stream_fps = round(got / (time.perf_counter() - t0), 2)
            finally:
                shutil.rmtree(d, ignore_errors=True)
        except Exception as e:  # report, never kill the bench record
            stream_fps = f"error: {repr(e)[:160]}"

    # reference point: OpenCV SIFT on this host's CPU, same frame (the
    # reference crate benches head-to-head against cv2.SIFT, benches/sift.rs)
    cv2_fps = None
    if os.environ.get("BENCH_SKIP_CV2") != "1":
        try:
            import cv2

            sift = cv2.SIFT_create()
            sift.detectAndCompute(frames[0], None)  # warmup
            best = float("inf")
            for _ in range(3):  # best-of-3: host-load robust (VERDICT r2 w4)
                t0 = time.perf_counter()
                sift.detectAndCompute(frames[0], None)
                best = min(best, time.perf_counter() - t0)
            cv2_fps = round(1.0 / best, 3)
        except Exception:
            pass

    hbm_gbps = None
    if os.environ.get("BENCH_HBM") == "1":
        x = jnp.ones((64 * 1024 * 1024 // 512, 128), jnp.float32)
        fcopy = jax.jit(lambda a: a * np.float32(1.0001))
        float(fcopy(x).ravel()[0])
        t0 = time.perf_counter()
        s = None
        for _ in range(8):
            s = fcopy(x).ravel()[0]
        float(s)
        hbm_gbps = round(8 * 2 * x.size * 4 / (time.perf_counter() - t0) / 1e9, 1)

    # automated Pallas<->XLA parity gate (VERDICT r2 item 5): the fused
    # Pallas pipeline and the forced-XLA pipeline must produce byte-equal
    # descriptors on a real image; a kernel regression shows up here in the
    # driver-recorded bench JSON rather than in a manually-run tool
    parity = None
    if (platform == "tpu" and os.environ.get("BENCH_PARITY", "1") != "0"
            and os.path.exists("/root/reference/images/bird_small.jpg")):
        try:
            import dataclasses

            from sift_features_tpu.io.image import load_gray
            from sift_features_tpu.models import extractor

            pimg = load_gray("/root/reference/images/bird_small.jpg", "cv2")
            kp, dp = extractor.extract(pimg, config=cfg)
            kx, dx = extractor.extract(
                pimg, config=dataclasses.replace(cfg, use_pallas=False))
            used = np.zeros(len(kx), bool)
            matched = exact = 0
            for i in range(len(kp)):
                d = (np.abs(kx[:, :3] - kp[i, :3]).sum(1)
                     + np.where(used, 1e9, 0))
                j = int(np.argmin(d))
                a = abs(float(kx[j, 3] - kp[i, 3]))
                if d[j] < 1e-3 and min(a, 360 - a) < 5:
                    used[j] = True
                    matched += 1
                    exact += int((dp[i] == dx[j]).all())
            parity = {
                "kps": [len(kp), len(kx)], "matched": matched,
                "byte_exact": exact,
            }
        except Exception as e:  # report, never kill the bench record
            parity = {"error": repr(e)[:200]}

    rec = {
        "metric": "1080p_extract_match_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 500.0, 4),
        "platform": platform,
        "batch": b,
        "kps_per_frame": n_kp,
        "cv2_cpu_fps": cv2_fps,
    }
    if overflow is not None:
        rec["capacity_overflow"] = overflow
    if fps_budget is not None:
        rec[f"budget_{budget}_fps"] = fps_budget
    if stream_fps is not None:
        rec["stream_e2e_fps"] = stream_fps
    if parity is not None:
        rec["pallas_xla_parity"] = parity
    if hbm_gbps is not None:
        rec["measured_hbm_gbps"] = hbm_gbps
    print(json.dumps(rec))


if __name__ == "__main__":
    sys.exit(main())
