"""On-TPU check: tile / region / region-walk refinement vs the XLA
reference loop.
Usage: python tools/check_tile_refine.py [h w K]            (tile correctness)
       python tools/check_tile_refine.py region [h w K]     (region correctness)
       python tools/check_tile_refine.py walk [h w K]       (walk correctness)
       python tools/check_tile_refine.py bench [h w K iters] (all-mode timing)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from sift_features_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.ops import descriptor as desc_ops
    from sift_features_tpu.ops import extrema as ext_ops
    from sift_features_tpu.ops.pallas.refine_tile_kernel import refine_tile_tpu

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    cfg = DEFAULT_CONFIG
    P = desc_ops.PAD_DESC
    Hp = -(-(h + 2 * P) // 128) * 128
    Wp = -(-(w + 2 * P) // 128) * 128
    rng = np.random.RandomState(5)
    dog = (rng.randn(5, h, w) * 0.05).astype(np.float32)
    dog_p = np.zeros((5, Hp, Wp), np.float32)
    dog_p[:, P:P + h, P:P + w] = dog

    mask = np.asarray(ext_ops.extrema_mask(jnp.asarray(dog), cfg))
    s0, y0, x0 = np.nonzero(mask.reshape(3, h, w))
    k = min(K, len(s0))
    # stride candidates across scan order: cover every tile AND the window
    # chunk-boundary rows (a first-K prefix stays in the top tile)
    pick = np.linspace(0, len(s0) - 1, k).astype(int)
    print(f"{len(s0)} extrema, testing {k}/{K} lanes", flush=True)
    s = np.ones(K, np.int32)
    y = np.full(K, P, np.int32)
    x = np.full(K, P, np.int32)
    s[:k] = s0[pick] + 1
    y[:k] = y0[pick]
    x[:k] = x0[pick]
    valid = np.arange(K) < k

    t0 = time.time()
    out = jax.jit(lambda d, ss, yy, xx, vv: refine_tile_tpu(
        d, ss, yy, xx, vv, P, h, w, cfg))(
        jnp.asarray(dog_p), jnp.asarray(s), jnp.asarray(y + P),
        jnp.asarray(x + P), jnp.asarray(valid))
    out = {kk: np.asarray(v) for kk, v in out.items()}
    print(f"tile kernel ran in {time.time()-t0:.1f}s (incl. compile)",
          flush=True)

    ref = ext_ops.refine(jnp.asarray(dog), jnp.asarray(s), jnp.asarray(y),
                         jnp.asarray(x), jnp.asarray(valid), cfg)
    ref = {kk: np.asarray(v) for kk, v in ref.items()}
    a = valid
    ok_eq = (out["ok"][a] == ref["ok"][a]).mean()
    keep_eq = (out["keep"][a] == ref["keep"][a]).mean()
    conv = a & ref["ok"]
    pos_eq = ((out["s"][conv] == ref["s"][conv])
              & (out["y"][conv] - P == ref["y"][conv])
              & (out["x"][conv] - P == ref["x"][conv])).mean()
    mx = max(np.abs(out[f][conv] - ref[f][conv]).max(initial=0)
             for f in ("off_s", "off_y", "off_x", "response"))
    print(f"ok equal {ok_eq:.4f}  keep equal {keep_eq:.4f}  "
          f"pos equal {pos_eq:.4f}  max field diff {mx:.3e}", flush=True)
    byte_eq = all((out[f][conv] == ref[f][conv]).all()
                  for f in ("off_s", "off_y", "off_x", "response"))
    print("byte-exact fields:", byte_eq, flush=True)
    assert ok_eq == 1.0 and keep_eq == 1.0 and pos_eq == 1.0


def main_region(mode="region"):
    """Region-grouped path (refine_tpu region_steps=5, i.e. every step runs
    the region kernel incl. sparse ones) or the region-walk whole-loop path
    vs the XLA reference loop.
    python tools/check_tile_refine.py {region|walk} [h w K]"""
    import jax
    import jax.numpy as jnp

    from sift_features_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.ops import descriptor as desc_ops
    from sift_features_tpu.ops import extrema as ext_ops

    h = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 1024
    cfg = DEFAULT_CONFIG
    P = desc_ops.PAD_DESC
    Hp = -(-(h + 2 * P) // 128) * 128
    Wp = -(-(w + 2 * P) // 128) * 128
    rng = np.random.RandomState(5)
    dog = (rng.randn(5, h, w) * 0.05).astype(np.float32)
    dog_p = np.zeros((5, Hp, Wp), np.float32)
    dog_p[:, P:P + h, P:P + w] = dog

    mask = np.asarray(ext_ops.extrema_mask(jnp.asarray(dog), cfg))
    s0, y0, x0 = np.nonzero(mask.reshape(3, h, w))
    k = min(K, len(s0))
    pick = np.linspace(0, len(s0) - 1, k).astype(int)
    print(f"{len(s0)} extrema, testing {k}/{K} lanes", flush=True)
    s = np.ones(K, np.int32)
    y = np.full(K, P, np.int32)
    x = np.full(K, P, np.int32)
    s[:k] = s0[pick] + 1
    y[:k] = y0[pick]
    x[:k] = x0[pick]
    valid = np.arange(K) < k

    if mode == "walk":
        from sift_features_tpu.ops.pallas.refine_walk_kernel import (
            refine_walk_tpu)

        fn = lambda d, ss, yy, xx, vv: refine_walk_tpu(          # noqa: E731
            d, ss, yy, xx, vv, P, h, w, cfg)
    else:
        fn = lambda d, ss, yy, xx, vv: ext_ops.refine_tpu(       # noqa: E731
            d, ss, yy, xx, vv, P, h, w, cfg, region_steps=5)
    t0 = time.time()
    out = jax.jit(fn)(
        jnp.asarray(dog_p), jnp.asarray(s), jnp.asarray(y + P),
        jnp.asarray(x + P), jnp.asarray(valid))
    out = {kk: np.asarray(v) for kk, v in out.items()}
    print(f"{mode} path ran in {time.time()-t0:.1f}s (incl. compile)",
          flush=True)

    ref = ext_ops.refine(jnp.asarray(dog), jnp.asarray(s), jnp.asarray(y),
                         jnp.asarray(x), jnp.asarray(valid), cfg)
    ref = {kk: np.asarray(v) for kk, v in ref.items()}
    a = valid
    ok_eq = (out["ok"][a] == ref["ok"][a]).mean()
    keep_eq = (out["keep"][a] == ref["keep"][a]).mean()
    conv = a & ref["ok"]
    pos_eq = ((out["s"][conv] == ref["s"][conv])
              & (out["y"][conv] - P == ref["y"][conv])
              & (out["x"][conv] - P == ref["x"][conv])).mean()
    mx = max(np.abs(out[f][conv] - ref[f][conv]).max(initial=0)
             for f in ("off_s", "off_y", "off_x", "response"))
    print(f"ok equal {ok_eq:.4f}  keep equal {keep_eq:.4f}  "
          f"pos equal {pos_eq:.4f}  max field diff {mx:.3e}", flush=True)
    byte_eq = all((out[f][conv] == ref[f][conv]).all()
                  for f in ("off_s", "off_y", "off_x", "response"))
    print("byte-exact fields:", byte_eq, flush=True)
    assert ok_eq == 1.0 and keep_eq == 1.0 and pos_eq == 1.0


def bench():
    """Timing: tile kernel vs per-step kernel loop at 1080p octave-0 scale.
    python tools/check_tile_refine.py bench [h w K iters]"""
    import jax
    import jax.numpy as jnp

    from sift_features_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.ops import descriptor as desc_ops
    from sift_features_tpu.ops import extrema as ext_ops
    from sift_features_tpu.ops.pallas.refine_tile_kernel import refine_tile_tpu

    h = int(sys.argv[2]) if len(sys.argv) > 2 else 2160
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 3840
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 32768
    iters = int(sys.argv[5]) if len(sys.argv) > 5 else 5
    cfg = DEFAULT_CONFIG
    P = desc_ops.PAD_DESC
    Hp = -(-(h + 2 * P) // 128) * 128
    Wp = -(-(w + 2 * P) // 128) * 128
    if Wp > 1536:
        Wp = -(-Wp // 1024) * 1024
    rng = np.random.RandomState(5)
    # realistic density: tile a textured patch
    base = (rng.randn(5, 270, 480) * 0.05).astype(np.float32)
    dog = np.tile(base, (1, h // 270 + 1, w // 480 + 1))[:, :h, :w]
    dog_p = np.zeros((5, Hp, Wp), np.float32)
    dog_p[:, P:P + h, P:P + w] = dog

    mask = np.asarray(ext_ops.extrema_mask(jnp.asarray(dog), cfg))
    s0, y0, x0 = np.nonzero(mask.reshape(3, h, w))
    k = min(K, len(s0))
    print(f"{len(s0)} extrema, {k}/{K} lanes", flush=True)
    order = np.lexsort((x0, y0, s0))
    s = np.ones(K, np.int32)
    y = np.full(K, P, np.int32)
    x = np.full(K, P, np.int32)
    s[:k] = s0[order][:k] + 1
    y[:k] = y0[order][:k]
    x[:k] = x0[order][:k]
    valid = np.arange(K) < k
    args = (jnp.asarray(dog_p), jnp.asarray(s), jnp.asarray(y + P),
            jnp.asarray(x + P), jnp.asarray(valid))

    def timed(name, fn):
        f = jax.jit(lambda d, ss, yy, xx, vv: jnp.sum(
            fn(d, ss, yy, xx, vv)["response"]))
        float(f(*args))
        t0 = time.time()
        r = None
        for _ in range(iters):
            r = f(*args)
        float(r)
        dt = (time.time() - t0) / iters
        print(f"{name}: {dt*1e3:.2f} ms ({dt/k*1e6:.3f} us/cand)", flush=True)

    timed("tile  ", lambda d, ss, yy, xx, vv: refine_tile_tpu(
        d, ss, yy, xx, vv, P, h, w, cfg))
    timed("step  ", lambda d, ss, yy, xx, vv: ext_ops.refine_tpu(
        d, ss, yy, xx, vv, P, h, w, cfg))
    for rs in (1, 2, 5):
        timed(f"regi{rs} ", lambda d, ss, yy, xx, vv, rs=rs:
              ext_ops.refine_tpu(d, ss, yy, xx, vv, P, h, w, cfg,
                                 region_steps=rs))

    from sift_features_tpu.ops.pallas.refine_walk_kernel import (
        refine_walk_tpu)

    timed("walk  ", lambda d, ss, yy, xx, vv: refine_walk_tpu(
        d, ss, yy, xx, vv, P, h, w, cfg))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "bench":
        bench()
    elif len(sys.argv) > 1 and sys.argv[1] in ("region", "walk"):
        main_region(sys.argv[1])
    else:
        main()
