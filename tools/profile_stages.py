"""Per-stage TPU wall-time breakdown at 1080p (pyramid / detect+describe /
match), using the split API. Run on the real chip: python tools/profile_stages.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_frames
    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.models import extractor
    from sift_features_tpu.ops.matcher import _match_jit

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    frames = jnp.asarray(make_frames(b))
    cfg = DEFAULT_CONFIG

    def sync(out):
        # block_until_ready lies on this backend (returns pre-completion);
        # force a host transfer of a scalar derived from every output leaf.
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(leaf.ravel()[0].astype(jnp.float32) for leaf in leaves)
        return float(s)

    def timed(name, fn, *args, iters=8, **kw):
        out = fn(*args, **kw)
        sync(out)
        out = fn(*args, **kw)
        sync(out)
        t0 = time.perf_counter()
        s = None
        for _ in range(iters):
            out = fn(*args, **kw)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(leaf.ravel()[0].astype(jnp.float32) for leaf in leaves)
        float(s)  # in-order execution: last completion implies all done
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:>22s}: {dt * 1e3 / b:8.3f} ms/frame "
              f"({b / dt:7.1f} fps at B={b})")
        return out

    print(f"platform={jax.devices()[0].platform} batch={b}")
    octs, dogs = timed("pyramid", extractor.precompute, frames, cfg)
    res = timed("detect+describe", extractor.extract_with_precomputed,
                octs, dogs, cfg)
    full = timed("fused extract", extractor.extract_batch, frames, cfg)

    resp = jnp.where(full["valid"], full["kps"][..., 4], -jnp.inf)
    _, top = jax.lax.top_k(resp, 1024)
    desc = jnp.take_along_axis(full["desc"], top[..., None], axis=1).astype(jnp.float32)

    def match(d):
        return jax.vmap(lambda dt, dq: _match_jit(dt, dq, True))(
            jnp.roll(d, -1, axis=0), d)

    timed("match 1024x1024", match, desc)
    v = np.asarray(full["valid"])
    print("kps/frame:", v.sum(axis=1))


if __name__ == "__main__":
    main()
