"""REAL multi-process jax.distributed test (SURVEY.md §5.8).

Spawns two OS processes that form a Gloo-backed process group
(runner.init_distributed), build a cross-process 4-device mesh (2 local CPU
devices per process), and run the ring matcher with ppermute hops that
actually cross the process boundary. Results must equal the dense
single-process matcher bit for bit.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["SIFT_REPO"])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sift_features_tpu.parallel.runner import init_distributed, barrier
from sift_features_tpu.parallel.ring import _ring_body
from sift_features_tpu.ops.matcher import match_brute_force

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
idx = init_distributed(f"localhost:{port}", nproc, pid)
assert idx == pid, (idx, pid)
barrier(timeout_s=120.0)

rng = np.random.RandomState(4)
T = Q = 64                       # 16 rows per device
d_train = rng.randint(0, 256, (T, 128)).astype(np.uint8)
d_query = rng.randint(0, 256, (Q, 128)).astype(np.uint8)
tv = np.ones(T, bool); qv = np.ones(Q, bool)

mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
n = mesh.shape["data"]
shard2d = NamedSharding(mesh, P("data", None))
shard1d = NamedSharding(mesh, P("data"))

def glob(a, sh):
    nloc = a.shape[0] // nproc
    return jax.make_array_from_process_local_data(
        sh, a[pid * nloc:(pid + 1) * nloc])

qg = glob(d_query, shard2d); qvg = glob(qv, shard1d)
tg = glob(d_train, shard2d); tvg = glob(tv, shard1d)

@jax.jit
def run(q, qv_, t, tv_):
    return jax.shard_map(
        lambda a, b, c, d: _ring_body(a, b, c, d, "data", n, T // n),
        mesh=mesh, in_specs=(P("data", None), P("data"), P("data", None), P("data")),
        out_specs=(P("data"), P("data"), P("data")))(q, qv_, t, tv_)

bt, bd, keep = run(qg, qvg, tg, tvg)
from jax.experimental import multihost_utils
bt = multihost_utils.process_allgather(bt, tiled=True)
bd = multihost_utils.process_allgather(bd, tiled=True)
keep = multihost_utils.process_allgather(keep, tiled=True)

m = match_brute_force(d_train, d_query)      # dense local reference
qi = np.nonzero(np.asarray(keep))[0]
assert np.array_equal(qi, m.query_idx), (qi, m.query_idx)
assert np.array_equal(np.asarray(bt)[qi], m.train_idx)
assert np.array_equal(np.asarray(bd)[qi].astype(np.float32), m.distance)
print(f"proc {pid} OK ({len(qi)} matches, ring hops crossed processes)",
      flush=True)
"""


@pytest.mark.mid
def test_two_process_ring_match(tmp_path):
    wpath = tmp_path / "worker.py"
    wpath.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ, SIFT_REPO=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, str(wpath), str(i), "2", port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "OK" in out, out[-2000:]
