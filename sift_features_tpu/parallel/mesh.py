"""Device-mesh construction for the TPU engine.

The reference has zero parallelism (SURVEY.md §2.3); distribution here is a
first-class new subsystem. Two mesh axes cover the domain's parallelism:

  data  — frames (the primary throughput axis: batch of images per step)
  space — rows of a single frame's pyramid (latency axis: halo-exchange
          convolutions when one frame's working set exceeds a core's VMEM)

The descriptor-database ("tensor parallel" analog) sharding for matching uses
the flattened mesh — see parallel/ring.py.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_space: int = 1,
              devices=None) -> Mesh:
    """Build a (data, space) mesh. Defaults to all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_space
    n = n_data * n_space
    if n > len(devices):
        raise ValueError(f"mesh {n_data}x{n_space} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(n_data, n_space)
    return Mesh(arr, ("data", "space"))


def frames_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a (B, H, W) frame batch: frames over data, rows over
    space."""
    return NamedSharding(mesh, P("data", "space", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
