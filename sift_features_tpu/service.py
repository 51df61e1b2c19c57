"""Descriptor-database service: extract -> index -> query (serving layer).

The reference is a pure function library; its implied deployment (the
sift-match / opencv-cross-match examples, examples/sift-match.rs:30-39) is
"extract descriptors from frames, match new queries against the collected
database". This module is that workload as a first-class component: a
queryable index over `io.database.DescriptorDB` whose matching runs on the
MXU — dense single-device (`ops.matcher`) or ring-streamed over a device
mesh (`parallel.ring`, database sharded over chips like ring attention
streams KV blocks; SURVEY.md §5.7).

Typical loop-closure / retrieval usage:

    idx = DescriptorIndex()
    idx.add_frames(frame_batch)                  # extract + index
    m = idx.query(desc_q)                        # global best matches
    idx.save("/data/db"); DescriptorIndex.load("/data/db", mesh=mesh)
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .config import DEFAULT_CONFIG, SiftConfig
from .io.database import DescriptorDB


@dataclasses.dataclass
class QueryResult:
    """Per retained query row: global DB row, owning frame, keypoint index
    within that frame, and L2 distance."""

    query_idx: np.ndarray     # (M,) int  — query descriptor rows
    frame_id: np.ndarray      # (M,) int64 — DB frame owning the best match
    keypoint_idx: np.ndarray  # (M,) int  — keypoint index within that frame
    distance: np.ndarray      # (M,) f32


class DescriptorIndex:
    """Queryable descriptor index with host-offloaded persistence.

    mesh: optional `jax.sharding.Mesh` — queries then run the ring-streamed
    matcher sharded over `axis_name` (u8 descriptors on the wire); without a
    mesh the dense single-device MXU matcher is used. Results are identical
    (tests pin ring == dense exactly)."""

    def __init__(self, db: DescriptorDB | None = None, mesh=None,
                 axis_name: str = "data"):
        self.db = db if db is not None else DescriptorDB.empty()
        self.mesh = mesh
        self.axis_name = axis_name

    # --- build ------------------------------------------------------------

    def add_frames(self, imgs_u8, frame_ids=None,
                   config: SiftConfig = DEFAULT_CONFIG,
                   features_limit: int | None = None) -> None:
        """Extract a (B, H, W) u8 frame batch (budgeted when features_limit
        is set — truncate-before-describe, C15) and append to the index."""
        from .models.extractor import extract_batch

        res = extract_batch(np.asarray(imgs_u8, np.uint8), config,
                            features_limit)
        self.add_batch_result(res, frame_ids)

    def add_batch_result(self, res, frame_ids=None) -> None:
        """Append an extract_batch/extract_match_step result pytree."""
        if frame_ids is None:
            frame_ids = np.arange(len(self.db.frame_ids),
                                  len(self.db.frame_ids)
                                  + np.asarray(res["valid"]).shape[0],
                                  dtype=np.int64)
        self.db = self.db.extend(DescriptorDB.from_batch(res, frame_ids))
        self._row_maps_cache = None

    # --- query ------------------------------------------------------------

    def _row_maps(self):
        """row -> (frame id, keypoint index) maps, cached per DB mutation:
        queries are O(matches), not O(frames) + O(rows)."""
        cached = getattr(self, "_row_maps_cache", None)
        if cached is not None and cached[0] == len(self.db.frame_ids):
            return cached[1], cached[2]
        offs = self.db.offsets
        n = int(offs[-1])
        lens = np.diff(offs).astype(np.int64)
        row_frame = np.repeat(np.asarray(self.db.frame_ids, np.int64), lens)
        row_kp = np.arange(n, dtype=np.int64) - np.repeat(
            offs[:-1].astype(np.int64), lens)
        self._row_maps_cache = (len(self.db.frame_ids), row_frame, row_kp)
        return row_frame, row_kp

    def query(self, desc_q, cross_check: bool = True) -> QueryResult:
        """Match (Q, 128) u8 query descriptors against the whole database.
        Same semantics as BFMatcher(NORM_L2, crossCheck) over the
        concatenated DB (examples/sift-match.rs:30-39)."""
        desc_q = np.asarray(desc_q)
        if len(self.db.descriptors) == 0 or len(desc_q) == 0:
            z = np.zeros(0, np.int64)
            return QueryResult(z, z, z, np.zeros(0, np.float32))
        if self.mesh is not None:
            from .parallel.ring import ring_match

            qi, ti, dist = ring_match(self.db.descriptors, desc_q,
                                      self.mesh, self.axis_name, cross_check)
        else:
            from .ops.matcher import match_brute_force

            m = match_brute_force(self.db.descriptors, desc_q, cross_check)
            qi, ti, dist = m.query_idx, m.train_idx, m.distance
        row_frame, row_kp = self._row_maps()
        return QueryResult(np.asarray(qi), row_frame[ti], row_kp[ti],
                           np.asarray(dist, np.float32))

    def query_image(self, img_u8, config: SiftConfig = DEFAULT_CONFIG,
                    features_limit: int | None = None,
                    cross_check: bool = True):
        """Extract a single gray image and query it: returns (keypoints,
        descriptors, QueryResult)."""
        from .models.extractor import extract

        kps, desc = extract(np.asarray(img_u8, np.uint8), features_limit,
                            config)
        return kps, desc, self.query(desc, cross_check)

    # --- persistence ------------------------------------------------------

    def save(self, directory: str, n_shards: int | None = None) -> None:
        """Host-offload: frame-contiguous .npz shards (one per serving
        host; n_shards defaults to the mesh axis size or 1)."""
        if n_shards is None:
            n_shards = (self.mesh.shape[self.axis_name]
                        if self.mesh is not None else 1)
        self.db.save_sharded(directory, n_shards)

    @classmethod
    def load(cls, directory: str, mesh=None,
             axis_name: str = "data") -> "DescriptorIndex":
        return cls(DescriptorDB.load_all(directory), mesh, axis_name)
