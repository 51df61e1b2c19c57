"""Descriptor-database persistence (SURVEY.md §5.4).

The reference persists nothing (pure function library); a serving deployment
needs its descriptor database (keypoints + u8 descriptors per frame) to
survive restarts and to be shardable across hosts for the ring matcher. The
format is a plain .npz per shard (frame ids, ragged offsets, keypoints,
descriptors) — host-offloaded storage, no training state.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass
class DescriptorDB:
    """Ragged per-frame keypoint/descriptor store.

    frame_ids: (F,) int64; offsets: (F+1,) int64 into the row axis;
    keypoints: (N, 5) f32 [x, y, size, angle, response]; descriptors:
    (N, 128) u8.
    """

    frame_ids: np.ndarray
    offsets: np.ndarray
    keypoints: np.ndarray
    descriptors: np.ndarray

    @classmethod
    def empty(cls) -> "DescriptorDB":
        return cls(np.zeros(0, np.int64), np.zeros(1, np.int64),
                   np.zeros((0, 5), np.float32), np.zeros((0, 128), np.uint8))

    @classmethod
    def from_batch(cls, res, frame_ids=None) -> "DescriptorDB":
        """Build from an extract_batch result pytree (padded + valid mask)."""
        kps = np.asarray(res["kps"])
        desc = np.asarray(res["desc"])
        valid = np.asarray(res["valid"])
        b = kps.shape[0]
        if frame_ids is None:
            frame_ids = np.arange(b, dtype=np.int64)
        counts = valid.sum(axis=1)
        offsets = np.zeros(b + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        return cls(np.asarray(frame_ids, np.int64), offsets,
                   kps[valid].astype(np.float32), desc[valid])

    def frame(self, i: int):
        lo, hi = self.offsets[i], self.offsets[i + 1]
        return self.keypoints[lo:hi], self.descriptors[lo:hi]

    def extend(self, other: "DescriptorDB") -> "DescriptorDB":
        off = np.concatenate([self.offsets,
                              other.offsets[1:] + self.offsets[-1]])
        return DescriptorDB(
            np.concatenate([self.frame_ids, other.frame_ids]), off,
            np.concatenate([self.keypoints, other.keypoints]),
            np.concatenate([self.descriptors, other.descriptors]))

    def save(self, path: str) -> None:
        np.savez_compressed(path, frame_ids=self.frame_ids,
                            offsets=self.offsets, keypoints=self.keypoints,
                            descriptors=self.descriptors)

    @classmethod
    def load(cls, path: str) -> "DescriptorDB":
        z = np.load(path)
        return cls(z["frame_ids"], z["offsets"], z["keypoints"],
                   z["descriptors"])

    # --- sharded persistence for multi-host serving -----------------------

    def save_sharded(self, directory: str, n_shards: int) -> None:
        """Frame-contiguous shards, one .npz each (shard i owns frames
        i*F/n .. (i+1)*F/n); each host loads only its shard."""
        os.makedirs(directory, exist_ok=True)
        f = len(self.frame_ids)
        bounds = np.linspace(0, f, n_shards + 1).astype(np.int64)
        for s in range(n_shards):
            lo_f, hi_f = bounds[s], bounds[s + 1]
            lo, hi = self.offsets[lo_f], self.offsets[hi_f]
            shard = DescriptorDB(
                self.frame_ids[lo_f:hi_f],
                self.offsets[lo_f:hi_f + 1] - self.offsets[lo_f],
                self.keypoints[lo:hi], self.descriptors[lo:hi])
            shard.save(os.path.join(directory, f"shard_{s:05d}.npz"))

    @classmethod
    def load_shard(cls, directory: str, shard: int) -> "DescriptorDB":
        return cls.load(os.path.join(directory, f"shard_{shard:05d}.npz"))

    @classmethod
    def load_all(cls, directory: str) -> "DescriptorDB":
        names = sorted(n for n in os.listdir(directory)
                       if n.startswith("shard_") and n.endswith(".npz"))
        db = cls.empty()
        for n in names:
            db = db.extend(cls.load(os.path.join(directory, n)))
        return db
