"""Analytic multi-host scaling model for the extract+match step.

Real N>=2-host runs are impossible in the dev environment (one tunneled
chip), so scaling efficiency is projected from first principles: per-frame
collective bytes are derived from the exact array shapes the pipeline
moves (ring blocks, halo rows, gathers), and overlapped against the
measured per-frame compute time and the interconnect bandwidth. The model
is validated in miniature by tests/test_multiprocess.py (real 2-process
Gloo collectives) and the 8-device virtual-mesh suite.

Interconnect defaults are public v5e figures (jax-ml.github.io/scaling-book):
ICI ~4.5e10 B/s per direction per link x 4 links usable for the 1-D ring;
DCN ~2.5e10 B/s per host.
"""

from __future__ import annotations

import dataclasses


ICI_BPS = 4.5e10          # bytes/s per ICI link direction (v5e)
DCN_BPS = 2.5e10          # bytes/s per host over DCN
DESC_BYTES = 128          # u8 descriptor


@dataclasses.dataclass
class StepTraffic:
    """Per-device, per-step collective byte counts for extract_match_step."""

    ring_bytes: int        # ppermute'd train blocks + column state, all hops
    gather_bytes: int      # final cross-check all_gather
    halo_bytes: int        # spatial-axis halo rows (0 when space=1)

    @property
    def total(self) -> int:
        return self.ring_bytes + self.gather_bytes + self.halo_bytes


def step_traffic(batch: int, n_kps: int, queries_per_frame: int,
                 n_data: int, n_space: int = 1, height: int = 1080,
                 width: int = 1920, halo_rows: int = 16,
                 n_levels: int = 5) -> StepTraffic:
    """Collective bytes per device for one extract_match_step.

    batch: frames per step (global); n_kps: database descriptors per frame
    (the padded-capacity valid count); queries_per_frame: ring query rows.
    Shapes mirror parallel.pipeline.extract_match_step exactly.
    """
    T = batch * n_kps                       # database rows, frame-major
    t_blk = T // n_data
    # each hop ppermutes: u8 block (t_blk,128), f32 col_d, i32 col_q, i32 tag
    per_hop = t_blk * (DESC_BYTES + 4 + 4 + 4)
    ring = n_data * per_hop
    # final all_gather of per-train best-query indices: T i32 per device
    gather = T * 4
    halo = 0
    if n_space > 1:
        # 2 * halo_rows boundary rows per blur level per octave (f32),
        # geometric sum over octaves ~ 4/3 of octave 0
        halo = int(2 * halo_rows * width * 4 * n_levels * 4 / 3)
    return StepTraffic(ring_bytes=ring, gather_bytes=gather, halo_bytes=halo)


def projected_efficiency(fps_per_chip: float, batch: int, n_kps: int,
                         queries_per_frame: int, n_chips: int,
                         link_bps: float = ICI_BPS,
                         n_space: int = 1, overlap: float = 0.0) -> dict:
    """Scaling efficiency projection at n_chips data-parallel workers.

    fps_per_chip: measured single-chip throughput (compute time per frame =
    1/fps). Communication time = per-device collective bytes / link rate;
    `overlap` in [0,1] is the fraction of comm hidden under compute (0 =
    fully exposed, worst case). Efficiency = t_compute/(t_compute+t_comm).
    """
    tr = step_traffic(batch * n_chips, n_kps, queries_per_frame,
                      n_data=n_chips, n_space=n_space)
    t_compute = batch / fps_per_chip               # seconds per local batch
    t_comm = tr.total / link_bps * (1.0 - overlap)
    eff = t_compute / (t_compute + t_comm)
    return {
        "n_chips": n_chips,
        "collective_mb_per_device": round(tr.total / 1e6, 3),
        "t_compute_ms": round(t_compute * 1e3, 2),
        "t_comm_exposed_ms": round(t_comm * 1e3, 3),
        "efficiency": round(eff, 4),
        "aggregate_fps": round(eff * fps_per_chip * n_chips, 1),
    }
