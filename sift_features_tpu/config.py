"""Algorithm configuration for the TPU-native SIFT engine.

The reference (sift-features, /root/reference/src/lib.rs:92-113,179-193,297,516,
798,954,978) hard-codes every algorithm parameter as a compile-time const; the
constants ARE the OpenCV-compatibility spec. We expose them as a frozen dataclass
so they are pinned by parity tests but still introspectable/overridable for
experimentation. Changing any default breaks OpenCV/golden parity.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class SiftConfig:
    # --- scale space (lib.rs:92, 179-193) ---
    scales_per_octave: int = 3
    sigma_in: float = 0.5          # assumed blur of the input image
    sigma_min: float = 0.8         # blur level of the seed image
    inv_delta_min: int = 2         # seed image is a 2x upsample
    delta_min: float = 0.5

    # --- detection (lib.rs:93-100, 516) ---
    contrast_threshold: float = 0.04
    edge_threshold: float = 10.0
    image_border: int = 5
    max_interpolation_steps: int = 5

    # --- orientation assignment (lib.rs:96-104, 297) ---
    n_orientation_bins: int = 36
    lambda_ori: float = 1.5
    orientation_localmax_ratio: float = 0.8

    # --- descriptor (lib.rs:105-112, 798, 954, 978) ---
    lambda_descr: float = 3.0
    descriptor_n_histograms: int = 4
    descriptor_n_bins: int = 8
    descriptor_magnitude_cap: float = 0.2
    descriptor_l2_norm: float = 512.0

    # --- fixed-shape capacities (TPU-only; no reference analog) ---
    # Max raw discrete extrema per octave kept for refinement. Dense scans on the
    # test images yield O(1e3) per octave; capacity overflows are detected and
    # surfaced by the pipeline.
    # NOTE: buffer capacities have 128-lane granularity — the effective
    # candidate capacity is this value rounded UP to a multiple of 128 (e.g.
    # 100 -> 128 candidates kept before scan-order truncation).
    max_candidates_per_octave: int = 32768
    # Max emitted keypoints (across orientations) per octave. 16384 covers
    # the feature-dense bench frame (measured 10107+ emissions at octave 0
    # once survivor capacity stopped truncating, tools/stage_counts.py).
    max_keypoints_per_octave: int = 16384
    # Max total keypoints for the whole image (global output buffer).
    max_keypoints: int = 32768
    # Use hand-written Pallas TPU kernels for the gather-heavy stages
    # (orientation histograms, descriptors). Numerically equivalent to the
    # XLA path at f32; ignored (falls back to XLA) on CPU.
    use_pallas: bool = True
    # Dtype of the WINDOW-GATHER copy of Gaussian levels 1-3 in the fused
    # TPU path: "float32" (default, descriptor bit-parity) or "bfloat16"
    # (halves the orientation/descriptor window DMA; the f32 blur chain,
    # DoG, extrema and Newton refinement are untouched, so the DETECTED
    # keypoint set is bit-identical — only descriptor bytes/angles drift by
    # the bf16 rounding of the sampled pixels; deltas measured in BENCH.md).
    gather_dtype: str = "float32"
    # End-to-end pyramid STORAGE dtype on the fused TPU path: "bfloat16"
    # stores the Gaussian + DoG stacks in bf16 (tap/Newton/window ARITHMETIC
    # stays f32 — kernels upcast on load). Halves pyramid HBM traffic but is
    # NOT a parity mode: bf16 DoG quantization perturbs the Newton
    # refinement's central-difference Hessians (measured round 2: large
    # keypoint losses); deltas are tabled in BENCH.md. Tile-grouped
    # refinement requires f32, so this mode takes the per-step refine path.
    # "split" (round 4 design, round 5 proof) stores only the GAUSSIAN
    # stack bf16 (orientation/descriptor windows) and keeps the DoG f32
    # from the unrounded in-VMEM f32 chain — everything DETECTION reads is
    # bit-exact vs f32 (proven on TPU: identical unique (x,y,size,response)
    # sets on bird_small AND tree_small, tools/check_split_detection.py;
    # e2e interpret test test_detect_octave_split_storage_detection_set).
    # Only orientation-peak emission multiplicities flip (bf16 windows:
    # 2/194 resp. 34/1035 positions) and descriptor bytes drift. Round-5
    # bench: 10.66 vs 10.72 fps — NO throughput win on this chip (the
    # fused kernel already keeps the chain in VMEM; halved Gaussian stores
    # are offset by bf16 window-alignment overhead), so f32 stays the
    # default and split remains an opt-in HBM-footprint knob. Details in
    # BENCH.md round 5.
    storage_dtype: str = "float32"
    # Newton-refinement kernel strategy on TPU: "tile" = tile-grouped kernel
    # (all 5 steps from VMEM-resident DoG windows, one launch; escapes fall
    # back to the per-step kernel), "step" = per-candidate per-step DMA
    # kernel only, "region" = region-grouped step kernels (co-located
    # candidates share one window DMA; dense vectorized solve + one-hot MXU
    # extraction) with the per-step kernel for the sparse later steps,
    # "walk" = whole loop in one launch: region-shared (n_dog, 48, 512)
    # windows + dense per-cell fields for ALL scales + a BK-wide vectorized
    # walk (no per-candidate loop anywhere; escapes fall back to "step").
    # Identical outputs for all modes. Default is the best MEASURED mode on
    # the dev chip (round-3 sweep, 1080p density / 32k candidates:
    # walk 0.468 us/cand, region(5 steps) 0.608, region(1) 0.818,
    # per-step 0.960, tile 1.371 — the shared all-scales window DMAs +
    # fully vectorized walk win decisively).
    refine_mode: str = "walk"
    # With refine_mode="region": how many leading Newton steps use the
    # region-grouped kernel before falling back to the per-candidate skip
    # kernel (inactive lanes sort to the end, so sparse later steps compact
    # into few blocks; measured active fractions 100/28/8.5/2.6/1.3% over
    # steps 1-5 at bench density). 1..max_interpolation_steps. Default = 5,
    # the best measured sub-setting of region mode (round-3 sweep: region(5)
    # 0.608 us/cand vs region(1) 0.818).
    region_steps: int = 5
    # Orientation/descriptor window kernel strategy on TPU: "packed" = lane-
    # packed kernels (p = 128//window windows per vector register — buckets
    # too wide to pack fall back per-kernel), "perkey" = one window per
    # register. Identical results; "packed" amortizes the VPU bin-reduction
    # loops that dominate these stages.
    window_kernel: str = "packed"

    @property
    def descriptor_size(self) -> int:
        return self.descriptor_n_histograms ** 2 * self.descriptor_n_bins

    @property
    def n_scale_images(self) -> int:
        """Gaussian images per octave (lib.rs:218-221)."""
        return self.scales_per_octave + 3

    @property
    def n_dog_images(self) -> int:
        return self.scales_per_octave + 2

    @property
    def seed_sigma(self) -> float:
        """Pre-blur applied to the 2x-upsampled seed image (lib.rs:207)."""
        return math.sqrt(self.sigma_min ** 2 - self.sigma_in ** 2) * self.inv_delta_min

    def octave_sigmas(self) -> list[float]:
        """Incremental blur sigmas within an octave, Eq. (7) of IPOL'14
        (lib.rs:220-229). Index 0 is unused (seed/base image of the octave).

        Uses LLVM-powi (square-and-multiply) semantics for m.powi(s-1) so the
        f64 sigma values are bit-identical to the reference's; they feed the
        Gaussian kernel generation, where last-ULP differences would propagate
        through five chained blurs per octave.
        """

        def powi(x: float, n: int) -> float:
            if n < 0:
                return 1.0 / powi(x, -n)
            r, b = 1.0, x
            while n:
                if n & 1:
                    r = r * b
                b = b * b
                n >>= 1
            return r

        m = 2.0 ** (2.0 / self.scales_per_octave)
        out = []
        for s in range(self.scales_per_octave + 3):
            a = powi(m, s - 1)
            b = a * m
            out.append(math.sqrt(b - a) * self.sigma_min * self.inv_delta_min)
        return out

    def n_octaves(self, height: int, width: int) -> int:
        """Number of octaves for a seed image of (height, width)
        (lib.rs:133-134). Uses f32 log2 + round-half-away like the reference."""
        import numpy as np

        min_axis = np.float32(min(width, height))
        v = np.float32(np.log2(min_axis)) - np.float32(2.0)
        # Rust f32::round = half away from zero; values here are positive.
        return int(np.floor(v + np.float32(0.5))) + 1


DEFAULT_CONFIG = SiftConfig()
