"""sift_features_tpu — a TPU-native SIFT / feature-matching engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
`sift-features` Rust crate (OpenCV-`feature2d`-compatible SIFT): scale-space
pyramids, DoG extrema detection with subpixel refinement, orientation
assignment, 128-D u8 descriptors, and brute-force L2 cross-check matching —
designed dense/batched/fixed-shape for TPUs and sharded across device meshes.

Public surface (mirrors the reference's five entry points, lib.rs:71-177,
plus the matcher the reference delegates to OpenCV):

    sift(img, features_limit=None)            — full extraction (TPU path)
    SiftConfig                                — the frozen parameter spec
    match_descriptors(d1, d2, cross_check=True)
    oracle.sift(...)                          — exact-semantics CPU oracle
"""

from .config import DEFAULT_CONFIG, SiftConfig  # noqa: F401

__version__ = "0.1.0"


def sift(img, features_limit=None, config=DEFAULT_CONFIG):
    """Extract SIFT keypoints + descriptors with the TPU (JAX) pipeline.

    img: (H,W) uint8 grayscale numpy array.
    Returns a SiftResult with keypoints (N,5) f32 [x,y,size,angle,response]
    in original-image coordinates and descriptors (N,128) u8.
    """
    from .models.extractor import extract

    return extract(img, features_limit=features_limit, config=config)


def match_descriptors(d1, d2, cross_check=True):
    """Brute-force L2 matching (BFMatcher NORM_L2 crossCheck analog)."""
    from .ops.matcher import match_brute_force

    return match_brute_force(d1, d2, cross_check=cross_check)


def descriptor_index(db=None, mesh=None, axis_name="data"):
    """Queryable descriptor-database service (extract -> index -> query);
    see sift_features_tpu.service.DescriptorIndex."""
    from .service import DescriptorIndex

    return DescriptorIndex(db, mesh, axis_name)


def stream(paths, batch, hw, features_limit=None, config=DEFAULT_CONFIG,
           **kw):
    """Streaming serving loop: JPEG files -> per-frame (kps, desc), with
    decode / H2D / device compute / readback overlapped; see
    sift_features_tpu.parallel.stream."""
    from .parallel.stream import stream_extract_paths

    return stream_extract_paths(paths, batch, hw, config,
                                features_limit=features_limit, **kw)
