"""Distribution subsystem: device meshes, sharded extraction, halo-exchange
spatial blurs, and the ring-streamed matcher (all new vs the reference, which
is single-threaded — SURVEY.md §2.3)."""

from .mesh import make_mesh, frames_sharding  # noqa: F401
from .extract import extract_batch_dp  # noqa: F401
from .ring import ring_match  # noqa: F401
from .pipeline import extract_match_step  # noqa: F401
from .stream import stream_extract, stream_extract_paths  # noqa: F401
