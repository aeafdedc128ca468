"""Multi-host process setup — the jax.distributed wrapper layer
(BASELINE.json: "multi-host pod slice ... match flags reduced via ICI
collectives"; DCN spans slices).

The scan itself needs nothing beyond shard_scan.py: `jax.distributed`
initialization makes every host's chips part of one global mesh, and
`make_global_corpus` assembles a globally-sharded corpus from per-host
segment ranges without any host ever materializing the full corpus.
Stateless like the reference — failure recovery is re-running the shard at
the CLI layer (SURVEY.md §5.3), nothing in-library.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.layout import LANES, MIN_KH, _build_cols, round_up
from .mesh import DATA_AXIS, make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX (no-op when single-process).

    On TPU pods the arguments are auto-detected from the environment;
    explicit values support manual/CPU bring-up.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(needle_axis: int = 1) -> Mesh:
    """Mesh over every chip of every host; data axis spans hosts (segment
    shards ride DCN only at the final one-int32-per-needle pmin)."""
    n = jax.device_count()
    if n % needle_axis:
        raise ValueError(f"{n} devices not divisible by needle axis {needle_axis}")
    return make_mesh((n // needle_axis, needle_axis))


def make_global_corpus(
    local_segments: np.ndarray, mesh: Mesh
) -> jax.Array:
    """Assemble a globally segment-sharded corpus from this host's local
    segment block ``(g_local, S+KH, 128)``.  Host i contributes segments
    ``[i*g_local, (i+1)*g_local)`` of the global corpus; no host touches the
    rest."""
    global_g = local_segments.shape[0] * jax.process_count()
    shape = (global_g,) + local_segments.shape[1:]
    sharding = NamedSharding(mesh, P(DATA_AXIS, None, None))
    return jax.make_array_from_process_local_data(
        sharding, local_segments, shape
    )


def local_segment_block(
    local_bytes: bytes, peek: bytes, s: int, kh: int,
    g_local: Optional[int] = None,
) -> np.ndarray:
    """Build this host's cols block ``(g_local, s+kh, 128)`` from its
    contiguous byte range of the global corpus.

    ``local_bytes``: the host's range, zero-padded by the CALLER to a whole
    number of segments only on the final host (every other host's range is
    exactly ``g_local * s * 128`` bytes by construction).  ``peek``: the
    ``kh`` bytes that FOLLOW the range in the global stream (shorter/empty
    at corpus end) — the halo rows of the last local segment read them, the
    same cross-boundary context the single-host layout takes from the next
    segment (ops/layout.py).  kh must be pre-rounded (multiple of 32).
    ``g_local`` forces the block's segment count (every process must
    contribute the same count; the final host's tail becomes all-pad
    segments whose positions lie beyond every needle's end)."""
    kh = round_up(max(kh, MIN_KH), 32)
    seg = s * LANES
    if g_local is None:
        g_local = -(-len(local_bytes) // seg)
    elif len(local_bytes) > g_local * seg:
        raise ValueError(
            f"local range of {len(local_bytes)} bytes exceeds "
            f"g_local*seg = {g_local * seg}"
        )
    total = g_local * seg + kh
    padded = np.zeros((total,), dtype=np.uint8)
    arr = np.frombuffer(local_bytes, dtype=np.uint8)
    padded[: len(arr)] = arr
    pk = np.frombuffer(peek[:kh], dtype=np.uint8)
    padded[g_local * seg : g_local * seg + len(pk)] = pk
    return np.asarray(_build_cols(padded, g_local, s, kh))


@dataclasses.dataclass
class GlobalCorpus:
    """A globally segment-sharded corpus — the multi-host counterpart of
    ``DeviceHaystack`` (duck-typed for the shard_scan entry points: exposes
    ``tiled``/``s``/``g``/``length``/``windows()``/``require_cols()``).
    Built by :func:`assemble_global_corpus`; ``length`` is the TRUE global
    byte length (int, unbounded — offsets past 2 GiB take shard_scan's
    int64 path automatically)."""

    length: int
    s: int
    g: int
    kh: int
    cols: jax.Array  # uint8 (g, s+kh, 128), sharded over the data axis
    pw: Optional[jax.Array] = None

    @property
    def tiled(self) -> bool:
        return True

    @property
    def seg_bytes(self) -> int:
        return self.s * LANES

    def require_cols(self) -> jax.Array:
        return self.cols

    def windows(self) -> jax.Array:
        """Packed uint32 windows, derived shard-locally (the pack is
        per-segment, so sharding propagates with no communication)."""
        if self.pw is None:
            from ..ops.layout import _pack_all

            self.pw = _pack_all(self.cols)
        return self.pw


def assemble_global_corpus(
    local_bytes: bytes,
    peek: bytes,
    global_length: int,
    s: int,
    kh: int,
    mesh: Mesh,
    g_local: Optional[int] = None,
) -> GlobalCorpus:
    """Per-host corpus bring-up: each process calls this with ITS contiguous
    byte range (process_id order), the following ``kh`` peek bytes, and the
    true global length; no host ever materializes the full corpus.
    ``g_local`` (same on every process) must make the global segment count
    divisible by the mesh's data axis; default = this range's segment count."""
    kh = round_up(max(kh, MIN_KH), 32)
    block = local_segment_block(local_bytes, peek, s, kh, g_local=g_local)
    cols = make_global_corpus(block, mesh)
    g = block.shape[0] * jax.process_count()
    return GlobalCorpus(length=global_length, s=s, g=g, kh=kh, cols=cols)
