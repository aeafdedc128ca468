"""Distributed corpus scanner — the new L5 layer (absent in the single-core
reference; specified by BASELINE.json: corpus sharded data-parallel, needle
tables replicated, match flags/offsets reduced via ICI collectives).

Because layout segments are self-contained (each carries its own halo bytes,
ops/layout.py), sharding the segment axis requires NO neighbor communication:
each chip scans its shard with the same Pallas kernel the single-chip path
uses, computes per-needle lane-min offsets with a *global* base
(``axis_index('data') * shard_bytes``), and a single ``pmin`` over the data
axis — one int32 vector per query batch — produces exact global first-match
offsets.  Cross-shard-boundary matches are counted exactly once: a match
belongs to the shard where its first byte lives (halo bytes are read-only
context), the reference's ``end = len - k + 1`` rule applied globally.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from .. import config
from ..ops import scan_kernel
from ..ops.layout import LANES, DeviceHaystack
from ..ops.scan_math import SENTINEL
from .mesh import DATA_AXIS, NEEDLE_AXIS, corpus_sharding, table_sharding


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=64)
def _sharded_call(
    mesh: Mesh,
    g_pad: int,
    h: int,
    s: int,
    t: int,
    nblk: int,
    n_pad: int,
    interpret: bool,
    pen_full: bool = False,
    n_real: int | None = None,
):
    n_data = mesh.shape[DATA_AXIS]
    n_needle = mesh.shape[NEEDLE_AXIS]
    g_local = g_pad // n_data
    n_local = n_pad // n_needle
    seg = s * LANES
    raw = scan_kernel._raw_batched_call(
        g_local, h, s, t, nblk, n_local, interpret, pen_full,
        n_real=n_real,
    )

    def local_fn(pw_l, vals_l, msks_l, ends_l):
        shard = jax.lax.axis_index(DATA_AXIS)
        base = (shard * g_local * seg).astype(jnp.int32).reshape(1)
        # Global row offset of this needle shard: the kernel skips padded
        # rows (>= n_real) from its unfound list.
        row0 = (
            jax.lax.axis_index(NEEDLE_AXIS) * n_local
        ).astype(jnp.int32).reshape(1)
        out = raw(vals_l, msks_l, base, row0, pw_l)  # (n_local, LANES)
        first = jnp.min(out, axis=-1)
        # The one collective of the whole workload: min offset across the
        # corpus shards (rides ICI; one int32 per needle).
        first = jax.lax.pmin(first, DATA_AXIS)
        return jnp.where(first < ends_l, first, SENTINEL)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None, None),
            P(NEEDLE_AXIS, None),
            P(NEEDLE_AXIS, None),
            P(NEEDLE_AXIS),
        ),
        out_specs=P(NEEDLE_AXIS),
        # pallas_call out_shapes don't carry vma annotations.
        check_vma=False,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _sharded_count_call(
    mesh: Mesh,
    g_pad: int,
    h: int,
    s: int,
    t: int,
    nblk: int,
    n_pad: int,
    interpret: bool,
    pen_full: bool = False,
    n_real: int | None = None,
):
    """Distributed occurrence count: local count kernel per shard, ONE
    ``psum`` over the data axis (exactly-once at shard boundaries follows
    from positions belonging to the shard where the match starts; halo
    bytes are read-only context)."""
    n_data = mesh.shape[DATA_AXIS]
    n_needle = mesh.shape[NEEDLE_AXIS]
    g_local = g_pad // n_data
    n_local = n_pad // n_needle
    seg = s * LANES
    raw = scan_kernel._raw_count_call(
        g_local, h, s, t, nblk, n_local, interpret, pen_full,
        n_real=n_real,
    )

    def local_fn(pw_l, vals_l, msks_l, ends_l):
        shard = jax.lax.axis_index(DATA_AXIS)
        base = (shard * g_local * seg).astype(jnp.int32).reshape(1)
        row0 = (
            jax.lax.axis_index(NEEDLE_AXIS) * n_local
        ).astype(jnp.int32).reshape(1)
        out = raw(
            vals_l, msks_l, ends_l.reshape(-1, 1), base, row0, pw_l
        )
        counts = jnp.sum(out, axis=-1)
        return jax.lax.psum(counts, DATA_AXIS)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None, None),
            P(NEEDLE_AXIS, None),
            P(NEEDLE_AXIS, None),
            P(NEEDLE_AXIS),
        ),
        out_specs=P(NEEDLE_AXIS),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_find_cols(
    dh: DeviceHaystack,
    values: np.ndarray,
    masks: np.ndarray,
    ends: np.ndarray,
    mesh: Mesh,
    nblk: Optional[int] = None,
    interpret: Optional[bool] = None,
    mode: str = "find",
) -> jax.Array:
    """Exact global first-match offsets (SENTINEL absent) of N needles over a
    segment-sharded corpus on ``mesh`` (``mode="count"``: overlapping
    occurrence counts instead, reduced with one ``psum``).

    Accepts mixed-width probe tables: rows are regrouped by effective width
    (the scan kernels require homogeneous tables — every slot but the last
    full-mask) and the groups' results merged on device.
    """
    values_np = np.asarray(values)
    masks_np = np.asarray(masks)
    eff = (masks_np != 0).sum(axis=1)  # active slots are contiguous from 0
    widths = np.unique(eff)
    if len(widths) > 1 or (len(widths) == 1 and widths[0] != values_np.shape[1]):
        ends_np = np.asarray(ends)
        n = values_np.shape[0]
        order = []
        parts = []
        for w in widths:
            idx = np.nonzero(eff == w)[0]
            w_eff = max(int(w), 1)
            parts.append(
                _sharded_homogeneous(
                    dh,
                    values_np[idx, :w_eff],
                    masks_np[idx, :w_eff],
                    ends_np[idx],
                    mesh,
                    nblk,
                    interpret,
                    mode,
                )
            )
            order.append(idx)
        order = jnp.asarray(np.concatenate(order), jnp.int32)
        merged = jnp.concatenate([jnp.asarray(p) for p in parts])
        return jnp.zeros((n,), jnp.int32).at[order].set(merged)
    return _sharded_homogeneous(
        dh, values, masks, ends, mesh, nblk, interpret, mode
    )


def sharded_count_cols(
    dh: DeviceHaystack,
    values: np.ndarray,
    masks: np.ndarray,
    ends: np.ndarray,
    mesh: Mesh,
    nblk: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Overlapping occurrence counts (int32[N]) over a segment-sharded
    corpus — the count analogue of :func:`sharded_find_cols`."""
    return sharded_find_cols(
        dh, values, masks, ends, mesh, nblk, interpret, mode="count"
    )


def _sharded_homogeneous(
    dh: DeviceHaystack,
    values,
    masks,
    ends,
    mesh: Mesh,
    nblk: Optional[int] = None,
    interpret: Optional[bool] = None,
    mode: str = "find",
) -> jax.Array:
    if not dh.tiled:
        raise ValueError("sharded scan requires a tiled (cols) layout")
    pw = dh.windows()
    g, rows, lanes = pw.shape
    h = rows + 3  # cols row count (s + halo); pw carries h-3 window rows
    assert lanes == LANES
    masks = jnp.asarray(masks, jnp.uint32)
    # Kernels use the 2-op (w & m) == v compare; re-mask defensively in case
    # a caller-built table is not pre-masked (build_probe_table tables are).
    values = jnp.asarray(values, jnp.uint32) & masks
    ends = jnp.asarray(ends, jnp.int32)
    n, t = values.shape
    # Homogeneous tables (regrouped by effective width above, or passed as
    # such) have full masks on every slot below the final one.
    pen_full = t <= scan_kernel.PROBE_UNROLL
    if t > scan_kernel.PROBE_UNROLL and t % 2:
        # The long-needle kernel loops probe *pairs*; a mask-0 slot is a no-op.
        values = jnp.pad(values, ((0, 0), (0, 1)))
        masks = jnp.pad(masks, ((0, 0), (0, 1)))
        t += 1
    n_data = mesh.shape[DATA_AXIS]
    n_needle = mesh.shape[NEEDLE_AXIS]

    g_pad = _round_up(g, n_data)
    if g_pad != g:
        # All-pad segments: their positions lie beyond every needle's end.
        pw = jnp.pad(pw, ((0, g_pad - g), (0, 0), (0, 0)))
    nblk = nblk or min(config.NEEDLE_BLOCK, _round_up(max(n // n_needle, 1), 8))
    n_pad = _round_up(n, n_needle * nblk)
    if n_pad != n:
        values = jnp.pad(values, ((0, n_pad - n), (0, 0)))
        masks = jnp.pad(masks, ((0, n_pad - n), (0, 0)))
        ends = jnp.pad(ends, ((0, n_pad - n),))
    if interpret is None:
        interpret = config.use_interpret()

    builder = _sharded_call if mode == "find" else _sharded_count_call
    run = builder(
        mesh, g_pad, h, dh.s, t, nblk, n_pad, interpret, pen_full,
        n_real=n,
    )
    pw = jax.device_put(pw, corpus_sharding(mesh))
    values = jax.device_put(values, table_sharding(mesh))
    masks = jax.device_put(masks, table_sharding(mesh))
    ends = jax.device_put(ends, NamedSharding(mesh, P(NEEDLE_AXIS)))
    return run(pw, values, masks, ends)[:n]


class ShardedBatchedSearcher:
    """BatchedSearcher over a device mesh: same API, sharded execution.

    Probe tables and the sharded corpus are placed on the mesh once and
    cached (keyed by corpus identity), so repeated sweeps issue no
    device_put traffic — the multi-chip analogue of the single-chip fused
    sweep's pre-padded device tables."""

    def __init__(self, needles, mesh: Mesh, position=None):
        from ..models.batched import BatchedSearcher

        self.inner = BatchedSearcher(needles, position)
        self.mesh = mesh
        self._placed_tables = None
        self._placed_corpus: dict = {}

    def __len__(self):
        return len(self.inner)

    def _tables(self, hay_len: int):
        tabs = []
        for grp in self.inner.groups:
            tabs.append(
                (
                    jax.device_put(grp.values_dev, table_sharding(self.mesh)),
                    jax.device_put(grp.masks_dev, table_sharding(self.mesh)),
                    jax.device_put(
                        grp.ends_dev(hay_len),
                        NamedSharding(self.mesh, P(NEEDLE_AXIS)),
                    ),
                )
            )
        return tabs

    def find_all(self, dh: DeviceHaystack) -> np.ndarray:
        dh = self.inner._layout(dh)
        n = len(self.inner)
        pw = dh.windows()  # corpus identity = the packed-window array
        key = id(pw)
        hit = self._placed_corpus.get(key)
        if hit is None or hit[0] is not pw:
            self._placed_corpus = {
                key: (pw, self._tables(dh.length))
            }
        tabs = self._placed_corpus[key][1]
        parts = []
        blobs = []
        for grp, (v, m, e) in zip(self.inner.groups, tabs):
            parts.append(sharded_find_cols(dh, v, m, e, self.mesh))
            blobs.append(grp.indices.tobytes())
        from ..models.batched import _scatter_groups

        firsts = _scatter_groups(n, tuple(blobs), parts)
        out = np.asarray(firsts).astype(np.int64)
        out[out >= SENTINEL] = -1
        return out

    def count_all(self, dh: DeviceHaystack) -> np.ndarray:
        """Overlapping occurrence counts (int64[N]) across the sharded
        corpus — one ``psum`` per query batch."""
        dh = self.inner._layout(dh)
        n = len(self.inner)
        pw = dh.windows()  # corpus identity = the packed-window array
        key = id(pw)
        hit = self._placed_corpus.get(key)
        if hit is None or hit[0] is not pw:
            self._placed_corpus = {
                key: (pw, self._tables(dh.length))
            }
        tabs = self._placed_corpus[key][1]
        parts = []
        blobs = []
        for grp, (v, m, e) in zip(self.inner.groups, tabs):
            parts.append(sharded_count_cols(dh, v, m, e, self.mesh))
            blobs.append(grp.indices.tobytes())
        from ..models.batched import _scatter_groups

        counts = _scatter_groups(n, tuple(blobs), parts)
        return np.asarray(counts).astype(np.int64)

    def search_all(self, dh) -> np.ndarray:
        return self.find_all(dh) >= 0
