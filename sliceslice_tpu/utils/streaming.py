"""Streaming corpus scanner — arbitrarily long byte streams through a
bounded device footprint.

The reference's long-sequence mechanism is its streaming register loop
(SURVEY.md §5.7); scaled up a level, this module streams *windows* of a file
(or chunk iterator) through the tiled scan kernel: each window carries a
``k_max - 1``-byte overlap peek so windows are self-contained, and
per-window ends mask the overlap region (counted exactly once, in the
window where a match's first byte lives — the same exactly-once rule as
shard boundaries).  Window results fold into an int64 host accumulator
every ``check_every`` windows (bounded retained device buffers, no
per-window sync; early stop checks the same fold).

Device math is window-LOCAL int32 (each window is far below 2 GiB); the
global offset is folded on host in int64, so streams of any length — well
past the 2 GiB int32 range — report exact first-match offsets (the
reference is offset-size agnostic via usize, src/lib.rs:253-287).

All three query modes run over streams: ``find`` (first offset, early
stop), ``count`` (overlapping totals), and ``positions`` (every offset —
the streamed ``find_iter`` capability; per-window packed bitmaps decoded
on host with the window's int64 base).  Needles of ANY length are
accepted, matching the reference's no-limit contract (src/lib.rs:52-59):
needles beyond the kernels' probe-table budget take the filter+verify
fallback (models/huge.py) against each window's host bytes — the overlap
then covers the full needle, so every match is contained in the window
where it starts.
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.batched import BatchedSearcher
from ..ops import scan_kernel
from ..ops.layout import preprocess
from ..ops.scan_math import SENTINEL


def _file_windows(
    path, window: int, overlap: int, start: int = 0
) -> Iterator[Tuple[bytes, bool]]:
    """Yield ``(window_bytes, is_last)``.  ``is_last`` must be computed
    from the file size, NOT from a short read: a window whose remaining
    bytes fall in (window, window + overlap) short-reads yet is followed
    by one more window — inferring finality from length would lift the
    exactly-once clamp there and double-count overlap-region matches."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        base = start
        while base < size:
            f.seek(base)
            yield f.read(window + overlap), base + window >= size
            base += window


def _chunk_windows(
    chunks: Iterable[bytes], window: int, overlap: int
) -> Iterator[Tuple[bytes, bool]]:
    """Re-chunk an arbitrary byte-chunk iterator into overlapping windows,
    yielding ``(window_bytes, is_last)``.  Amortized O(stream) copying:
    append + in-place front deletion on a bytearray (a bytes buffer would
    re-copy the whole pending window per chunk — quadratic for small
    chunks).  Full windows are never final here: the while loop always
    keeps ``max(overlap, 1)`` trailing bytes behind, so the stream's true
    end is ALWAYS the final short yield — including ``overlap == 0`` (all
    needles length <= 1) with a stream length an exact multiple of
    ``window``, where a ``>=``-with-0 loop would consume the final window
    and mark it non-final."""
    buf = bytearray()
    keep = max(overlap, 1)  # invariant: the final yield carries is_last
    for c in chunks:
        buf += c
        while len(buf) >= window + keep:
            yield bytes(buf[: window + overlap]), False
            del buf[:window]
    if buf:
        yield bytes(buf), True


@jax.jit
def _count_fold64(hi, lo, c):
    """Two-limb uint32 device accumulator: exact mod-2^64 totals with NO
    device->host traffic per window (the host link enters a ~40x slower
    bulk-transfer mode after the first data readback on some transports —
    measured on the axon tunnel, r4 — so streamed folds stay on device and
    the stream reads back ONCE at the end)."""
    c = c.astype(jnp.uint32)
    lo2 = lo + c
    carry = (lo2 < c).astype(jnp.uint32)
    return hi + carry, lo2


@jax.jit
def _first_fold(best_w, best_l, w_idx, local):
    """Lexicographic (window, local-offset) min, both int32 — windows
    arrive in stream order, so the smallest (window, local) pair IS the
    global first match; combined to int64 on host once at stream end."""
    cand_w = jnp.where(local < SENTINEL, w_idx, jnp.int32(SENTINEL))
    better = jnp.logical_or(
        cand_w < best_w,
        jnp.logical_and(cand_w == best_w, local < best_l),
    )
    return (
        jnp.where(better, cand_w, best_w),
        jnp.where(better, local, best_l),
    )


def _host_count_limited(data: bytes, nd: bytes, end: int) -> int:
    """Overlapping occurrences of ``nd`` starting at positions < ``end``."""
    c = 0
    p = data.find(nd)
    while 0 <= p < end:
        c += 1
        p = data.find(nd, p + 1)
    return c


def _host_positions_limited(data: bytes, nd: bytes, end: int) -> np.ndarray:
    """Overlapping match offsets of ``nd`` at positions < ``end``."""
    out = []
    p = data.find(nd)
    while 0 <= p < end:
        out.append(p)
        p = data.find(nd, p + 1)
    return np.asarray(out, dtype=np.int64)


class StreamingScanner:
    """Windowed scan of arbitrarily long byte streams.

    ``mesh``: optional device mesh — each window is then scanned by the
    sharded kernels (parallel/shard_scan.py), composing the two scale
    dimensions: streams beyond any single device's memory AND corpora
    beyond one chip's bandwidth (windows sharded over the data axis, the
    same exactly-once rules at both window and shard boundaries).

    ``window_bytes`` is raised to the overlap (longest needle - 1) when a
    needle exceeds it, bounding read amplification at 2x; huge needles
    (beyond MAX_NEEDLE_LEN) keep each window's host bytes for the verify
    step of their filter+verify path."""

    def __init__(
        self,
        needles: Sequence,
        window_bytes: int = 32 * 1024 * 1024,
        check_every: int = 4,
        mesh=None,
        prefetch: int = 2,
    ):
        self.batched = BatchedSearcher(needles)
        bs = self.batched
        k_all = max(
            [bs.max_len] + [hs.size for _, hs in bs._huge], default=0
        )
        self.overlap = max(k_all - 1, 0)
        # A needle longer than the window would otherwise make every window
        # mostly overlap; growing the window bounds re-read at <= 2x.
        self.window = max(window_bytes, self.overlap)
        self.check_every = check_every
        self.mesh = mesh
        #: windows in flight beyond the one being scanned: read + host pad +
        #: device upload of window N+1 happen on a background thread while
        #: window N's scans dispatch (0 = fully serial ingestion).  Each
        #: in-flight window pins ~4-5 bytes/byte of HBM.
        self.prefetch = max(int(prefetch), 0)
        from ..needle import needed_halo_for_t

        self._kh = needed_halo_for_t(bs.max_t)
        if bs._huge:
            from ..models.huge import PREFIX_LEN

            # The huge-needle device filter probes a PREFIX_LEN-byte prefix.
            self._kh = max(self._kh, PREFIX_LEN - 1)
        # Kernel-group slots: the per-window scatter zero-inits non-group
        # (huge) slots, so find folds must never read them as offset-0 hits.
        self._kernel_slot = np.zeros((len(bs),), dtype=bool)
        for grp in bs.groups:
            self._kernel_slot[grp.indices] = True

    # -- window layout ---------------------------------------------------

    def _prep(self, wbytes: bytes, need_cols: bool):
        """Per-window device layout.  Huge needles keep the window's host
        bytes (their verify memcmps against them) and byte tiles (their
        prefix filter is the bitmap op); find/count-only kernel scans keep
        packed windows only (~4 bytes/byte on device instead of ~5)."""
        huge = bool(self.batched._huge)
        return preprocess(
            wbytes,
            kh=self._kh,
            keep_host=huge,
            windows_only=not (huge or need_cols),
            force_cols=self.mesh is not None,
        )

    def _end_h(self, k: int, wlen: int, is_last: bool) -> int:
        """Window-local valid-position bound for a length-``k`` needle:
        matches starting in the overlap peek belong to the next window,
        EXCEPT in the stream's final window, where the true end applies —
        a final window may be longer than ``window`` (a chunk stream
        shorter than window + overlap arrives as one window), so the
        clamp must be lifted there exactly as :meth:`_group_ends` does."""
        end = wlen - k + 1
        return end if is_last else min(self.window, end)

    # -- public API --------------------------------------------------------

    def find_in_file(
        self, path, early_stop: bool = True, start_offset: int = 0
    ) -> np.ndarray:
        """First-match offset per needle (int64[N], -1 absent) over the
        file's bytes from ``start_offset`` on; offsets are absolute file
        offsets (scan a tail / resume a partitioned scan)."""
        return self._scan(
            _file_windows(path, self.window, self.overlap, start_offset),
            early_stop,
            base0=start_offset,
        )

    def find_in_chunks(
        self,
        chunks: Iterable[bytes],
        early_stop: bool = True,
        start_offset: int = 0,
    ) -> np.ndarray:
        """``start_offset``: global offset of the stream's first byte —
        reported offsets are start_offset + stream position (resume /
        split-stream scans; int64 end to end, so offsets past 2^32 are
        exact through this public path)."""
        return self._scan(
            _chunk_windows(chunks, self.window, self.overlap),
            early_stop,
            base0=start_offset,
        )

    def count_in_file(self, path, start_offset: int = 0) -> np.ndarray:
        """Overlapping occurrence counts (int64[N]) over the whole stream —
        exact past 2 GiB (per-window int32 device counts, int64 host sum).
        No early stop exists to use (counts need the full stream)."""
        return self._count(
            _file_windows(path, self.window, self.overlap, start_offset)
        )

    def count_in_chunks(self, chunks: Iterable[bytes]) -> np.ndarray:
        return self._count(_chunk_windows(chunks, self.window, self.overlap))

    def positions_in_file(self, path, start_offset: int = 0) -> list:
        """ALL (overlapping) match offsets per needle (int64[M] ascending,
        input order) — the streamed ``find_iter`` capability.  Per-window
        packed match bitmaps (window/8 bytes per needle), decoded on host
        with the window's int64 base, so offsets past 2 GiB are exact."""
        return self._positions(
            _file_windows(path, self.window, self.overlap, start_offset),
            base0=start_offset,
        )

    def positions_in_chunks(
        self, chunks: Iterable[bytes], start_offset: int = 0
    ) -> list:
        return self._positions(
            _chunk_windows(chunks, self.window, self.overlap),
            base0=start_offset,
        )

    def warmup(self) -> "StreamingScanner":
        """Compile every kernel shape the stream will use, WITHOUT a single
        device->host data readback: two synthetic windows (a full one and a
        trailing short one) run through the find and count kernels, blocked
        on device.  Use before timed runs — and on transports where the
        first data readback permanently degrades bulk transfer bandwidth
        (see _count_fold64), call this so the stream itself runs at full
        link speed and reads back once at the end."""
        shapes = [
            (b"\x00" * (self.window + self.overlap), False),
            (
                b"\x00"
                * max(min(self.window, 1 << 20), self.overlap + 1),
                True,
            ),
        ]
        for wbytes, is_last in shapes:
            dh = self._prep(wbytes, need_cols=False)
            outs = []
            for grp in self.batched.groups:
                ends = self._group_ends(grp, len(wbytes), is_last)
                if self.mesh is not None:
                    from ..parallel.shard_scan import (
                        sharded_count_cols,
                        sharded_find_cols,
                    )

                    outs.append(
                        sharded_find_cols(
                            dh, grp.values_dev, grp.masks_dev, ends,
                            self.mesh, assume_homogeneous=True,
                        )
                    )
                    outs.append(
                        sharded_count_cols(
                            dh, grp.values_dev, grp.masks_dev, ends,
                            self.mesh, assume_homogeneous=True,
                        )
                    )
                elif not dh.tiled:
                    from ..ops import xla_backend

                    outs.append(
                        xla_backend.find_batched_flat(
                            dh.flat, grp.values_dev, grp.masks_dev,
                            jnp.asarray(ends.astype(np.int32)),
                        )
                    )
                else:
                    kw = dict(s=dh.s, pw=dh.windows())
                    outs.append(
                        scan_kernel.batched_find_cols(
                            None, grp.values_dev, grp.masks_dev,
                            ends.astype(np.int32), **kw,
                        )
                    )
                    outs.append(
                        scan_kernel.batched_count_cols(
                            None, grp.values_dev, grp.masks_dev,
                            ends.astype(np.int32), **kw,
                        )
                    )
            for o in outs:
                jax.block_until_ready(o)
        return self

    # -- internals ---------------------------------------------------------

    def _ingest(self, windows: Iterator[Tuple[bytes, bool]], need_cols: bool):
        """Yield ``(dh, wbytes, is_last)`` in stream order, PIPELINED: the
        next window's file read, host pad, and device upload run on a
        background thread while the current window's scans dispatch — the
        streamed analogue of the reference's load-ahead register loop
        (src/lib.rs:263-274) at window grain.  The scan dispatches are
        already async, so with ingestion off the critical path the stream
        sustains ~max(ingest rate, scan rate) instead of their sum.
        ``prefetch == 0`` degrades to the serial loop (no thread)."""
        if self.prefetch == 0:
            for wbytes, is_last in windows:
                yield self._prep(wbytes, need_cols), wbytes, is_last
            return
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        sentinel = object()
        failure: List[BaseException] = []

        def worker():
            try:
                for wbytes, is_last in windows:
                    if stop.is_set():
                        return
                    item = (self._prep(wbytes, need_cols), wbytes, is_last)
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.05)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:  # surfaced on the consumer side
                failure.append(e)
            finally:
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.05)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(
            target=worker, name="sliceslice-ingest", daemon=True
        )
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if failure:
                        raise failure[0]
                    return
                yield item
        finally:
            # Early stop (or consumer error): unblock and retire the worker.
            stop.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5.0)

    def _group_ends(self, grp, wlen: int, is_last: bool) -> np.ndarray:
        """Window-local valid-position bounds for one width group: count
        positions only in [0, window) — the overlap peek belongs to the
        next window — except in the final window, where the stream's true
        end applies."""
        lens = grp.lengths
        end_local = wlen - lens + 1 if is_last else np.minimum(
            self.window, wlen - lens + 1
        )
        return grp.pad_ends(np.maximum(end_local, 0))

    def _fold_huge_find(
        self, best, dh, wbytes: bytes, base: int, is_last: bool
    ) -> None:
        for i, hs in self.batched._huge:
            if best[i] >= 0:
                continue
            p = hs.find(dh)
            if p is not None and p < self._end_h(hs.size, len(wbytes), is_last):
                best[i] = base + p

    def _count(self, windows: Iterator[bytes]) -> np.ndarray:
        bs = self.batched
        n = len(bs)
        totals = np.zeros((n,), dtype=np.int64)
        # Device two-limb accumulator: window counts fold ON DEVICE and the
        # stream reads back once at the end — zero mid-stream device->host
        # traffic (see _count_fold64), constant device memory.  Host-side
        # parts (the sharded int64 guard path) fold on host as before.
        hi = lo = None
        pending: List = []
        since = 0
        for dh, wbytes, is_last in self._ingest(windows, need_cols=False):
            for i, hs in bs._huge:
                end_h = self._end_h(hs.size, len(wbytes), is_last)
                pos = hs.positions(dh)
                totals[i] += int((pos < end_h).sum())
            if bs.groups:
                merged = self._count_window(dh, wbytes, is_last)
                if isinstance(merged, np.ndarray) or self.mesh is not None:
                    # Host int64 parts, and mesh streams (replicated
                    # multi-process arrays keep the proven host fold).
                    pending.append(merged)
                else:
                    if hi is None:
                        hi = jnp.zeros((n,), jnp.uint32)
                        lo = jnp.zeros((n,), jnp.uint32)
                    hi, lo = _count_fold64(hi, lo, merged)
            since += 1
            if since >= self.check_every:
                since = 0
                self._fold_counts(totals, pending)
                if lo is not None:
                    # Drain the device queue (a wait, NOT a readback): an
                    # unsynced stream piles ~10 windows x ~320 MB of
                    # in-flight transient buffers and collapses to single-
                    # digit MB/s under allocator backpressure (measured
                    # 6 -> 350 MB/s with this cadence, r4).
                    jax.block_until_ready(lo)
        self._fold_counts(totals, pending)
        if hi is not None:
            totals += (np.asarray(hi).astype(np.int64) << 32) + np.asarray(
                lo
            ).astype(np.int64)
        return totals

    def _count_window(self, dh, wbytes: bytes, is_last: bool):
        bs = self.batched
        parts = []
        blobs = []
        for grp in bs.groups:
            end_local = self._group_ends(grp, len(wbytes), is_last)
            if self.mesh is not None:
                from ..parallel.shard_scan import sharded_count_cols

                local = sharded_count_cols(
                    dh, grp.values_dev, grp.masks_dev,
                    end_local, self.mesh, assume_homogeneous=True,
                )
            elif not dh.tiled:
                local = jnp.asarray(
                    [
                        _host_count_limited(wbytes, nd, int(e))
                        for nd, e in zip(
                            [bs.needles[i] for i in grp.indices],
                            end_local,
                        )
                    ]
                    + [0] * (grp.n_pad - grp.n),
                    jnp.int32,
                )
            else:
                local = scan_kernel.batched_count_cols(
                    None,
                    grp.values_dev,
                    grp.masks_dev,
                    end_local.astype(np.int32),
                    s=dh.s,
                    pw=dh.windows(),
                )
            parts.append(local)
            blobs.append(grp.indices.tobytes())
        return self._merge_parts(parts, blobs, absent=0)

    def _merge_parts(self, parts, blobs, absent: int):
        """Scatter per-group window results to input order.  Device parts
        fuse into one int32 device scatter; host int64 parts (the sharded
        >2 GiB-padding guard path — unreachable with default windows but
        exact if hit) scatter on host, preserving int64."""
        bs = self.batched
        n = len(bs)
        if parts and isinstance(parts[0], np.ndarray):
            out = np.full((n,), absent, np.int64)
            for grp, p in zip(bs.groups, parts):
                out[grp.indices] = p[: grp.n]
            return out
        from ..models.batched import _scatter_groups

        return _scatter_groups(n, tuple(blobs), parts)

    def _scan(
        self, windows: Iterator[bytes], early_stop: bool, base0: int = 0
    ) -> np.ndarray:
        bs = self.batched
        n = len(bs)
        # int64 host accumulator: windows arrive in stream order, so a slot
        # is finalized by the FIRST window whose local scan reports a match.
        # Device results stay window-local int32 and fold every check_every
        # windows (and at the end) — no per-window sync, bounded buffers.
        best = np.full((n,), -1, dtype=np.int64)
        # Device lexicographic-(window, local) accumulator: window results
        # fold ON DEVICE and the stream reads back once at the end (plus a
        # small cadence snapshot only when early_stop needs one) — see
        # _first_fold.  Host-side parts (the sharded int64 guard path) keep
        # the host fold.
        best_w = best_l = None
        pending: List[Tuple[int, jax.Array]] = []
        base = int(base0)
        w_idx = 0
        since_check = 0
        # windows_only inside _prep: the scan consumes packed windows only,
        # so each window pins ~4 bytes/byte on device instead of ~5.
        for dh, wbytes, is_last in self._ingest(windows, need_cols=False):
            self._fold_huge_find(best, dh, wbytes, base, is_last)
            if bs.groups:
                parts = []
                blobs = []
                for grp in bs.groups:
                    end_local = self._group_ends(grp, len(wbytes), is_last)
                    if self.mesh is not None:
                        from ..parallel.shard_scan import sharded_find_cols

                        local = sharded_find_cols(
                            dh, grp.values_dev, grp.masks_dev,
                            end_local, self.mesh, assume_homogeneous=True,
                        )
                    elif not dh.tiled:
                        from ..ops import xla_backend

                        local = xla_backend.find_batched_flat(
                            dh.flat, grp.values_dev, grp.masks_dev,
                            jnp.asarray(end_local.astype(np.int32)),
                        )
                    else:
                        local = scan_kernel.batched_find_cols(
                            None,
                            grp.values_dev,
                            grp.masks_dev,
                            end_local.astype(np.int32),
                            s=dh.s,
                            pw=dh.windows(),
                        )
                    parts.append(local)
                    blobs.append(grp.indices.tobytes())
                merged = self._merge_parts(parts, blobs, absent=-1)
                if isinstance(merged, np.ndarray) or self.mesh is not None:
                    # Host int64 parts, and mesh streams (replicated
                    # multi-process arrays keep the proven host fold).
                    pending.append((base, merged))
                else:
                    if best_w is None:
                        best_w = jnp.full((n,), SENTINEL, jnp.int32)
                        best_l = jnp.full((n,), SENTINEL, jnp.int32)
                    best_w, best_l = _first_fold(
                        best_w, best_l, jnp.int32(w_idx), merged
                    )
            base += self.window
            w_idx += 1
            since_check += 1
            if since_check >= self.check_every:
                since_check = 0
                self._fold(best, pending)
                if best_w is not None:
                    # Drain the device queue (a wait, NOT a readback) —
                    # bounds in-flight window buffers; see _count's note.
                    jax.block_until_ready(best_w)
                if early_stop and self._all_found(best, best_w):
                    break
        self._fold(best, pending)
        self._combine_device_first(best, best_w, best_l, base0)
        return best

    def _all_found(self, best: np.ndarray, best_w) -> bool:
        """Early-stop check.  Reads the device accumulator (a small
        readback; on transports where the first data readback drops bulk
        bandwidth — see _count_fold64 — this is the documented cost of
        early_stop=True)."""
        if best_w is None:
            return bool((best >= 0).all())
        found_dev = np.asarray(best_w) < SENTINEL
        ok = np.where(
            self._kernel_slot, (best >= 0) | found_dev, best >= 0
        )
        return bool(ok.all())

    def _combine_device_first(
        self, best: np.ndarray, best_w, best_l, base0: int
    ) -> None:
        """One final readback of the device (window, local) pairs -> int64
        global offsets for kernel-group slots still unset."""
        if best_w is None:
            return
        bw = np.asarray(best_w).astype(np.int64)
        bl = np.asarray(best_l).astype(np.int64)
        upd = (bw < SENTINEL) & self._kernel_slot & (best < 0)
        best[upd] = base0 + bw[upd] * self.window + bl[upd]

    def _positions(self, windows: Iterator[bytes], base0: int = 0) -> list:
        """Per-window bitmap scan + host decode (readback-bound, like the
        single-corpus positions_all) — window-local clipped ends give the
        exactly-once rule, the int64 window base the unbounded offsets."""
        bs = self.batched
        n = len(bs)
        out: List[List[np.ndarray]] = [[] for _ in range(n)]
        base = int(base0)
        batch = 16  # bitmap memory bound: window/8 bytes per needle
        for dh, wbytes, is_last in self._ingest(windows, need_cols=True):
            for i, hs in bs._huge:
                end_h = self._end_h(hs.size, len(wbytes), is_last)
                pos = hs.positions(dh)
                pos = pos[pos < end_h]
                if pos.size:
                    out[i].append(pos + base)
            for grp in bs.groups:
                ends = self._group_ends(grp, len(wbytes), is_last)[: grp.n]
                if not dh.tiled:
                    for j, gi in enumerate(grp.indices):
                        pos = _host_positions_limited(
                            wbytes, bs.needles[gi], int(ends[j])
                        )
                        if pos.size:
                            out[gi].append(pos + base)
                    continue
                for i0 in range(0, grp.n, batch):
                    res = self._positions_batch(
                        dh,
                        grp.values_host[i0 : i0 + batch],
                        grp.masks_host[i0 : i0 + batch],
                        ends[i0 : i0 + batch],
                    )
                    for j, pos in enumerate(res):
                        if pos.size:
                            out[grp.indices[i0 + j]].append(pos + base)
            base += self.window
        return [
            np.concatenate(p) if p else np.empty((0,), np.int64)
            for p in out
        ]

    def _positions_batch(self, dh, vals, msks, ends) -> list:
        from ..ops import xla_backend

        if self.mesh is not None:
            from ..parallel.shard_scan import sharded_positions

            return sharded_positions(dh, vals, msks, ends, self.mesh)
        words = np.asarray(
            xla_backend.match_bitmap_batched(
                dh.require_cols(), vals, msks,
                np.asarray(ends, np.int32), dh.s,
            )
        )
        return [
            xla_backend.decode_match_bitmap(words[j], dh.s)
            for j in range(words.shape[0])
        ]

    def _fold_counts(self, totals: np.ndarray, pending: List) -> None:
        for arr in pending:
            totals += np.asarray(arr).astype(np.int64)
        pending.clear()

    def _fold(self, best: np.ndarray, pending: List[Tuple[int, object]]) -> None:
        """Fold window-local device results into the int64 host accumulator
        (in stream order, first window with a match wins).  Device parts
        are int32 with SENTINEL = absent; host int64 parts (the sharded
        padding-overflow guard path) use -1 = absent.  Only kernel-group
        slots fold — huge-needle slots are zero-init scatter filler here
        and are written by :meth:`_fold_huge_find` instead."""
        for wbase, arr in pending:
            local = np.asarray(arr)
            if local.dtype == np.int64:
                upd = (best < 0) & (local >= 0) & self._kernel_slot
            else:
                upd = (best < 0) & (local < SENTINEL) & self._kernel_slot
            best[upd] = local[upd].astype(np.int64) + wbase
        pending.clear()
