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


def _file_windows(path, window: int, overlap: int) -> Iterator[bytes]:
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        base = 0
        while base < size:
            f.seek(base)
            yield f.read(window + overlap)
            base += window


def _chunk_windows(chunks: Iterable[bytes], window: int, overlap: int):
    """Re-chunk an arbitrary byte-chunk iterator into overlapping windows.
    Amortized O(stream) copying: append + in-place front deletion on a
    bytearray (a bytes buffer would re-copy the whole pending window per
    chunk — quadratic for small chunks)."""
    buf = bytearray()
    for c in chunks:
        buf += c
        while len(buf) >= window + overlap:
            yield bytes(buf[: window + overlap])
            del buf[:window]
    if buf:
        yield bytes(buf)


def _host_count_limited(data: bytes, nd: bytes, end: int) -> int:
    """Overlapping occurrences of ``nd`` starting at positions < ``end``."""
    c = 0
    p = data.find(nd)
    while 0 <= p < end:
        c += 1
        p = data.find(nd, p + 1)
    return c


class StreamingScanner:
    """Windowed scan of arbitrarily long byte streams.

    ``mesh``: optional device mesh — each window is then scanned by the
    sharded kernels (parallel/shard_scan.py), composing the two scale
    dimensions: streams beyond any single device's memory AND corpora
    beyond one chip's bandwidth (windows sharded over the data axis, the
    same exactly-once rules at both window and shard boundaries)."""

    def __init__(
        self,
        needles: Sequence,
        window_bytes: int = 32 * 1024 * 1024,
        check_every: int = 4,
        mesh=None,
    ):
        self.batched = BatchedSearcher(needles)
        if self.batched._huge:
            # The huge-needle fallback verifies against retained host bytes;
            # streamed windows keep none (and a >2 KiB needle would demand a
            # same-sized window overlap).  Scan such needles over a
            # preprocessed DeviceHaystack instead.
            raise ValueError(
                "StreamingScanner does not support needles longer than "
                "MAX_NEEDLE_LEN; use BatchedSearcher on a preprocessed corpus"
            )
        self.window = window_bytes
        self.overlap = max(self.batched.max_len - 1, 0)
        self.check_every = check_every
        self.mesh = mesh
        from ..needle import needed_halo_for_t

        self._kh = needed_halo_for_t(self.batched.max_t)

    def find_in_file(self, path, early_stop: bool = True) -> np.ndarray:
        return self._scan(
            _file_windows(path, self.window, self.overlap), early_stop
        )

    def find_in_chunks(
        self, chunks: Iterable[bytes], early_stop: bool = True
    ) -> np.ndarray:
        return self._scan(
            _chunk_windows(chunks, self.window, self.overlap), early_stop
        )

    def count_in_file(self, path) -> np.ndarray:
        """Overlapping occurrence counts (int64[N]) over the whole stream —
        exact past 2 GiB (per-window int32 device counts, int64 host sum).
        No early stop exists to use (counts need the full stream)."""
        return self._count(_file_windows(path, self.window, self.overlap))

    def count_in_chunks(self, chunks: Iterable[bytes]) -> np.ndarray:
        return self._count(_chunk_windows(chunks, self.window, self.overlap))

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

    def _count(self, windows: Iterator[bytes]) -> np.ndarray:
        bs = self.batched
        n = len(bs)
        totals = np.zeros((n,), dtype=np.int64)
        pending: List[jax.Array] = []
        for wbytes in windows:
            dh = preprocess(
                wbytes, kh=self._kh, keep_host=False, windows_only=True,
                force_cols=self.mesh is not None,
            )
            is_last = len(wbytes) < self.window + self.overlap
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
            from ..models.batched import _scatter_groups

            pending.append(_scatter_groups(n, tuple(blobs), parts))
            if len(pending) >= self.check_every:
                # Bound retained device buffers (a multi-TB stream would
                # otherwise queue one per window before any readback).
                for arr in pending:
                    totals += np.asarray(arr).astype(np.int64)
                pending.clear()
        for arr in pending:
            totals += np.asarray(arr).astype(np.int64)
        return totals

    def _scan(self, windows: Iterator[bytes], early_stop: bool) -> np.ndarray:
        bs = self.batched
        n = len(bs)
        # int64 host accumulator: windows arrive in stream order, so a slot
        # is finalized by the FIRST window whose local scan reports a match.
        # Device results stay window-local int32 and fold every check_every
        # windows (and at the end) — no per-window sync, bounded buffers.
        best = np.full((n,), -1, dtype=np.int64)
        pending: List[Tuple[int, jax.Array]] = []
        base = 0
        since_check = 0
        for wbytes in windows:
            # windows_only: the scan consumes packed windows only, so each
            # window pins ~4 bytes/byte on device instead of ~5.
            dh = preprocess(
                wbytes, kh=self._kh, keep_host=False, windows_only=True,
                force_cols=self.mesh is not None,
            )
            is_last = len(wbytes) < self.window + self.overlap
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
            from ..models.batched import _scatter_groups

            pending.append((base, _scatter_groups(n, tuple(blobs), parts)))
            base += self.window
            since_check += 1
            if since_check >= self.check_every:
                # Fold on cadence regardless of early_stop — bounds retained
                # device buffers on arbitrarily long streams.
                since_check = 0
                self._fold(best, pending)
                if early_stop and (best >= 0).all():
                    break
        self._fold(best, pending)
        return best

    @staticmethod
    def _fold(best: np.ndarray, pending: List[Tuple[int, jax.Array]]) -> None:
        """Fold window-local device results into the int64 host accumulator
        (in stream order, first window with a match wins)."""
        for wbase, arr in pending:
            local = np.asarray(arr)
            upd = (best < 0) & (local < SENTINEL)
            best[upd] = local[upd].astype(np.int64) + wbase
        pending.clear()
