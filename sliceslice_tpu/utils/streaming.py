"""Streaming corpus scanner — arbitrarily long byte streams through a
bounded device footprint.

The reference's long-sequence mechanism is its streaming register loop
(SURVEY.md §5.7); scaled up a level, this module streams *windows* of a file
(or chunk iterator) through the tiled scan kernel: each window carries a
``k_max - 1``-byte overlap peek so windows are self-contained, per-window
ends mask the overlap region (counted exactly once, in the window where a
match's first byte lives — the same exactly-once rule as shard boundaries),
and per-needle minima combine on device.  One host readback at the end (or
every ``check_every`` windows when early-stop is on and every needle has
been found).

Global offsets are int32: corpora up to 2 GiB per scan call (shard above
that — parallel/distributed.py).
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator, Sequence

import jax.numpy as jnp
import numpy as np

from ..models.batched import BatchedSearcher
from ..ops import scan_kernel
from ..ops.layout import preprocess
from ..ops.scan_math import SENTINEL

MAX_STREAM_BYTES = 2**31 - 1


def _file_windows(path, window: int, overlap: int) -> Iterator[bytes]:
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        base = 0
        while base < size:
            f.seek(base)
            yield f.read(window + overlap)
            base += window


def _chunk_windows(chunks: Iterable[bytes], window: int, overlap: int):
    """Re-chunk an arbitrary byte-chunk iterator into overlapping windows."""
    buf = b""
    for c in chunks:
        buf += c
        while len(buf) >= window + overlap:
            yield buf[: window + overlap]
            buf = buf[window:]
    if buf:
        yield buf


class StreamingScanner:
    def __init__(
        self,
        needles: Sequence,
        window_bytes: int = 32 * 1024 * 1024,
        check_every: int = 4,
    ):
        self.batched = BatchedSearcher(needles)
        self.window = window_bytes
        self.overlap = max(self.batched.max_len - 1, 0)
        self.check_every = check_every
        need = max(4 * self.batched.max_t - 1, 3)
        self._kh = need

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

    def _scan(self, windows: Iterator[bytes], early_stop: bool) -> np.ndarray:
        bs = self.batched
        n = len(bs)
        best = jnp.full((n,), SENTINEL, jnp.int32)
        base = 0
        since_check = 0
        for wbytes in windows:
            if base + len(wbytes) > MAX_STREAM_BYTES:
                raise ValueError("stream exceeds int32 offset range (2 GiB)")
            # windows_only: the scan consumes packed windows only, so each
            # window pins ~4 bytes/byte on device instead of ~5.
            dh = preprocess(
                wbytes, kh=self._kh, keep_host=False, windows_only=True
            )
            is_last = len(wbytes) < self.window + self.overlap
            parts = []
            blobs = []
            for grp in bs.groups:
                # Count positions only in [base, base + window): the overlap
                # peek belongs to the next window — except in the final
                # window, where the stream's true end applies.
                lens = grp.lengths
                end_local = len(wbytes) - lens + 1 if is_last else np.minimum(
                    self.window, len(wbytes) - lens + 1
                )
                end_local = np.maximum(end_local, 0)
                ends = grp.pad_ends(base + end_local)
                end_local = grp.pad_ends(end_local)
                if not dh.tiled:
                    from ..ops import xla_backend

                    local = xla_backend.find_batched_flat(
                        dh.flat, grp.values_dev, grp.masks_dev,
                        jnp.asarray(end_local.astype(np.int32)),
                    )
                    first = jnp.where(
                        local < SENTINEL, local + base, SENTINEL
                    )
                else:
                    first = scan_kernel.batched_find_cols(
                        None,
                        grp.values_dev,
                        grp.masks_dev,
                        ends.astype(np.int32),
                        s=dh.s,
                        base=base,
                        pw=dh.windows(),
                    )
                parts.append(first)
                blobs.append(grp.indices.tobytes())
            from ..models.batched import _scatter_groups

            window_first = _scatter_groups(n, tuple(blobs), parts)
            # Needles not present in this window scatter as SENTINEL; padded
            # slots in groups are filtered by end masking already.
            best = jnp.minimum(best, window_first)
            base += self.window
            since_check += 1
            if early_stop and since_check >= self.check_every:
                since_check = 0
                if bool((np.asarray(best) < SENTINEL).all()):
                    break
        out = np.asarray(best).astype(np.int64)
        out[out >= SENTINEL] = -1
        return out
