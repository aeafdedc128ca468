"""Searcher base machinery: preprocess a needle once, search many haystacks.

API parity with the reference searcher objects (src/x86.rs:266-526):

* ``Searcher(needle)`` / ``Searcher.with_position(needle, position)``;
* ``search_in(haystack) -> bool`` — any-match;
* ``find(haystack) -> Optional[int]`` — first-match offset (superset required
  by this build's conformance target);
* ``inlined_search_in`` — alias kept for parity (the reference's variant only
  differs by #[inline], src/lib.rs:128-136);
* empty needles are rejected by concrete searchers (the reference's
  ``assert!(position < size)`` panics, src/x86.rs:300) and handled by the
  dynamic dispatcher's N0 arm (src/x86.rs:470,500).

Haystacks may be bytes-like or a preprocessed
:class:`~sliceslice_tpu.ops.layout.DeviceHaystack` (preprocess once, search
many needles — the mmap-analogue usage of examples/grep.rs).
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from .needle import Needle, NeedleLike, needed_halo
from .ops.layout import SHORT_HAY_BYTES, DeviceHaystack, preprocess
from .ops.scan_math import SENTINEL

HaystackLike = Union[bytes, bytearray, memoryview, np.ndarray, str, DeviceHaystack]


def overlapping_count(data: bytes, needle: bytes) -> int:
    """Host oracle-grade overlapping occurrence count (``bytes.count`` is
    non-overlapping, so it is NOT the right primitive here)."""
    if len(needle) == 0:
        return len(data) + 1
    c = 0
    p = data.find(needle)
    while p != -1:
        c += 1
        p = data.find(needle, p + 1)
    return c


def _host_positions(data: bytes, needle: bytes) -> np.ndarray:
    """Host oracle-grade overlapping match offsets (ascending)."""
    if len(needle) == 0:
        return np.arange(len(data) + 1, dtype=np.int64)
    out = []
    p = data.find(needle)
    while p != -1:
        out.append(p)
        p = data.find(needle, p + 1)
    return np.asarray(out, dtype=np.int64)


def _hay_bytes(hay: HaystackLike) -> bytes:
    if isinstance(hay, str):
        return hay.encode("utf-8")
    if isinstance(hay, np.ndarray):
        if hay.dtype != np.uint8:
            raise TypeError(f"haystack ndarray must be uint8, got {hay.dtype}")
        return hay.tobytes()
    return bytes(hay)


class SearcherBase:
    """Common contract: validation, trivial-length short-circuits, and the
    bytes/DeviceHaystack plumbing. Subclasses implement ``_find_device``."""

    def __init__(self, needle: NeedleLike, position: Optional[int] = None):
        self.needle = Needle(needle, position)

    @classmethod
    def with_position(cls, needle: NeedleLike, position: int):
        """Reference ``with_position`` (src/x86.rs:296-316)."""
        return cls(needle, position)

    @property
    def size(self) -> int:
        return self.needle.size

    @property
    def position(self) -> int:
        return self.needle.position

    # -- public API ---------------------------------------------------------

    def search_in(self, hay: HaystackLike) -> bool:
        return self.find(hay) is not None

    #: #[inline] variant kept for API parity (reference src/x86.rs:353-356).
    inlined_search_in = search_in

    def find(self, hay: HaystackLike) -> Optional[int]:
        k = self.needle.size
        if isinstance(hay, DeviceHaystack):
            if hay.length <= k:
                return self._trivial_find(self._host_bytes_of(hay), k)
            off = int(self._find_device(hay))
            return None if off >= SENTINEL else off
        data = _hay_bytes(hay)
        if len(data) <= k:
            return self._trivial_find(data, k)
        dh = self._layout(data)
        off = int(self._find_device(dh))
        return None if off >= SENTINEL else off

    def count_in(self, hay: HaystackLike) -> int:
        """Number of OVERLAPPING occurrences of the needle — a capability
        extension over the reference's bool ``search_in`` (counting has no
        early exit to lose, so it runs at full-scan bandwidth on device)."""
        k = self.needle.size
        if isinstance(hay, DeviceHaystack):
            if hay.length <= k:
                return self._trivial_count(self._host_bytes_of(hay), k)
            if hay.tiled:
                try:
                    return int(self._count_device(hay))
                except NotImplementedError:
                    pass
            data = self._host_bytes_of(hay)
            if data is None:
                raise ValueError(
                    "counting on this DeviceHaystack requires host bytes "
                    "(preprocess with keep_host=True)"
                )
            return overlapping_count(data, self.needle.data)
        data = _hay_bytes(hay)
        if len(data) <= k:
            return self._trivial_count(data, k)
        if len(data) <= SHORT_HAY_BYTES:
            return overlapping_count(data, self.needle.data)
        dh = self._layout(data)
        try:
            return int(self._count_device(dh))
        except NotImplementedError:
            return overlapping_count(data, self.needle.data)

    def positions(self, hay: HaystackLike) -> np.ndarray:
        """ALL (overlapping) match offsets, ascending (int64[M]) — the
        ``find_iter`` capability of memchr-class libraries, absent from the
        reference's bool-only API.  Device path: one full scan producing a
        packed match bitmap (1/8th corpus bytes), decoded on host; haystacks
        without a tiled layout fall back to a host scan loop."""
        from .needle import probe_program
        from .ops import xla_backend

        k = self.needle.size
        if isinstance(hay, DeviceHaystack):
            if hay.length <= k or not hay.tiled:
                data = self._host_bytes_of(hay)
                if data is None:
                    raise ValueError(
                        "positions on this DeviceHaystack requires host "
                        "bytes (preprocess with keep_host=True)"
                    )
                return _host_positions(data, self.needle.data)
            dh = hay.ensure_kh(k)  # probe slots must fit the layout halo
        else:
            data = _hay_bytes(hay)
            if len(data) <= SHORT_HAY_BYTES:
                return _host_positions(data, self.needle.data)
            dh = self._layout(data)
        values, masks = probe_program(self.needle.data)
        cols = dh.require_cols()
        end = dh.length - k + 1
        # Two-tier: device-compacted earliest offsets for sparse needles
        # (cap words of readback), exact packed-bitmap decode (corpus/8
        # bytes) when the device count exceeds the cap.
        cap = xla_backend.SPARSE_POSITIONS_CAP
        cnt, pos = xla_backend.compact_positions(
            cols, values, masks, end, dh.s, cap
        )
        if int(cnt) <= cap:
            pos = np.asarray(pos)
            return pos[: int(cnt)].astype(np.int64)
        words = xla_backend.match_bitmap_cols(
            cols, values, masks, end, dh.s
        )
        return xla_backend.decode_match_bitmap(np.asarray(words), dh.s)

    def find_iter(self, hay: HaystackLike):
        """Iterator over all (overlapping) match offsets, ascending."""
        return iter(self.positions(hay).tolist())

    # -- helpers ------------------------------------------------------------

    def _trivial_count(self, data: bytes, k: int) -> int:
        if data is None:
            raise ValueError(
                "DeviceHaystack shorter than needle requires host bytes "
                "(preprocess with keep_host=True)"
            )
        if len(data) < k:
            return 0
        return 1 if data == self.needle.data else 0

    def _count_device(self, dh: DeviceHaystack):
        raise NotImplementedError

    def _trivial_find(self, data: bytes, k: int) -> Optional[int]:
        # hay shorter than needle -> no match; equal length -> whole-slice
        # equality (reference src/x86.rs:356-359).
        if data is None:
            raise ValueError(
                "DeviceHaystack shorter than needle requires host bytes "
                "(preprocess with keep_host=True)"
            )
        if len(data) < k:
            return None
        return 0 if data == self.needle.data else None

    @staticmethod
    def _host_bytes_of(dh: DeviceHaystack) -> Optional[bytes]:
        return dh.host_bytes

    def _layout(self, data: bytes) -> DeviceHaystack:
        # One-slot layout cache: repeated searches of the SAME bytes object
        # amortize the preprocess (the mmap-once pattern without requiring
        # the caller to hold a DeviceHaystack).  Keyed by identity with the
        # bytes kept alive in the slot, so ids can't alias.
        slot = getattr(self, "_dh_slot", None)
        if slot is not None and slot[0] is data:
            return slot[1]
        dh = preprocess(data, kh=needed_halo(self.needle.size))
        self._dh_slot = (data, dh)
        return dh

    def _find_device(self, dh: DeviceHaystack):
        raise NotImplementedError

    def __repr__(self):
        return (
            f"{type(self).__name__}(needle={self.needle.data!r}, "
            f"position={self.needle.position})"
        )


class EmptyNeedleSearcher:
    """N0 arm: the empty needle matches every haystack at offset 0
    (reference src/x86.rs:470,500). Only reachable via dynamic dispatch."""

    size = 0
    position = 0

    def search_in(self, hay: HaystackLike) -> bool:
        return True

    inlined_search_in = search_in

    def find(self, hay: HaystackLike) -> Optional[int]:
        return 0

    def count_in(self, hay: HaystackLike) -> int:
        # The empty needle matches at every gap: len + 1 positions.
        if isinstance(hay, DeviceHaystack):
            return hay.length + 1
        return len(_hay_bytes(hay)) + 1

    def positions(self, hay: HaystackLike) -> np.ndarray:
        n = (
            hay.length if isinstance(hay, DeviceHaystack)
            else len(_hay_bytes(hay))
        )
        return np.arange(n + 1, dtype=np.int64)

    def find_iter(self, hay: HaystackLike):
        return iter(self.positions(hay).tolist())

    def __repr__(self):
        return "EmptyNeedleSearcher()"
