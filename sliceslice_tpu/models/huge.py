"""Huge-needle searcher: needles beyond the generic kernels' probe-table
budget (``MAX_NEEDLE_LEN``), supported exactly via filter + verify.

The reference accepts arbitrary-length needles through one generic path
(src/lib.rs:52-59) because its filter is only ever two bytes wide and the
verify is a serial memcmp (src/lib.rs:199-251).  The TPU kernels instead
verify *in-kernel* with a probe table whose width scales with the needle —
bounded by halo rows and VMEM.  Past that bound this searcher restores the
reference's filter+verify split at a coarser grain:

* **filter (device)** — scan for the needle's first ``PREFIX_LEN`` bytes
  with the packed-bitmap op (one full-bandwidth pass, all candidate
  positions at once).  A 64-byte prefix is a vastly stronger filter than
  the reference's 2-byte first/last hash, so candidates are rare by
  construction;
* **verify (host)** — memcmp the full needle at each candidate against the
  retained host bytes (libc speed; work proportional to the handful of
  survivors).

Exact for find/count/positions.  Adversarial repetition of a 64-byte block
degrades toward a host scan — the same worst case the reference's 2-byte
filter has at far lower repetition cost (its DoS knob ``with_position``
merely reshuffles which bytes repeat, src/x86.rs:252-255).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..needle import MAX_NEEDLE_LEN, Needle, NeedleLike, as_bytes
from ..ops.layout import DeviceHaystack
from ..searcher import HaystackLike, SearcherBase, _hay_bytes

#: Device-filter prefix width: 16 probe slots (the unrolled-kernel budget is
#: irrelevant here — the bitmap op chains any static width), chosen to fit
#: the default layout halo (needed_halo(64) = 63 <= DEFAULT_KH) so a
#: default-preprocessed haystack needs no relayout.
PREFIX_LEN = 64


class HugeNeedleSearcher(SearcherBase):
    """Exact searcher for needles longer than ``MAX_NEEDLE_LEN``."""

    def __init__(self, needle: NeedleLike, position: Optional[int] = None):
        data = as_bytes(needle)
        k = len(data)
        if k <= MAX_NEEDLE_LEN:
            raise ValueError(
                f"HugeNeedleSearcher is for needles > {MAX_NEEDLE_LEN} bytes"
            )
        if position is None:
            position = k - 1
        if not (0 <= position < k):
            raise ValueError(
                f"invalid position {position} for needle of length {k} "
                "(reference contract: position < needle.size(), src/x86.rs:300)"
            )
        # The device filter runs on the prefix; full bytes live here.
        self.needle = Needle(data[:PREFIX_LEN], min(position, PREFIX_LEN - 1))
        self._full = data
        self._position = position

    @property
    def size(self) -> int:
        return len(self._full)

    @property
    def position(self) -> int:
        return self._position

    # -- candidate machinery --------------------------------------------------

    def _candidates(self, hay: HaystackLike) -> tuple[np.ndarray, bytes]:
        """(ascending candidate offsets of the prefix, host bytes)."""
        if isinstance(hay, DeviceHaystack):
            data = hay.host_bytes
            if data is None:
                raise ValueError(
                    "huge-needle search requires host bytes for the verify "
                    "step (preprocess with keep_host=True)"
                )
            dh: HaystackLike = hay
        else:
            data = _hay_bytes(hay)
            dh = hay
        if len(data) < len(self._full):
            return np.empty((0,), np.int64), data
        prefix_searcher = _prefix_searcher(self.needle)
        return prefix_searcher.positions(dh), data

    def _verified(self, hay: HaystackLike) -> np.ndarray:
        cands, data = self._candidates(hay)
        k = len(self._full)
        out = [int(c) for c in cands if data[c : c + k] == self._full]
        return np.asarray(out, dtype=np.int64)

    # -- public API (SearcherBase signatures) ---------------------------------

    def find(self, hay: HaystackLike) -> Optional[int]:
        cands, data = self._candidates(hay)
        k = len(self._full)
        for c in cands:
            if data[c : c + k] == self._full:
                return int(c)
        return None

    def count_in(self, hay: HaystackLike) -> int:
        return int(self._verified(hay).size)

    def positions(self, hay: HaystackLike) -> np.ndarray:
        return self._verified(hay)


def _prefix_searcher(prefix_needle: Needle):
    """A plain generic searcher over the prefix bytes (its ``positions``
    drives the bitmap filter)."""
    from .pallas_searcher import searcher_for_size

    cls = searcher_for_size(prefix_needle.size)
    return cls(prefix_needle.data, prefix_needle.position)
