"""Dynamic needle-length dispatch — the ``DynamicAvx2Searcher`` analogue
(src/x86.rs:397-526): pick the right specialization at construction time.

Arms: empty needle -> always-true N0 (src/x86.rs:470,500); one byte ->
MemchrSearcher (src/x86.rs:471-475); 2..=16 -> static-offset specialized
kernels (src/x86.rs:476-490); otherwise the generic searcher (src/x86.rs:491).
"""

from __future__ import annotations

from typing import Optional

from ..needle import NeedleLike, as_bytes
from ..searcher import EmptyNeedleSearcher, HaystackLike
from .memchr import MemchrSearcher
from .pallas_searcher import PallasSearcher, searcher_for_size


class DynamicSearcher:
    def __init__(self, needle: NeedleLike, position: Optional[int] = None):
        data = as_bytes(needle)
        k = len(data)
        if k == 0:
            if position not in (None, 0):
                raise ValueError("invalid position for empty needle")
            self._inner = EmptyNeedleSearcher()
        elif k == 1:
            self._inner = MemchrSearcher(data, position)
        else:
            self._inner = searcher_for_size(k)(data, position)

    @classmethod
    def with_position(cls, needle: NeedleLike, position: int):
        return cls(needle, position)

    @property
    def inner(self):
        return self._inner

    @property
    def size(self) -> int:
        return self._inner.size

    @property
    def position(self) -> int:
        return self._inner.position

    def search_in(self, hay: HaystackLike) -> bool:
        return self._inner.search_in(hay)

    inlined_search_in = search_in

    def find(self, hay: HaystackLike) -> Optional[int]:
        return self._inner.find(hay)

    def __repr__(self):
        return f"DynamicSearcher({self._inner!r})"
