"""Searcher model family — the analogue of the reference's searcher structs
(Avx2/Neon/Wasm32/StdSimd/Memchr/Dynamic, SURVEY.md §2.1 L2/L3)."""

from .batched import BatchedSearcher
from .dynamic import DynamicSearcher
from .memchr import MemchrSearcher
from .naive import NaiveSearcher, naive_find, naive_windows_find
from .pallas_searcher import (
    SPECIALIZED,
    SPECIALIZED_SIZES,
    PallasSearcher,
    searcher_for_size,
)
from .xla_searcher import XlaSearcher

__all__ = [
    "BatchedSearcher",
    "DynamicSearcher",
    "MemchrSearcher",
    "NaiveSearcher",
    "naive_find",
    "naive_windows_find",
    "PallasSearcher",
    "XlaSearcher",
    "SPECIALIZED",
    "SPECIALIZED_SIZES",
    "searcher_for_size",
]
