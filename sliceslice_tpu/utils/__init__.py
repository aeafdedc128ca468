"""Utilities: ingestion, profiling harness."""

from .io import load_haystack, map_file
from .profiling import Measurement, measure
from .streaming import StreamingScanner

__all__ = [
    "load_haystack",
    "map_file",
    "Measurement",
    "measure",
    "StreamingScanner",
]
