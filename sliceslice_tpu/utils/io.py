"""Corpus ingestion — the mmap layer (reference: memmap2 usage,
examples/grep.rs:49-50): map a file without copying, hand zero-copy views to
the layout builder."""

from __future__ import annotations

import mmap
import os
from typing import Union

import numpy as np

from ..ops.layout import DeviceHaystack, preprocess


def map_file(path: Union[str, os.PathLike]) -> np.ndarray:
    """Memory-map a file as a read-only uint8 array (no copy)."""
    size = os.path.getsize(path)
    if size == 0:
        return np.zeros((0,), dtype=np.uint8)
    with open(path, "rb") as f:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    return np.frombuffer(mm, dtype=np.uint8)


def load_haystack(
    path: Union[str, os.PathLike], kh: int = 64, keep_host: bool = True
) -> DeviceHaystack:
    """mmap + device layout in one step (grep-style ingest)."""
    return preprocess(map_file(path), kh=kh, keep_host=keep_host)
