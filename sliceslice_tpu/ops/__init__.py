"""Compute ops: device layout, shared scan math, Pallas kernels, XLA paths."""

from . import layout, scan_kernel, scan_math, xla_backend
from .layout import DeviceHaystack, preprocess
from .scan_math import SENTINEL

__all__ = [
    "layout",
    "scan_kernel",
    "scan_math",
    "xla_backend",
    "DeviceHaystack",
    "preprocess",
    "SENTINEL",
]
