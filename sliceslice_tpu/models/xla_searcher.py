"""Portable XLA searcher — the ``StdSimdSearcher`` analogue (src/stdsimd.rs):
the same probe algorithm through the compiler's portable vector model, with no
Pallas dependency.  Runs on any JAX backend; used in tests as the
differential reference for the native kernels."""

from __future__ import annotations

import numpy as np

from ..needle import probe_program
from ..ops import xla_backend
from ..ops.layout import DeviceHaystack
from ..searcher import SearcherBase


class XlaSearcher(SearcherBase):
    def __init__(self, needle, position=None):
        super().__init__(needle, position)
        if self.needle.size == 0:
            raise ValueError("empty needle")
        vals, msks = probe_program(self.needle.data)
        self._values = np.asarray(vals, np.uint32)
        self._masks = np.asarray(msks, np.uint32)

    def _find_device(self, dh: DeviceHaystack):
        k = self.needle.size
        end = dh.length - k + 1
        if not dh.tiled:
            return xla_backend.find_flat(dh.flat, self._values, self._masks, end)
        dh = dh.ensure_kh(k)
        return xla_backend.find_cols(
            dh.require_cols(), self._values, self._masks, end, dh.s
        )
