"""ctypes bindings for the native SWAR scanner (csrc/swarscan.cpp).

Compiled on first use with the system toolchain (g++ -O3), cached next to the
source.  This is the CPU competitor-baseline tier of the benchmark harness —
the counterpart of the reference's sse4-strstr FFI crate
(bench/sse4-strstr/build.rs) — and a fast independent oracle for conformance
sweeps.  Gated: everything degrades to the pure-Python oracle when no
toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SRCS = [
    os.path.abspath(os.path.join(_CSRC, "swarscan.cpp")),
    os.path.abspath(os.path.join(_CSRC, "twoway.cpp")),
]


def _host_tag() -> str:
    """Fingerprint of this host's ISA extensions: the cache is compiled
    with -march=native, so a .so that traveled with the working tree to a
    different CPU (NFS home, rsync) must MISS and rebuild — dlopen checks
    only ELF arch, and a stale cache would SIGILL at the first call."""
    import hashlib

    data = b""
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith(b"flags") or line.startswith(b"Features"):
                    data = line
                    break
    except OSError:
        pass
    if not data:
        import platform

        data = (platform.machine() + platform.processor()).encode()
    return hashlib.sha1(data).hexdigest()[:10]


_SO = os.path.abspath(
    os.path.join(_CSRC, "build", f"libswarscan-{_host_tag()}.so")
)

_lib = None
_tried = False


def _build() -> Optional[str]:
    try:
        os.makedirs(os.path.dirname(_SO), exist_ok=True)
        cached = os.path.exists(_SO) and all(
            os.path.getmtime(_SO) >= os.path.getmtime(src) for src in _SRCS
        )
    except OSError:
        # Read-only install / missing sources: the documented degradation
        # is pure-Python, never an exception from the search path.
        return None
    if cached:
        return _SO
    # Atomic publish: compile to a private temp path, then rename — a
    # concurrent process can never dlopen a half-written ELF, and a
    # rebuild never truncates a .so another process has mapped.
    tmp = f"{_SO}.tmp.{os.getpid()}"
    for cxx in ("g++", "clang++", "c++"):
        try:
            subprocess.run(
                [cxx, "-O3", "-march=native", "-shared", "-fPIC", *_SRCS,
                 "-o", tmp],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, _SO)
            return _SO
        except (OSError, subprocess.CalledProcessError):
            try:
                os.remove(tmp)
            except OSError:
                pass
            continue
    return None


def load() -> Optional[ctypes.CDLL]:
    """The compiled library, or None when unavailable (no toolchain)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    so = _build()
    if so is None:
        return None
    try:
        _lib = _bind(ctypes.CDLL(so))
    except OSError:
        # Corrupt or ISA-incompatible cached .so (e.g. built with
        # -march=native on a different host sharing this filesystem):
        # degrade, don't crash the search path.
        return None
    except AttributeError:
        # A stale cached .so from an older source (preserved mtimes) can
        # lack newer symbols: force one rebuild, then degrade to None (the
        # documented no-toolchain fallback) rather than raising.
        try:
            os.remove(_SO)
        except OSError:
            return None
        so = _build()
        if so is None:
            return None
        try:
            _lib = _bind(ctypes.CDLL(so))
        except (OSError, AttributeError):
            return None
    return _lib


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.swar_find_pos.restype = ctypes.c_int64
    lib.swar_find_pos.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.swar_find.restype = ctypes.c_int64
    lib.swar_find.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
    ]
    lib.swar_find_batch.restype = None
    lib.swar_find_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int64), ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64),
    ]
    lib.swar_pairwise.restype = None
    lib.swar_pairwise.argtypes = [
        ctypes.c_char_p, np.ctypeslib.ndpointer(np.int64), ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int8),
    ]
    lib.twoway_find.restype = ctypes.c_int64
    lib.twoway_find.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
    ]
    lib.twoway_find_batch.restype = None
    lib.twoway_find_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int64), ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64),
    ]
    lib.decode_bitmap_count.restype = ctypes.c_int64
    lib.decode_bitmap_count.argtypes = [
        np.ctypeslib.ndpointer(np.uint32), ctypes.c_int64,
    ]
    lib.decode_bitmap.restype = ctypes.c_int64
    lib.decode_bitmap.argtypes = [
        np.ctypeslib.ndpointer(np.uint32), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64), ctypes.c_int64,
    ]
    return lib


def available() -> bool:
    return load() is not None


def swar_find(hay: bytes, needle: bytes, position: Optional[int] = None) -> Optional[int]:
    lib = load()
    if lib is None:
        raise RuntimeError("native swarscan unavailable (no C++ toolchain)")
    pos = len(needle) - 1 if position is None else position
    r = lib.swar_find_pos(hay, len(hay), needle, len(needle), pos)
    return None if r < 0 else int(r)


def _pack(needles: Sequence[bytes]):
    offsets = np.zeros(len(needles) + 1, dtype=np.int64)
    for i, nd in enumerate(needles):
        offsets[i + 1] = offsets[i] + len(nd)
    return b"".join(needles), offsets


def swar_find_batch(hay: bytes, needles: Sequence[bytes]) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native swarscan unavailable (no C++ toolchain)")
    flat, offsets = _pack(needles)
    out = np.empty(len(needles), dtype=np.int64)
    lib.swar_find_batch(hay, len(hay), flat, offsets, len(needles), out)
    return out


def twoway_find(hay: bytes, needle: bytes) -> Optional[int]:
    """First occurrence via the from-scratch Two-Way scanner
    (csrc/twoway.cpp) — the measured counterpart of the reference's
    twoway/memmem competitor rows."""
    lib = load()
    if lib is None:
        raise RuntimeError("native twoway unavailable (no C++ toolchain)")
    r = lib.twoway_find(hay, len(hay), needle, len(needle))
    return None if r < 0 else int(r)


def twoway_find_batch(hay: bytes, needles: Sequence[bytes]) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native twoway unavailable (no C++ toolchain)")
    flat, offsets = _pack(needles)
    out = np.empty(len(needles), dtype=np.int64)
    lib.twoway_find_batch(hay, len(hay), flat, offsets, len(needles), out)
    return out


def swar_pairwise(words: Sequence[bytes]) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native swarscan unavailable (no C++ toolchain)")
    flat, offsets = _pack(words)
    out = np.empty((len(words), len(words)), dtype=np.int8)
    lib.swar_pairwise(flat, offsets, len(words), out)
    return out.astype(bool)


def decode_bitmap(words: np.ndarray, s: int) -> Optional[np.ndarray]:
    """Native match-bitmap decode: uint32[(g, q, lanes)] -> sorted int64
    offsets, or None when the toolchain is unavailable (callers fall back
    to the numpy unpackbits decode, which materializes 8x the bitmap)."""
    lib = load()
    if lib is None:
        return None
    w = np.ascontiguousarray(np.asarray(words, dtype=np.uint32))
    g, q, lanes = w.shape
    flat = w.reshape(-1)
    m = int(lib.decode_bitmap_count(flat, flat.size))
    out = np.empty(m, dtype=np.int64)
    got = int(lib.decode_bitmap(flat, g, q, lanes, s, out, m))
    if got != m:
        # Count/fill disagreement (e.g. the buffer mutated between the two
        # passes): never return uninitialized memory — let the caller fall
        # back to the numpy decode.
        return None
    out.sort()
    return out
