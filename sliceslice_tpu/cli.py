"""grep CLI — the examples/grep.rs analogue.

Usage::

    python -m sliceslice_tpu.cli <backend> <needle> <file> [more files...]

Backend selects the searcher by string exactly like the reference's
``search_in_slice`` dispatch (examples/grep.rs:12-40; invalid backend is an
error): ``dynamic`` (length dispatch), ``pallas`` (native kernels), ``xla``
(portable), ``naive`` (oracle), ``memchr`` (1-byte needles), ``batched``
(treats the needle argument as a comma-separated list), ``count``
(grep -c analogue: overlapping occurrence counts, comma-separated needles),
``positions`` (grep -b analogue: every overlapping match offset), and
``stream`` (like ``batched`` but windows the file through a bounded device
footprint — files of any size, offsets exact past 2 GiB;
utils/streaming.py).  In multi-needle lists ``\\,`` escapes a literal
comma and ``\\\\`` a literal backslash (see :func:`split_needles`).

The file is memory-mapped and laid out on device once (the reference mmaps
via memmap2, examples/grep.rs:49-50); output is the match verdict plus the
first-match offset (a superset of the reference's bool print).
"""

from __future__ import annotations

import sys

from .models import (
    BatchedSearcher,
    DynamicSearcher,
    MemchrSearcher,
    NaiveSearcher,
    PallasSearcher,
    XlaSearcher,
)
from .utils.io import load_haystack

BACKENDS = {
    "dynamic": DynamicSearcher,
    "pallas": PallasSearcher,
    "xla": XlaSearcher,
    "naive": NaiveSearcher,
    "memchr": MemchrSearcher,
}


def split_needles(arg: bytes) -> list:
    """Split a multi-needle CLI argument on commas, honoring backslash
    escapes: ``\\,`` is a literal comma, ``\\\\`` a literal backslash.  A
    needle containing a comma is therefore expressible (plain split silently
    produced wrong needles for count/batched/positions backends)."""
    needles = []
    cur = bytearray()
    i = 0
    n = len(arg)
    while i < n:
        c = arg[i : i + 1]
        if c == b"\\" and i + 1 < n and arg[i + 1 : i + 2] in (b",", b"\\"):
            cur += arg[i + 1 : i + 2]
            i += 2
            continue
        if c == b",":
            needles.append(bytes(cur))
            cur = bytearray()
        else:
            cur += c
        i += 1
    needles.append(bytes(cur))
    return needles


def search_in_file(backend: str, needle: bytes, path: str):
    """Returns (found: bool, offset: int|None) — one search, grep-style."""
    if backend == "count":
        # grep -c analogue (overlapping occurrences), comma-separated needles.
        needles = split_needles(needle)
        dh = load_haystack(path, kh=max(max(len(n) for n in needles), 4))
        counts = BatchedSearcher(needles).count_all(dh)
        return [(int(c) > 0, int(c)) for c in counts]
    if backend == "batched":
        needles = split_needles(needle)
        dh = load_haystack(path, kh=max(max(len(n) for n in needles), 4))
        offs = BatchedSearcher(needles).find_all(dh)
        return [(o >= 0, None if o < 0 else int(o)) for o in offs]
    if backend == "stream":
        # Windowed streaming scan: any file size, int64-exact offsets.
        from .utils.streaming import StreamingScanner

        needles = split_needles(needle)
        offs = StreamingScanner(needles).find_in_file(path)
        return [(o >= 0, None if o < 0 else int(o)) for o in offs]
    if backend == "positions":
        # grep -b analogue: every overlapping match offset per needle.
        needles = split_needles(needle)
        dh = load_haystack(path, kh=max(max(len(n) for n in needles), 4))
        pos = BatchedSearcher(needles).positions_all(dh)
        return [(p.size > 0, p) for p in pos]
    cls = BACKENDS.get(backend)
    if cls is None:
        raise SystemExit(
            f"unknown backend {backend!r}; choose from "
            f"{sorted(BACKENDS) + ['batched', 'count', 'positions', 'stream']}"
        )
    dh = load_haystack(path, kh=max(len(needle), 4))
    s = cls(needle)
    off = s.find(dh)
    return off is not None, off


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 3:
        print(
            "usage: python -m sliceslice_tpu.cli <backend> <needle> <file>...",
            file=sys.stderr,
        )
        return 2
    backend, needle, *files = argv
    needle_b = needle.encode("utf-8")
    rc = 1
    for path in files:
        res = search_in_file(backend, needle_b, path)
        if backend == "count":
            for nd, (found, c) in zip(split_needles(needle_b), res):
                print(f"{path}: {nd.decode('utf-8', 'replace')}: {c}")
                rc = 0 if found else rc
        elif backend == "positions":
            for nd, (found, pos) in zip(split_needles(needle_b), res):
                shown = ",".join(map(str, pos[:100].tolist()))
                more = f" (+{pos.size - 100} more)" if pos.size > 100 else ""
                print(
                    f"{path}: {nd.decode('utf-8', 'replace')}: "
                    f"{shown if found else 'no match'}{more}"
                )
                rc = 0 if found else rc
        elif backend in ("batched", "stream"):
            for nd, (found, off) in zip(split_needles(needle_b), res):
                print(f"{path}: {nd.decode('utf-8', 'replace')}: "
                      f"{'match at ' + str(off) if found else 'no match'}")
                rc = 0 if found else rc
        else:
            found, off = res
            print(f"{path}: {'match at ' + str(off) if found else 'no match'}")
            rc = 0 if found else rc
    return rc


if __name__ == "__main__":
    sys.exit(main())
