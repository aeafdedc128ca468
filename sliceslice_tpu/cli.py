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
utils/streaming.py), plus ``stream-count`` / ``stream-positions`` (the
count / positions analogues over the same windowed path).  In multi-needle lists ``\\,`` escapes a literal
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


MULTI_BACKENDS = (
    "count", "batched", "positions",
    "stream", "stream-count", "stream-positions",
    "sharded", "sharded-count", "sharded-positions",
)


def parse_mesh(spec: str | None):
    """``--mesh DxN`` -> a (data, needle) device mesh; None -> all devices
    on the data axis."""
    from .parallel import make_mesh

    if spec is None:
        import jax

        return make_mesh((len(jax.devices()), 1))
    try:
        d, n = (int(x) for x in spec.lower().replace(",", "x").split("x"))
    except ValueError:
        raise SystemExit(f"invalid mesh spec {spec!r}; expected DxN, e.g. 4x2")
    return make_mesh((d, n))


def make_searcher(backend: str, needle: bytes, mesh_spec: str | None = None):
    """Build the backend's searcher ONCE (probe tables, groups, jit
    programs amortize across every file argument — the library's
    preprocess-once contract applied to the CLI itself)."""
    if backend in ("count", "batched", "positions"):
        needles = split_needles(needle)
        return BatchedSearcher(needles)
    if backend in ("stream", "stream-count", "stream-positions"):
        from .utils.streaming import StreamingScanner

        return StreamingScanner(split_needles(needle))
    if backend in ("sharded", "sharded-count", "sharded-positions"):
        from .parallel import ShardedBatchedSearcher

        return ShardedBatchedSearcher(
            split_needles(needle), parse_mesh(mesh_spec)
        )
    cls = BACKENDS.get(backend)
    if cls is None:
        raise SystemExit(
            f"unknown backend {backend!r}; choose from "
            f"{sorted(BACKENDS) + sorted(MULTI_BACKENDS)}"
        )
    return cls(needle)


def _load_for(searcher, backend: str, path: str):
    """Device layout with the halo the searcher will actually need (sized
    from its bucketed probe widths, so ensure_halo never relayouts)."""
    from .needle import MAX_NEEDLE_LEN, needed_halo, needed_halo_for_t

    if backend in ("count", "batched", "positions") or backend.startswith(
        "sharded"
    ):
        bs = searcher.inner if backend.startswith("sharded") else searcher
        kh = needed_halo_for_t(bs.max_t)
        if bs._huge:
            kh = max(kh, 63)  # the huge-needle 64-byte prefix filter
    else:
        k = searcher.size
        kh = needed_halo(min(k, MAX_NEEDLE_LEN)) if k else 4
    return load_haystack(path, kh=max(kh, 4))


def run_on_file(searcher, backend: str, path: str):
    """Returns (found, offset) — or a per-needle list for multi-needle
    backends — grep-style."""
    if backend == "stream":
        offs = searcher.find_in_file(path)
        return [(o >= 0, None if o < 0 else int(o)) for o in offs]
    if backend == "stream-count":
        counts = searcher.count_in_file(path)
        return [(int(c) > 0, int(c)) for c in counts]
    if backend == "stream-positions":
        pos = searcher.positions_in_file(path)
        return [(p.size > 0, p) for p in pos]
    if backend in ("count", "sharded-count"):
        dh = _load_for(searcher, backend, path)
        counts = searcher.count_all(dh)
        return [(int(c) > 0, int(c)) for c in counts]
    if backend in ("batched", "sharded"):
        dh = _load_for(searcher, backend, path)
        offs = searcher.find_all(dh)
        return [(o >= 0, None if o < 0 else int(o)) for o in offs]
    if backend in ("positions", "sharded-positions"):
        dh = _load_for(searcher, backend, path)
        pos = searcher.positions_all(dh)
        return [(p.size > 0, p) for p in pos]
    dh = _load_for(searcher, backend, path)
    off = searcher.find(dh)
    return off is not None, off


def search_in_file(backend: str, needle: bytes, path: str):
    """One-shot convenience: build + run (prefer make_searcher +
    run_on_file when scanning many files)."""
    return run_on_file(make_searcher(backend, needle), backend, path)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    mesh_spec = None
    bad_flag = False
    for i, a in enumerate(list(argv)):
        # Exact flag match only: "--meshes" must NOT be consumed, and a
        # bare "--mesh" with no value gets the usage error instead of an
        # IndexError (ADVICE r4).
        if a == "--mesh" or a.startswith("--mesh="):
            if "=" in a:
                mesh_spec = a.split("=", 1)[1]
                del argv[i : i + 1]
            elif i + 1 < len(argv):
                mesh_spec = argv[i + 1]
                del argv[i : i + 2]
            else:
                bad_flag = True
            break
    if bad_flag or len(argv) < 3:
        print(
            "usage: python -m sliceslice_tpu.cli [--mesh DxN] "
            "<backend> <needle> <file>...",
            file=sys.stderr,
        )
        return 2
    backend, needle, *files = argv
    needle_b = needle.encode("utf-8")
    searcher = make_searcher(backend, needle_b, mesh_spec)  # once, for every file
    rc = 1
    for path in files:
        res = run_on_file(searcher, backend, path)
        if backend in ("count", "stream-count", "sharded-count"):
            for nd, (found, c) in zip(split_needles(needle_b), res):
                print(f"{path}: {nd.decode('utf-8', 'replace')}: {c}")
                rc = 0 if found else rc
        elif backend in ("positions", "stream-positions", "sharded-positions"):
            for nd, (found, pos) in zip(split_needles(needle_b), res):
                shown = ",".join(map(str, pos[:100].tolist()))
                more = f" (+{pos.size - 100} more)" if pos.size > 100 else ""
                print(
                    f"{path}: {nd.decode('utf-8', 'replace')}: "
                    f"{shown if found else 'no match'}{more}"
                )
                rc = 0 if found else rc
        elif backend in ("batched", "stream", "sharded"):
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
