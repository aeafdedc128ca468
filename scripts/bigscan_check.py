"""Real-chip scale check: stream a synthetic >4 GiB corpus and assert exact
int64 first-match offsets (VERDICT r1 item 1's "done" bar — the 2 GiB int32
ceiling is gone end-to-end).

The corpus is generated procedurally in chunks (never materialized whole):
lowercase-random filler with distinctive uppercase needles planted at known
offsets, including past 2**31 and 2**32.  An absent needle proves the
no-match path, and a needle planted twice proves first-occurrence semantics
across distant windows.

Usage:  python scripts/bigscan_check.py [total_gib]    (default 4.5)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from sliceslice_tpu.utils.streaming import StreamingScanner

CHUNK = 64 * 1024 * 1024


def make_plants(total: int):
    """(offset, needle) plants at boundary-critical offsets."""
    plants = [
        (1_000, b"ALPHA-NEEDLE-01!"),
        (2**31 - 8, b"STRADDLE-2GIB-XX"),   # straddles the int32 boundary
        (2**31 + 12_345, b"BETA-NEEDLE-002!"),
        (2**32 + 777, b"GAMMA-NEEDLE-03!"),
        (total - 20, b"OMEGA-NEEDLE-04!"),
    ]
    # First-occurrence: plant DELTA twice, expect the earlier offset.
    plants.append((2**31 + 9_999_999, b"DELTA-NEEDLE-05!"))
    plants.append((2**32 + 50_000_000, b"DELTA-NEEDLE-05!"))
    return [(o, n) for o, n in plants if o + len(n) <= total]


def chunks(total: int, plants):
    for base in range(0, total, CHUNK):
        size = min(CHUNK, total - base)
        rng = np.random.default_rng(base)  # deterministic per chunk
        buf = rng.integers(97, 123, (size,), dtype=np.uint8)
        for off, nd in plants:
            a = np.frombuffer(nd, dtype=np.uint8)
            lo, hi = off, off + len(nd)
            s, e = max(lo, base), min(hi, base + size)
            if s < e:  # plant (possibly a chunk-straddling slice)
                buf[s - base : e - base] = a[s - lo : e - lo]
        yield buf.tobytes()


def main():
    total = int(float(sys.argv[1]) * 2**30) if len(sys.argv) > 1 else int(4.5 * 2**30)
    plants = make_plants(total)
    expected = {}
    for off, nd in plants:
        expected[nd] = min(expected.get(nd, off), off)
    needles = sorted(expected) + [b"ABSENT-NEEDLE-Z!"]
    exp = [expected.get(nd, -1) for nd in needles]

    sc = StreamingScanner(needles, window_bytes=128 * 1024 * 1024)
    t0 = time.perf_counter()
    got = sc.find_in_chunks(chunks(total, plants), early_stop=False)
    dt = time.perf_counter() - t0

    ok = list(got) == exp
    gbs = total / dt / 1e9
    print(f"total {total / 2**30:.2f} GiB in {dt:.1f} s  ({gbs:.2f} GB/s "
          "end-to-end incl. host generation + tunnel upload)")
    for nd, g, e in zip(needles, got, exp):
        mark = "ok" if g == e else f"MISMATCH (expected {e})"
        print(f"  {nd.decode():18s} -> {g:>13d}  {mark}")
    if not ok:
        sys.exit(1)
    print("bigscan: exact int64 parity past 4 GiB")


if __name__ == "__main__":
    main()
