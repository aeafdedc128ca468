"""Overlapping occurrence counts (capability extension): oracle-differential
across the searcher family, boundary-straddling and periodic inputs."""

import numpy as np
import pytest

from sliceslice_tpu import (
    BatchedSearcher,
    DynamicSearcher,
    overlapping_count,
    preprocess,
)
from sliceslice_tpu.models.pallas_searcher import PallasSearcher


def oracle_count(hay: bytes, nd: bytes) -> int:
    if not nd:
        return len(hay) + 1
    return sum(
        1 for i in range(len(hay) - len(nd) + 1) if hay[i : i + len(nd)] == nd
    )


def test_overlapping_count_host_oracle():
    assert overlapping_count(b"aaaa", b"aa") == 3
    assert overlapping_count(b"abababa", b"aba") == 3
    assert overlapping_count(b"abc", b"") == 4
    assert overlapping_count(b"", b"x") == 0


@pytest.mark.parametrize("k", [1, 2, 3, 4, 5, 7, 8, 12, 17, 40])
def test_count_in_device(rng, k):
    hay = bytes(rng.integers(97, 101, (40_000,), dtype=np.uint8))
    nd = bytes(hay[137 : 137 + k])
    dh = preprocess(hay, force_cols=True)
    s = DynamicSearcher(nd)
    assert s.count_in(dh) == oracle_count(hay, nd)
    # host-bytes path (small haystack -> host rung)
    assert s.count_in(hay[:3000]) == oracle_count(hay[:3000], nd)


def test_count_periodic_overlaps(rng):
    hay = b"ab" * 20_000 + b"c"
    dh = preprocess(hay, force_cols=True)
    for nd in (b"ab", b"aba", b"abab", b"ababab", b"b", b"bc"):
        assert DynamicSearcher(nd).count_in(dh) == oracle_count(hay, nd), nd


def test_count_trivial_and_empty():
    assert DynamicSearcher(b"").count_in(b"abc") == 4
    assert DynamicSearcher(b"abc").count_in(b"abc") == 1
    assert DynamicSearcher(b"abcd").count_in(b"abc") == 0
    dh = preprocess(b"xyz")
    assert DynamicSearcher(b"").count_in(dh) == 4


def test_count_all_batched(rng, words):
    hay = bytes(rng.integers(97, 104, (150_000,), dtype=np.uint8))
    idx = rng.integers(0, len(words), (60,))
    needles = [words[int(i)] for i in idx] + [b"", b"g", hay[500:504], hay[77:97]]
    dh = preprocess(hay, force_cols=True)
    got = BatchedSearcher(needles).count_all(dh)
    exp = np.array([oracle_count(hay, nd) for nd in needles], dtype=np.int64)
    assert (got == exp).all()


def test_count_segment_boundary(rng):
    # matches straddling segment boundaries count exactly once
    hay = bytearray(rng.integers(97, 100, (70_000,), dtype=np.uint8))
    dh0 = preprocess(bytes(hay), force_cols=True, seg_rows=64)
    seg = dh0.seg_bytes
    nd = b"QWERTY"
    for p in (seg - 5, seg - 1, seg, 2 * seg - 3):
        hay2 = bytes(hay[:p]) + nd + bytes(hay[p + len(nd):])
        dh = preprocess(hay2, force_cols=True, seg_rows=64)
        assert DynamicSearcher(nd).count_in(dh) == oracle_count(hay2, nd)


def test_count_in_pallas_vs_batched(rng):
    hay = bytes(rng.integers(97, 100, (60_000,), dtype=np.uint8))
    dh = preprocess(hay, force_cols=True)
    nds = [hay[11:16], hay[100:103], b"aab"]
    batched = BatchedSearcher(nds).count_all(dh)
    for nd, c in zip(nds, batched):
        assert PallasSearcher(nd).count_in(dh) == c == oracle_count(hay, nd)


def test_count_clean_vs_boundary_segments(rng):
    """The count kernel's clean-segment fast path (no per-needle validity
    plane on segments entirely below every end) must agree with the masked
    path everywhere: ends at segment boundaries, mid-segment, and
    caller-clamped far below the corpus end (the streaming window clamp),
    with matches planted on both sides of each end."""
    from sliceslice_tpu.ops import scan_kernel
    from sliceslice_tpu.needle import build_probe_table

    hay = bytearray(rng.integers(97, 100, (80_000,), dtype=np.uint8))
    nd = b"abcab"
    # Plant matches: early, straddling seg boundaries, and near the tail.
    dh0 = preprocess(bytes(hay), force_cols=True, seg_rows=64)
    seg = dh0.seg_bytes
    spots = [3, seg - 2, seg + 10, 2 * seg - 3, len(hay) - len(nd),
             seg // 2, 3 * seg + 7]
    for p in spots:
        hay[p : p + len(nd)] = nd
    hay = bytes(hay)
    dh = preprocess(hay, force_cols=True, seg_rows=64)
    vals, msks, lens = build_probe_table([nd, nd, b"bca"])
    for end in (
        dh.length - len(nd) + 1,          # true end (last segment boundary)
        seg,                              # exactly one clean segment
        seg + 1, 2 * seg - 1,             # mid-corpus cuts
        5, 0,                             # clamp inside segment 0 / nothing
    ):
        ends = np.minimum(
            np.maximum(dh.length - lens + 1, 0), end
        ).astype(np.int32)
        got = np.asarray(
            scan_kernel.batched_count_cols(
                None, vals, msks, ends, s=dh.s, pw=dh.windows()
            )
        )
        exp = []
        for needle, e in zip((nd, nd, b"bca"), ends):
            c, p = 0, hay.find(needle)
            while 0 <= p < e:
                c += 1
                p = hay.find(needle, p + 1)
            exp.append(c)
        assert list(got) == exp, (end, list(got), exp)
