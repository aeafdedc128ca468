"""All-occurrence positions (capability extension: the ``find_iter`` of
memchr-class libraries; the reference returns bool only).  Oracle =
repeated ``bytes.find`` host scan; cases hammer overlap, boundaries, and
the packed-bitmap decode."""

import numpy as np
import pytest

from sliceslice_tpu import BatchedSearcher, DynamicSearcher, preprocess
from sliceslice_tpu.ops import xla_backend
from sliceslice_tpu.searcher import _host_positions


def oracle(hay: bytes, nd: bytes) -> np.ndarray:
    return _host_positions(hay, nd)


def test_host_positions_oracle_shapes():
    assert _host_positions(b"aaaa", b"aa").tolist() == [0, 1, 2]
    assert _host_positions(b"abababa", b"aba").tolist() == [0, 2, 4]
    assert _host_positions(b"abc", b"").tolist() == [0, 1, 2, 3]
    assert _host_positions(b"", b"x").size == 0


@pytest.mark.parametrize(
    "nd",
    [b"a", b"ab", b"aa", b"abcde", b"0123456789abcdef!", b"zzqx"],
)
def test_positions_short_host_path(nd):
    hay = (b"abcde" * 400) + (b"a" * 37)  # < SHORT_HAY_BYTES
    got = DynamicSearcher(nd).positions(hay)
    assert got.tolist() == oracle(hay, nd).tolist()


@pytest.mark.parametrize(
    "nd",
    [
        b"e",           # memchr-class
        b"th",          # 2 bytes
        b"the",         # masked final slot
        b"tion",        # exact width 1
        b"register",    # width 2
        b"interrupted", # width 3
    ],
)
def test_positions_device_bitmap(i386_small, nd):
    dh = preprocess(i386_small, kh=16)
    got = DynamicSearcher(nd).positions(dh)
    exp = oracle(i386_small, nd)
    assert got.tolist() == exp.tolist()
    # count_in must agree with the number of positions
    assert DynamicSearcher(nd).count_in(dh) == exp.size


def test_positions_periodic_overlap_device(i386_small):
    hay = b"ab" * 3 + i386_small + b"a" * 64 + i386_small[: 2**12]
    dh = preprocess(hay, kh=16)
    for nd in (b"aa", b"aaa", b"abab"):
        got = DynamicSearcher(nd).positions(dh)
        assert got.tolist() == oracle(hay, nd).tolist()


def test_positions_segment_boundary(i386_small):
    # Force a multi-segment layout and plant needles straddling the
    # segment boundary.
    hay = i386_small * 3
    dh = preprocess(hay, kh=16, seg_rows=64)
    assert dh.g >= 2
    seg = dh.seg_bytes
    nd = hay[seg - 5 : seg + 5]
    got = DynamicSearcher(nd).positions(dh)
    assert got.tolist() == oracle(hay, nd).tolist()
    # last valid position
    tail = hay[-7:]
    got = DynamicSearcher(tail).positions(dh)
    assert got.tolist() == oracle(hay, tail).tolist()


def test_positions_absent_and_empty(i386_small):
    dh = preprocess(i386_small, kh=16)
    assert DynamicSearcher(b"\xff\xfe\xfd").positions(dh).size == 0
    got = DynamicSearcher(b"").positions(dh)
    assert got.size == len(i386_small) + 1
    assert got[0] == 0 and got[-1] == len(i386_small)


def test_find_iter_matches_positions(i386_small):
    dh = preprocess(i386_small, kh=16)
    s = DynamicSearcher(b"the")
    assert list(s.find_iter(dh)) == s.positions(dh).tolist()


def test_positions_all_batched(i386_small, words):
    dh = preprocess(i386_small, kh=24)
    nds = [w for w in words[:40] if w] + [b"", b"\xff\xfe\xfd"]
    res = BatchedSearcher(nds).positions_all(dh, batch=8)
    assert len(res) == len(nds)
    for nd, got in zip(nds, res):
        assert got.tolist() == oracle(i386_small, nd).tolist(), nd


def test_decode_match_bitmap_roundtrip(rng):
    # Synthetic bitmap: random bits -> decode -> recompute positions.
    g, s = 2, 64
    words = rng.integers(0, 2**32, (g, s // 32, 128), dtype=np.uint32)
    pos = xla_backend.decode_match_bitmap(words, s)
    assert (np.diff(pos) > 0).all()  # strictly ascending, no dupes
    # Reconstruct the bitmap from the decoded positions.
    back = np.zeros((g, s // 32, 128), np.uint32)
    seg = s * 128
    for p in pos:
        gi, rem = divmod(int(p), seg)
        lane, row = divmod(rem, s)
        back[gi, row // 32, lane] |= np.uint32(1) << np.uint32(row % 32)
    assert (back == words).all()


def test_compact_positions_cap_edges(rng):
    """The sparse compact tier is exact at count == cap and falls back to
    the bitmap at count == cap + 1; both tiers agree with the oracle."""
    from sliceslice_tpu.models.batched import BatchedSearcher
    from sliceslice_tpu.ops.layout import preprocess

    filler = bytes(rng.integers(103, 110, (120_000,), dtype=np.uint8))
    hay = bytearray(filler)
    cap = 64
    # Plant exactly cap occurrences of one needle and cap+1 of another.
    for i in range(cap):
        p = 37 + i * 1_500
        hay[p : p + 4] = b"XYZ!"
    for i in range(cap + 1):
        p = 900 + i * 1_100
        hay[p : p + 4] = b"QRS?"
    hay = bytes(hay)
    dh = preprocess(hay, force_cols=True)
    bs = BatchedSearcher([b"XYZ!", b"QRS?", b"NOPE!", hay[5:13]])
    got = bs.positions_all(dh, sparse_cap=cap)

    def oracle(nd):
        out, q = [], hay.find(nd)
        while q >= 0:
            out.append(q)
            q = hay.find(nd, q + 1)
        return out

    for nd, g in zip([b"XYZ!", b"QRS?", b"NOPE!", hay[5:13]], got):
        assert list(g) == oracle(nd), nd
    # Sanity on the tier split: XYZ! had exactly cap matches (compact),
    # QRS? one more (bitmap fallback) — both exact above.
    assert len(got[0]) == cap and len(got[1]) == cap + 1


def test_compact_vs_bitmap_differential(rng):
    """Randomized differential: the compact tier agrees with the bitmap
    decode for random content, needle widths, ends clamps, and caps."""
    from sliceslice_tpu.needle import build_probe_table
    from sliceslice_tpu.ops import xla_backend
    from sliceslice_tpu.ops.layout import preprocess

    for trial in range(6):
        n_bytes = int(rng.integers(20_000, 120_000))
        lo, hi = (97, 101) if trial % 2 else (0, 256)
        hay = bytes(rng.integers(lo, hi, (n_bytes,), dtype=np.uint8))
        dh = preprocess(hay, force_cols=True)
        needles = []
        for _ in range(5):
            k = int(rng.integers(2, 20))
            o = int(rng.integers(0, n_bytes - k))
            needles.append(hay[o : o + k])
        needles.append(b"\xff\x00ABSENT")
        vals, msks, lens = build_probe_table(needles)
        ends = np.maximum(dh.length - lens + 1, 0)
        if trial == 3:  # caller-clamped ends (streaming window clamp)
            ends = np.minimum(ends, n_bytes // 2)
        cap = int(rng.integers(4, 600))
        cnt, pos = xla_backend.compact_positions_batched(
            dh.require_cols(), vals, msks, ends, dh.s, cap
        )
        cnt = np.asarray(cnt)
        pos = np.asarray(pos)
        words = np.asarray(
            xla_backend.match_bitmap_batched(
                dh.require_cols(), vals, msks,
                np.asarray(ends, np.int32), dh.s,
            )
        )
        for j in range(len(needles)):
            exp = xla_backend.decode_match_bitmap(words[j], dh.s)
            assert int(cnt[j]) == exp.size, (trial, needles[j][:8])
            take = min(cap, exp.size)
            assert list(pos[j][:take]) == list(exp[:take]), (
                trial, needles[j][:8]
            )
