"""Native SWAR scanner: differential vs the Python oracle (the ASan-style
memory-safety enforcement is the tail-loop bound in the C++ plus these
boundary-hammering cases)."""

import numpy as np
import pytest

from sliceslice_tpu import naive_find
from sliceslice_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def test_swar_basic():
    hay = b"the quick brown fox jumps over the lazy dog"
    assert native.swar_find(hay, b"quick") == 4
    assert native.swar_find(hay, b"dog") == hay.find(b"dog")
    assert native.swar_find(hay, b"zebra") is None
    assert native.swar_find(hay, b"t") == 0
    assert native.swar_find(hay, b"") == 0
    assert native.swar_find(hay, hay) == 0
    assert native.swar_find(b"ab", b"abc") is None


def test_swar_positions_equivalent():
    hay = b"aaabaaabaaab" * 5
    nd = b"abaa"
    for p in range(len(nd)):
        assert native.swar_find(hay, nd, position=p) == naive_find(hay, nd)


def test_swar_differential(rng):
    hay = bytes(rng.integers(97, 102, (5000,), dtype=np.uint8))
    for k in [1, 2, 3, 4, 7, 8, 9, 15, 16, 17, 40]:
        for _ in range(20):
            start = int(rng.integers(0, 5000 - k))
            nd = hay[start : start + k]
            assert native.swar_find(hay, nd) == naive_find(hay, nd)
        nd = bytes(rng.integers(0, 256, (k,), dtype=np.uint8))
        assert native.swar_find(hay, nd) == naive_find(hay, nd)


def test_swar_boundaries(rng):
    hay = bytes(rng.integers(97, 100, (257,), dtype=np.uint8))
    for k in [2, 3, 8, 9]:
        nd = hay[-k:]
        assert native.swar_find(hay, nd) == naive_find(hay, nd)
        nd2 = hay[-k:-1] + b"\xff"
        assert native.swar_find(hay, nd2) == naive_find(hay, nd2)


def test_swar_batch(rng):
    hay = bytes(rng.integers(97, 103, (3000,), dtype=np.uint8))
    needles = [hay[i : i + k] for i, k in [(0, 3), (100, 8), (2990, 10)]]
    needles += [b"zzz", b"", hay[-1:]]
    got = native.swar_find_batch(hay, needles)
    for nd, o in zip(needles, got):
        exp = naive_find(hay, nd)
        assert (None if o < 0 else int(o)) == exp, nd


def test_swar_pairwise_matches_oracle(rng):
    words = [
        bytes(rng.integers(97, 100, (int(rng.integers(0, 8)),), dtype=np.uint8))
        for _ in range(40)
    ]
    got = native.swar_pairwise(words)
    for i, n in enumerate(words):
        for j, h in enumerate(words):
            assert got[i, j] == (h.find(n) >= 0), (n, h)


def test_decode_bitmap_differential(rng):
    """Native bitmap decoder == numpy unpackbits reference on random maps."""
    import numpy as np

    from sliceslice_tpu.ops.xla_backend import decode_match_bitmap_numpy
    from sliceslice_tpu.utils import native

    if not native.available():
        import pytest

        pytest.skip("no C++ toolchain")
    for (g, q, lanes, s) in [(3, 16, 128, 512), (1, 1, 128, 32)]:
        w = (rng.random((g, q, lanes)) < 0.07).astype(np.uint32)
        w *= rng.integers(1, 2**32, (g, q, lanes), dtype=np.uint32)
        a = native.decode_bitmap(w, s)
        b = decode_match_bitmap_numpy(w, s)
        assert (a == b).all()
    # empty map
    z = np.zeros((2, 4, 128), np.uint32)
    assert native.decode_bitmap(z, 128).size == 0


def test_twoway_differential(rng):
    """From-scratch Two-Way (csrc/twoway.cpp) == bytes.find on adversarial
    inputs: periodic needles, critical-factorization edge cases, small
    alphabets, boundaries."""
    from sliceslice_tpu.utils import native

    if not native.available():
        import pytest

        pytest.skip("no C++ toolchain")
    hay = bytes(rng.integers(97, 100, (60_000,), dtype=np.uint8))
    cases = [
        b"a", b"ab", b"ba", b"aaaa", b"abab", b"aabaab", b"abaab",
        b"aabaa", b"abcabcab", b"zzzz", hay[:7], hay[100:123],
        hay[-9:], hay[30_000:30_040], b"aaaaaaaab", b"baaaaaaaa",
    ]
    for nd in cases:
        exp = hay.find(nd)
        got = native.twoway_find(hay, nd)
        assert (got if got is not None else -1) == exp, nd
    # empty needle matches at 0
    assert native.twoway_find(hay, b"") == 0
    # needle longer than haystack
    assert native.twoway_find(b"ab", b"abc") is None
    # randomized sweep over a tiny alphabet (period-heavy content)
    tiny = bytes(rng.integers(97, 99, (4_000,), dtype=np.uint8))
    for _ in range(400):
        k = int(rng.integers(1, 40))
        if rng.random() < 0.5:
            i = int(rng.integers(0, len(tiny) - k))
            nd = tiny[i : i + k]
        else:
            nd = bytes(rng.integers(97, 99, (k,), dtype=np.uint8))
        exp = tiny.find(nd)
        got = native.twoway_find(tiny, nd)
        assert (got if got is not None else -1) == exp, nd
    # batched
    got = native.twoway_find_batch(hay, cases)
    assert list(got) == [hay.find(nd) for nd in cases]
