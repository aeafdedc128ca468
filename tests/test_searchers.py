"""Per-backend property suites — the port of the reference's shared
``generate_tests!`` matrix (src/lib.rs:365-544): six properties
(same/different/prefix/suffix/multiple/middle), every case exercised at
*every* filter-byte ``position`` 0..len, all asserted against the naive
oracle; instantiated for every searcher backend."""

import numpy as np
import pytest

from sliceslice_tpu import (
    DynamicSearcher,
    MemchrSearcher,
    NaiveSearcher,
    PallasSearcher,
    XlaSearcher,
    naive_find,
)
from sliceslice_tpu.models.pallas_searcher import searcher_for_size
from sliceslice_tpu.ops.layout import preprocess

BACKENDS = [DynamicSearcher, PallasSearcher, XlaSearcher, NaiveSearcher]


def check(cls, needle: bytes, hay: bytes):
    """Assert find/search_in parity with the oracle at every position
    (reference sweep src/lib.rs:370-381)."""
    expected = naive_find(hay, needle)
    positions = range(len(needle)) if len(needle) else [None]
    for p in positions:
        s = cls(needle) if p is None else cls.with_position(needle, p)
        assert s.find(hay) == expected, (cls.__name__, needle, hay, p)
        assert s.search_in(hay) == (expected is not None)


@pytest.mark.parametrize("cls", BACKENDS)
def test_search_same(cls):
    # needle == haystack (reference src/lib.rs:422-443)
    for nd in [b"x", b"ab", b"abcd", b"abcdefg", b"foo bar baz qux quux!"]:
        check(cls, nd, nd)


@pytest.mark.parametrize("cls", BACKENDS)
def test_search_different(cls):
    for nd in [b"x", b"ab", b"abcd", b"needle"]:
        check(cls, nd, b"yyyyyyyyyyyyyyyyyyyyyyyyyyyy")


@pytest.mark.parametrize("cls", BACKENDS)
def test_search_prefix(cls):
    for nd in [b"p", b"pre", b"prefix!"]:
        check(cls, nd, nd + b" trailing content here")


@pytest.mark.parametrize("cls", BACKENDS)
def test_search_suffix(cls):
    for nd in [b"s", b"suf", b"suffix!"]:
        check(cls, nd, b"leading content here " + nd)


@pytest.mark.parametrize("cls", BACKENDS)
def test_search_multiple(cls):
    for nd in [b"ab", b"aba"]:
        check(cls, nd, b"ab aba abab ababa " * 3)


@pytest.mark.parametrize("cls", BACKENDS)
def test_search_middle(cls):
    for nd in [b"m", b"mid", b"middle needle"]:
        check(cls, nd, b"some text before " + nd + b" and after")


@pytest.mark.parametrize("cls", BACKENDS)
def test_shorter_and_equal_haystack(cls):
    check(cls, b"abcdef", b"abc")  # hay shorter -> False
    check(cls, b"abcdef", b"abcdef")  # equal -> direct compare
    check(cls, b"abcdef", b"abcdeX")


def test_memchr_backend():
    check(MemchrSearcher, b"q", b"the quick brown fox")
    check(MemchrSearcher, b"z", b"the quick brown fox")
    check(MemchrSearcher, b"\x00", b"ab\x00cd")
    assert MemchrSearcher(b"x").find(b"") is None  # empty hay (src/lib.rs:303)


@pytest.mark.parametrize("cls", [DynamicSearcher, PallasSearcher, XlaSearcher])
def test_random_differential_flat(cls, rng):
    hay = bytes(rng.integers(97, 105, (1500,), dtype=np.uint8))
    for k in [1, 2, 3, 4, 5, 7, 8, 11, 16, 17, 24, 40]:
        for _ in range(3):
            start = int(rng.integers(0, 1500 - k))
            check_one(cls, hay[start : start + k], hay)
        check_one(cls, bytes(rng.integers(0, 256, (k,), dtype=np.uint8)), hay)


def check_one(cls, needle, hay):
    assert cls(needle).find(hay) == naive_find(hay, needle)


@pytest.mark.parametrize("cls", [DynamicSearcher, PallasSearcher, XlaSearcher])
def test_random_differential_cols(cls, rng):
    """Tiled-kernel path via force_cols, including boundary straddles."""
    hay = bytes(rng.integers(97, 103, (9000,), dtype=np.uint8))
    dh = preprocess(hay, kh=24, force_cols=True)
    s_bytes = dh.s  # rows
    for k in [1, 2, 4, 5, 8, 13, 16, 24]:
        for start in [0, 1, dh.s - 1, dh.s, 4499, 9000 - k]:
            nd = hay[start : start + k]
            if len(nd) == k:
                assert cls(nd).find(dh) == naive_find(hay, nd), (k, start)
        nd = bytes(rng.integers(0, 256, (k,), dtype=np.uint8))
        assert cls(nd).find(dh) == naive_find(hay, nd)


def test_column_boundary_straddle(rng):
    """Matches that straddle a column boundary (position c*S+s with window
    crossing into column c+1) — the halo construction's acid test."""
    hay = bytes(rng.integers(97, 100, (20_000,), dtype=np.uint8))
    dh = preprocess(hay, kh=24, force_cols=True)
    s = dh.s
    for c in [0, 1, 64, 126]:
        for k in [2, 5, 8, 16]:
            start = (c + 1) * s - k // 2 - 1  # straddles into column c+1
            nd = hay[start : start + k]
            if len(nd) == k:
                got = DynamicSearcher(nd).find(dh)
                assert got == naive_find(hay, nd), (c, k, start)


def test_specialized_family_dispatch():
    for k in range(2, 17):
        cls = searcher_for_size(k)
        assert cls.__name__ == f"Searcher{k}"
        nd = bytes(range(65, 65 + k))
        hay = b"\xff" * 37 + nd + b"\xee" * 9
        assert cls(nd).find(hay) == 37
    assert searcher_for_size(17) is PallasSearcher
    assert searcher_for_size(1) is PallasSearcher  # no dedicated 1-arm here


def test_long_needles(rng):
    hay = bytes(rng.integers(0, 256, (60_000,), dtype=np.uint8))
    for k in [33, 64, 65, 100, 500, 1000]:
        start = int(rng.integers(0, 60_000 - k))
        nd = hay[start : start + k]
        assert PallasSearcher(nd).find(hay) == naive_find(hay, nd), k
        mutated = bytearray(nd)
        mutated[k // 2] ^= 1
        assert PallasSearcher(bytes(mutated)).find(hay) == naive_find(
            hay, bytes(mutated)
        ), k
