"""Adversarial-input behavior.

The reference exposes ``with_position`` so callers can dodge pathological
inputs that defeat its first/last-byte candidate filter (src/x86.rs:252-255):
a periodic haystack makes every position a candidate and the verify loop
quadratic-ish.  This framework's dense probe evaluation does identical work
regardless of input content — these tests pin exactness on the classic
pathological families (the timing story is structural: no data-dependent
branches exist in the scan)."""

import pytest

from sliceslice_tpu import BatchedSearcher, DynamicSearcher, naive_find
from sliceslice_tpu.ops.layout import preprocess


CASES = [
    # (haystack, needle) pathological families
    (b"a" * 3000, b"a" * 24),                     # period-1, needle matches everywhere
    (b"a" * 3000, b"a" * 23 + b"b"),              # all-candidate, never verifies
    (b"ab" * 1500, b"ab" * 10 + b"c"),            # period-2 near-miss
    (b"aab" * 1000, b"aab" * 7 + b"a"),           # period-3 with self-overlap
    (b"a" * 2999 + b"b", b"a" * 20 + b"b"),       # match only at the very end
    ((b"a" * 63 + b"b") * 40, b"a" * 40),         # runs shorter than needle
]


@pytest.mark.parametrize("hay,nd", CASES)
def test_pathological_exactness_flat(hay, nd):
    for p in (0, len(nd) // 2, len(nd) - 1):
        s = DynamicSearcher.with_position(nd, p)
        assert s.find(hay) == naive_find(hay, nd), (nd[:8], p)


@pytest.mark.parametrize("hay,nd", CASES)
def test_pathological_exactness_cols(hay, nd):
    dh = preprocess(hay, kh=32, force_cols=True)
    got = BatchedSearcher([nd, nd[::-1]]).find_all(dh)
    assert got[0] == (naive_find(hay, nd) if naive_find(hay, nd) is not None else -1)
    exp2 = naive_find(hay, nd[::-1])
    assert got[1] == (exp2 if exp2 is not None else -1)


def test_all_positions_match_dense_overlap():
    """Maximal-overlap haystack: every position matches; first offset is 0 and
    every suffix query is exact."""
    hay = b"z" * 4000
    dh = preprocess(hay, kh=32, force_cols=True)
    needles = [b"z" * k for k in (1, 4, 7, 16, 31)]
    got = BatchedSearcher(needles).find_all(dh)
    assert (got == 0).all()
