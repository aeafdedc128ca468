"""Property-based fuzzing of every search path against the oracle — beyond
the reference's test strategy (it has no fuzzing, SURVEY.md §4); the natural
upgrade once tests are Python."""

from hypothesis import given, settings, strategies as st_

from sliceslice_tpu import BatchedSearcher, DynamicSearcher, naive_find
from sliceslice_tpu.ops.layout import preprocess
from sliceslice_tpu.ops.pairwise import PairwiseSearcher

def _bytes(alphabet: bytes, max_size: int):
    # Small alphabet maximizes collisions/almost-matches.
    return st_.builds(
        bytes,
        st_.lists(st_.sampled_from(list(alphabet)), min_size=0, max_size=max_size),
    )


bytes_small = _bytes(b"abc\x00\xff", 200)
needle_small = _bytes(b"abc\x00\xff", 40)


@settings(max_examples=60, deadline=None)
@given(hay=bytes_small, nd=needle_small)
def test_fuzz_dynamic(hay, nd):
    got = DynamicSearcher(nd).find(hay)
    assert got == naive_find(hay, nd)


@settings(max_examples=20, deadline=None)
@given(
    hay=_bytes(b"ab", 3000),
    needles=st_.lists(_bytes(b"ab", 24), min_size=1, max_size=8),
)
def test_fuzz_batched_cols(hay, needles):
    dh = preprocess(hay, kh=24, force_cols=True) if hay else hay
    got = BatchedSearcher(needles).find_all(dh if hay else b"")
    for nd, o in zip(needles, got):
        exp = naive_find(hay, nd)
        assert (None if o < 0 else int(o)) == exp, (nd, hay)


@settings(max_examples=15, deadline=None)
@given(
    words=st_.lists(_bytes(b"ab", 10), min_size=1, max_size=12)
)
def test_fuzz_pairwise(words):
    ps = PairwiseSearcher(words, block=8)
    got_c = ps.contains_matrix()
    got_f = ps.first_matrix()
    for i, n in enumerate(words):
        for j, h in enumerate(words):
            exp = h.find(n)
            assert got_c[i, j] == (exp >= 0), (n, h)
            assert got_f[i, j] == exp, (n, h)


@settings(max_examples=12, deadline=None)
@given(
    hay=_bytes(b"ab", 60_000),
    needles=st_.lists(_bytes(b"ab", 16), min_size=1, max_size=4),
    window=st_.integers(min_value=9_000, max_value=30_000),
)
def test_fuzz_streaming_windows(hay, needles, window):
    """Random window geometry x period-heavy content: find/count parity
    across window boundaries (the classic off-by-one surface)."""
    from sliceslice_tpu.searcher import overlapping_count
    from sliceslice_tpu.utils.streaming import StreamingScanner

    if any(len(nd) == 0 for nd in needles):
        needles = [nd or b"a" for nd in needles]
    sc = StreamingScanner(needles, window_bytes=window)

    def chunks():
        step = max(1, window // 3 + 7)
        for i in range(0, len(hay), step):
            yield hay[i : i + step]

    got = sc.find_in_chunks(chunks(), early_stop=False)
    for nd, o in zip(needles, got):
        exp = naive_find(hay, nd)
        assert (None if o < 0 else int(o)) == exp, (nd, window)
    cnt = sc.count_in_chunks(chunks())
    for nd, c in zip(needles, cnt):
        assert int(c) == overlapping_count(hay, nd), (nd, window)
