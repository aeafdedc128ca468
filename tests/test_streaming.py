"""Streaming scanner: window-boundary exactly-once semantics, early stop,
file and chunk-iterator ingestion."""

import numpy as np
import pytest

from sliceslice_tpu import naive_find
from sliceslice_tpu.utils.streaming import StreamingScanner


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(42)
    return bytes(rng.integers(97, 103, (1_000_000,), dtype=np.uint8))


def oracle(corpus, needles):
    return [naive_find(corpus, n) for n in needles]


def test_stream_file(tmp_path, corpus):
    p = tmp_path / "c.bin"
    p.write_bytes(corpus)
    win = 200_000  # 5 windows
    needles = [
        corpus[0:5],
        corpus[450_000:450_012],
        corpus[999_990:1_000_000],
        b"XYZQ",
        corpus[-3:],
    ]
    sc = StreamingScanner(needles, window_bytes=win)
    got = sc.find_in_file(str(p), early_stop=False)
    exp = oracle(corpus, needles)
    for nd, g, e in zip(needles, got, exp):
        assert (None if g < 0 else int(g)) == e, nd


def test_stream_window_boundary(tmp_path, corpus):
    win = 131_072
    p = tmp_path / "c.bin"
    p.write_bytes(corpus)
    needles = [corpus[win - 6 : win + 6], corpus[2 * win - 3 : 2 * win + 9]]
    sc = StreamingScanner(needles, window_bytes=win)
    got = sc.find_in_file(str(p), early_stop=False)
    for nd, g in zip(needles, got):
        assert int(g) == naive_find(corpus, nd), nd


def test_stream_chunks_equal_file(corpus):
    needles = [corpus[123_456 : 123_470], b"NOPE!"]
    sc = StreamingScanner(needles, window_bytes=150_000)

    def chunks():
        for i in range(0, len(corpus), 37_111):  # awkward chunk size
            yield corpus[i : i + 37_111]

    got = sc.find_in_chunks(chunks(), early_stop=False)
    exp = oracle(corpus, needles)
    for g, e in zip(got, exp):
        assert (None if g < 0 else int(g)) == e


def test_stream_early_stop(tmp_path, corpus):
    p = tmp_path / "c.bin"
    p.write_bytes(corpus)
    needles = [corpus[10:20], corpus[50:58]]  # all found in window 0
    sc = StreamingScanner(needles, window_bytes=100_000, check_every=1)
    got = sc.find_in_file(str(p), early_stop=True)
    assert list(got) == oracle(corpus, needles)


def test_stream_count(tmp_path, corpus):
    """Streaming overlapping counts: exact across window boundaries."""
    from sliceslice_tpu.searcher import overlapping_count

    p = tmp_path / "c.bin"
    p.write_bytes(corpus)
    win = 131_072
    needles = [
        corpus[0:3],                      # frequent
        corpus[win - 4 : win + 4],        # straddles a window boundary
        b"NOPE!",
        corpus[-5:],
        b"a",                             # 1-byte, very frequent
    ]
    sc = StreamingScanner(needles, window_bytes=win)
    got = sc.count_in_file(str(p))
    exp = [overlapping_count(corpus, nd) for nd in needles]
    assert got.dtype == np.int64
    assert list(got) == exp


def test_stream_count_periodic_overlap(tmp_path):
    """Overlapping occurrences inside AND across windows count exactly."""
    from sliceslice_tpu.searcher import overlapping_count

    blob = b"abab" * 40_000  # 160 KB of overlapping 'abab's
    p = tmp_path / "p.bin"
    p.write_bytes(blob)
    sc = StreamingScanner([b"abab", b"baba"], window_bytes=65_536)
    got = sc.count_in_file(str(p))
    assert list(got) == [
        overlapping_count(blob, b"abab"),
        overlapping_count(blob, b"baba"),
    ]


def test_stream_sharded_mesh(corpus):
    """Streaming x sharding composition: each window scanned over the
    device mesh; find and count parity with the host oracle."""
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-device virtual mesh")
    from sliceslice_tpu.parallel import make_mesh
    from sliceslice_tpu.searcher import overlapping_count

    mesh = make_mesh((4, 2))
    win = 200_000
    needles = [
        corpus[win - 6 : win + 6],   # window-boundary straddle
        corpus[450_000:450_010],
        b"XYZQ",
        corpus[-4:],
    ]
    sc = StreamingScanner(needles, window_bytes=win, mesh=mesh)

    def chunks():
        for i in range(0, len(corpus), 77_777):
            yield corpus[i : i + 77_777]

    got = sc.find_in_chunks(chunks(), early_stop=False)
    for nd, g in zip(needles, got):
        exp = naive_find(corpus, nd)
        assert (None if g < 0 else int(g)) == exp, nd
    cnt = sc.count_in_chunks(chunks())
    assert list(cnt) == [overlapping_count(corpus, nd) for nd in needles]


def test_stream_first_occurrence_dedup(tmp_path):
    # A needle present in several windows reports its FIRST occurrence.
    blob = (b"marker" + bytes(100_000)) * 3
    p = tmp_path / "c.bin"
    p.write_bytes(blob)
    sc = StreamingScanner([b"marker", bytes(8)], window_bytes=65_536)
    got = sc.find_in_file(str(p), early_stop=False)
    assert got[0] == 0
    assert got[1] == naive_find(blob, bytes(8))
