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


def _host_positions_oracle(data, nd):
    out, p = [], data.find(nd)
    while p >= 0:
        out.append(p)
        p = data.find(nd, p + 1)
    return out


def test_stream_positions(tmp_path, corpus):
    """Streaming positions: every offset, exactly once, across multiple
    windows including window-straddling matches."""
    win = 131_072
    p = tmp_path / "c.bin"
    p.write_bytes(corpus)
    needles = [
        corpus[0:3],                      # frequent
        corpus[win - 4 : win + 4],        # straddles a window boundary
        corpus[2 * win - 3 : 2 * win + 9],
        b"NOPE!",
        corpus[-5:],
    ]
    sc = StreamingScanner(needles, window_bytes=win)
    got = sc.positions_in_file(str(p))
    for nd, g in zip(needles, got):
        assert g.dtype == np.int64
        assert list(g) == _host_positions_oracle(corpus, nd), nd


def test_stream_positions_chunks_equal_file(corpus):
    needles = [corpus[123_456:123_470], corpus[0:4]]
    sc = StreamingScanner(needles, window_bytes=150_000)

    def chunks():
        for i in range(0, len(corpus), 41_113):
            yield corpus[i : i + 41_113]

    got = sc.positions_in_chunks(chunks())
    for nd, g in zip(needles, got):
        assert list(g) == _host_positions_oracle(corpus, nd), nd


def test_stream_start_offset_past_2_32(corpus):
    """PUBLIC-path int64 offsets past 2^32: a chunk stream declared to start
    at a global offset just below 2^32, so window bases cross it mid-stream.
    find/positions must report exact int64 global offsets."""
    data = corpus[:400_000]
    win = 65_536
    start = 2**32 - 2 * win - 777  # bases cross 2^32 at the third window
    needles = [
        data[3 * win - 5 : 3 * win + 7],  # found after the 2^32 crossing
        data[10:22],                      # found before it
        b"NOPE!",
    ]
    sc = StreamingScanner(needles, window_bytes=win)

    def chunks():
        for i in range(0, len(data), 50_021):
            yield data[i : i + 50_021]

    got = sc.find_in_chunks(chunks(), early_stop=False, start_offset=start)
    exp = [naive_find(data, nd) for nd in needles]
    for g, e in zip(got, exp):
        assert (None if g < 0 else int(g)) == (
            None if e is None else e + start
        )
    assert got[0] > 2**32  # the point of the test
    pos = sc.positions_in_chunks(chunks(), start_offset=start)
    for nd, g in zip(needles, pos):
        assert list(g) == [
            q + start for q in _host_positions_oracle(data, nd)
        ], nd


def test_stream_file_start_offset(tmp_path, corpus):
    """find_in_file(start_offset=X) scans the file tail; offsets stay
    absolute file offsets."""
    p = tmp_path / "c.bin"
    p.write_bytes(corpus)
    start = 500_000
    tail = corpus[start:]
    needles = [corpus[10:30], tail[1_000:1_012], tail[-6:]]
    sc = StreamingScanner(needles, window_bytes=100_000)
    got = sc.find_in_file(str(p), early_stop=False, start_offset=start)
    exp = [naive_find(tail, nd) for nd in needles]
    for g, e in zip(got, exp):
        assert (None if g < 0 else int(g)) == (
            None if e is None else e + start
        )


def test_stream_huge_needles(tmp_path, corpus):
    """Needles beyond MAX_NEEDLE_LEN stream exactly (filter+verify against
    each window's host bytes), including a window-boundary straddle."""
    from sliceslice_tpu.needle import MAX_NEEDLE_LEN
    from sliceslice_tpu.searcher import overlapping_count

    win = 131_072
    k = MAX_NEEDLE_LEN + 1000
    needles = [
        corpus[win - 1500 : win - 1500 + k],   # straddles window boundary
        corpus[300_000 : 300_000 + k],
        corpus[0:5],                           # mixed with a kernel needle
        corpus[: k + 7],                       # huge at offset 0
        bytes(k),                              # absent huge
    ]
    p = tmp_path / "c.bin"
    p.write_bytes(corpus)
    sc = StreamingScanner(needles, window_bytes=win)
    assert sc.overlap == k + 6  # covers the longest (huge) needle
    got = sc.find_in_file(str(p), early_stop=False)
    exp = oracle(corpus, needles)
    for nd, g, e in zip(needles, got, exp):
        assert (None if g < 0 else int(g)) == e, nd[:20]
    cnt = sc.count_in_file(str(p))
    assert list(cnt) == [overlapping_count(corpus, nd) for nd in needles]
    pos = sc.positions_in_file(str(p))
    for nd, g in zip(needles, pos):
        assert list(g) == _host_positions_oracle(corpus, nd), nd[:20]


def test_stream_huge_periodic_across_windows(tmp_path):
    """A periodic huge needle with overlapping occurrences that span
    window boundaries counts each occurrence exactly once."""
    from sliceslice_tpu.needle import MAX_NEEDLE_LEN
    from sliceslice_tpu.searcher import overlapping_count

    unit = b"xy"
    k = MAX_NEEDLE_LEN + 2  # even
    nd = unit * (k // 2)
    blob = unit * 40_000 + b"Z" + unit * 3_000  # 86 KB, dense overlaps
    p = tmp_path / "p.bin"
    p.write_bytes(blob)
    sc = StreamingScanner([nd], window_bytes=16_384)
    assert list(sc.count_in_file(str(p))) == [overlapping_count(blob, nd)]
    pos = sc.positions_in_file(str(p))[0]
    assert list(pos) == _host_positions_oracle(blob, nd)


def test_stream_sharded_positions(corpus):
    """Streaming x sharding composition for positions: per-window sharded
    bitmaps, host decode with int64 window bases."""
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-device virtual mesh")
    from sliceslice_tpu.parallel import make_mesh

    mesh = make_mesh((4, 2))
    win = 200_000
    needles = [
        corpus[win - 6 : win + 6],
        corpus[0:3],
        b"XYZQ",
        corpus[-4:],
    ]
    sc = StreamingScanner(needles, window_bytes=win, mesh=mesh)
    got = sc.positions_in_chunks(iter([corpus]), start_offset=2**33)
    for nd, g in zip(needles, got):
        assert list(g) == [
            q + 2**33 for q in _host_positions_oracle(corpus, nd)
        ], nd


def test_stream_huge_match_past_window_in_final_window():
    """Regression: a chunk stream shorter than window + overlap arrives as
    ONE final window whose length exceeds ``window``; the huge-needle
    valid-position bound must use the stream's true end there (it used to
    clamp to ``window``, silently dropping the match)."""
    from sliceslice_tpu.searcher import overlapping_count

    rng = np.random.default_rng(7)
    hay = bytes(rng.integers(97, 123, (9_000,), dtype=np.uint8))
    needles = [
        hay[6_000:8_100],   # 2100-byte huge needle past window=4999
        hay[0:5_000],       # 5000-byte huge needle at 0 (sets overlap=4999)
        bytes(5_000),       # absent huge
    ]
    sc = StreamingScanner(needles, window_bytes=1)
    assert sc.window == 4_999 and sc.overlap == 4_999
    got = sc.find_in_chunks(iter([hay]), early_stop=False)
    exp = oracle(hay, needles)
    for nd, g, e in zip(needles, got, exp):
        assert (None if g < 0 else int(g)) == e, nd[:16]
    cnt = sc.count_in_chunks(iter([hay]))
    assert list(cnt) == [overlapping_count(hay, nd) for nd in needles]
    pos = sc.positions_in_chunks(iter([hay]))
    for nd, g in zip(needles, pos):
        assert list(g) == _host_positions_oracle(hay, nd), nd[:16]


def test_stream_file_short_read_is_not_last(tmp_path):
    """Regression: a file window whose remaining bytes fall in
    (window, window + overlap) short-reads but is NOT final — finality
    inferred from read length used to lift the exactly-once clamp there
    and count overlap-region matches in two windows."""
    from sliceslice_tpu.searcher import overlapping_count

    blob = bytearray(b"c" * 1_005)
    blob[1_001:1_003] = b"AB"
    blob = bytes(blob)
    p = tmp_path / "s.bin"
    p.write_bytes(blob)
    # len-8 needle sets overlap=7: window 0 reads 1005 in (1000, 1007).
    needles = [b"AB", b"zzzzzzzz"]
    sc = StreamingScanner(needles, window_bytes=1_000)
    assert list(sc.count_in_file(str(p))) == [
        overlapping_count(blob, nd) for nd in needles
    ]
    pos = sc.positions_in_file(str(p))
    assert list(pos[0]) == [1_001] and list(pos[1]) == []
    got = sc.find_in_file(str(p), early_stop=False)
    assert int(got[0]) == 1_001 and int(got[1]) == -1


def test_stream_prefetch_parity_and_shutdown(tmp_path, corpus):
    """Pipelined ingestion (background read+pad+upload thread) returns
    byte-identical results to the serial path for find/count/positions,
    and an early stop retires the worker thread promptly."""
    import threading

    p = tmp_path / "c.bin"
    p.write_bytes(corpus)
    needles = [corpus[0:6], corpus[640_000:640_009], b"NOPE!", corpus[-4:]]
    serial = StreamingScanner(needles, window_bytes=150_000, prefetch=0)
    piped = StreamingScanner(needles, window_bytes=150_000, prefetch=3)
    assert np.array_equal(
        serial.find_in_file(str(p), early_stop=False),
        piped.find_in_file(str(p), early_stop=False),
    )
    assert np.array_equal(
        serial.count_in_file(str(p)), piped.count_in_file(str(p))
    )
    for a, b in zip(
        serial.positions_in_file(str(p)), piped.positions_in_file(str(p))
    ):
        assert np.array_equal(a, b)
    # Early stop mid-stream: all needles hit in window 0; the ingest worker
    # must wind down instead of reading the rest of the stream forever.
    before = threading.active_count()
    early = StreamingScanner(
        [corpus[10:20]], window_bytes=100_000, check_every=1, prefetch=2
    )
    got = early.find_in_file(str(p), early_stop=True)
    assert int(got[0]) == 10
    deadline = 50
    while threading.active_count() > before and deadline:
        threading.Event().wait(0.1)
        deadline -= 1
    assert not any(
        t.name == "sliceslice-ingest" and t.is_alive()
        for t in threading.enumerate()
    )


def test_stream_prefetch_propagates_reader_errors(corpus):
    """An exception raised by the window source surfaces to the caller
    (not swallowed in the worker thread)."""

    def bad_chunks():
        yield corpus[:100_000]
        raise OSError("disk gone")

    sc = StreamingScanner([b"zz"], window_bytes=50_000, prefetch=2)
    with pytest.raises(OSError, match="disk gone"):
        sc.count_in_chunks(bad_chunks())


_COMPILES: list = []
_LISTENER = [False]


def _install_compile_listener():
    """Count real backend compiles via jax.monitoring (fires once per new
    executable, silent on cache hits)."""
    import jax

    if not _LISTENER[0]:
        jax.monitoring.register_event_duration_secs_listener(
            lambda name, dur, **kw: _COMPILES.append(name)
            if name == "/jax/core/compile/backend_compile_duration"
            else None
        )
        _LISTENER[0] = True


def test_warmup_covers_every_stream_shape(tmp_path, corpus):
    """After warmup(), a find + count + positions stream — over a file
    whose size is an EXACT multiple of the window (the r4 trap: the final
    window length matched neither warmup shape and recompiled mid-stream)
    AND a second file with a short trailing window — triggers ZERO new
    kernel compilations: every window is padded to one fixed layout shape
    and warmup compiles exactly that shape (VERDICT r4 items 1/3,
    ADVICE r4 medium)."""
    _install_compile_listener()
    win = 65_536
    needles = [
        corpus[0:1],                     # memchr-width
        corpus[100:106],                 # t=2
        corpus[5_000:5_011],             # t=3
        corpus[win - 4 : win + 4],       # boundary straddle
        b"NOPE!",
        corpus[-9:],
    ]
    sc = StreamingScanner(needles, window_bytes=win)
    sc.warmup()
    exact = corpus[: 4 * win]            # exact multiple of window
    ragged = corpus[: 3 * win + 17_123]  # short trailing window
    p1 = tmp_path / "exact.bin"
    p1.write_bytes(exact)
    p2 = tmp_path / "ragged.bin"
    p2.write_bytes(ragged)
    n0 = len(_COMPILES)
    for blob, p in ((exact, p1), (ragged, p2)):
        got = sc.find_in_file(str(p), early_stop=False)
        for nd, g in zip(needles, got):
            assert (None if g < 0 else int(g)) == naive_find(blob, nd), nd
        from sliceslice_tpu.searcher import overlapping_count

        cnt = sc.count_in_file(str(p))
        assert list(cnt) == [overlapping_count(blob, nd) for nd in needles]
        pos = sc.positions_in_file(str(p))
        for nd, g in zip(needles, pos):
            assert list(g) == _host_positions_oracle(blob, nd), nd
    assert _COMPILES[n0:] == [], (
        f"{len(_COMPILES) - n0} kernel compiles happened mid-stream after "
        "warmup()"
    )


def test_warmup_covers_huge_needle_stream(tmp_path, corpus):
    """warmup() also compiles the huge-needle prefix-filter and dense
    chained-bitmap programs (VERDICT r4 item 3): a first huge stream after
    warmup pays no new kernel compilation."""
    from sliceslice_tpu.needle import MAX_NEEDLE_LEN

    _install_compile_listener()
    win = 65_536
    k = MAX_NEEDLE_LEN + 500
    needles = [corpus[10_000 : 10_000 + k], corpus[0:7]]
    sc = StreamingScanner(needles, window_bytes=win)
    sc.warmup()
    blob = corpus[: 3 * win]
    p = tmp_path / "h.bin"
    p.write_bytes(blob)
    n0 = len(_COMPILES)
    got = sc.find_in_file(str(p), early_stop=False)
    for nd, g in zip(needles, got):
        assert (None if g < 0 else int(g)) == naive_find(blob, nd)
    assert _COMPILES[n0:] == [], (
        f"{len(_COMPILES) - n0} compiles in a huge-needle stream after "
        "warmup()"
    )


def test_stream_stats_attribution(tmp_path, corpus):
    """Per-stream instrumentation: the stats summary attributes the wall
    time (read/prep/dispatch/drain) and reports per-window latency
    percentiles (VERDICT r4 item 1a)."""
    p = tmp_path / "c.bin"
    p.write_bytes(corpus)
    sc = StreamingScanner([corpus[0:6], b"NOPE!"], window_bytes=200_000)
    sc.find_in_file(str(p), early_stop=False)
    s = sc.stats_summary()
    assert s["mode"] == "find"
    assert s["windows"] == 5
    assert s["bytes"] >= len(corpus)
    for k in ("read_s", "prep_s", "dispatch_s", "drain_s"):
        assert s[k] >= 0.0, k
    assert s["window_p50_ms"] <= s["window_p90_ms"]
    sc.count_in_file(str(p))
    s2 = sc.stats_summary()
    assert s2["mode"] == "count" and s2["windows"] == 5


def test_device_fold_primitives_exact():
    """The on-device stream folds: two-limb counts stay exact past 2^32,
    and the (window, local) first-match fold is lexicographic with absent
    windows never overwriting."""
    import jax.numpy as jnp

    from sliceslice_tpu.ops.scan_math import SENTINEL
    from sliceslice_tpu.utils.streaming import _count_fold64, _first_fold

    hi = jnp.zeros((1,), jnp.uint32)
    lo = jnp.zeros((1,), jnp.uint32)
    step = (1 << 31) - 1
    for _ in range(5):  # total 5*(2^31-1) > 2^32: exercises the carry limb
        hi, lo = _count_fold64(hi, lo, jnp.asarray([step], jnp.int32))
    assert (int(np.asarray(hi)[0]) << 32) + int(np.asarray(lo)[0]) == 5 * step

    bw = jnp.full((3,), SENTINEL, jnp.int32)
    bl = jnp.full((3,), SENTINEL, jnp.int32)
    # window 0: needle1 at 7; window 1: needle0 at 9, needle1 at 3 (later
    # window must NOT beat window 0's hit), needle2 absent throughout.
    bw, bl = _first_fold(
        bw, bl, jnp.int32(0),
        jnp.asarray([SENTINEL, 7, SENTINEL], jnp.int32),
    )
    bw, bl = _first_fold(
        bw, bl, jnp.int32(1),
        jnp.asarray([9, 3, SENTINEL], jnp.int32),
    )
    assert list(np.asarray(bw)) == [1, 0, SENTINEL]
    assert list(np.asarray(bl)) == [9, 7, SENTINEL]


def test_stream_pool_survives_repeated_early_stops(tmp_path, corpus):
    """Early-stopped streams abandon in-flight pooled buffers; the pool
    must recover (drain + top-up) so a long sequence of early stops never
    starves a later full stream."""
    p = tmp_path / "c.bin"
    p.write_bytes(corpus)
    sc = StreamingScanner(
        [corpus[10:20], b"NOPE!"], window_bytes=65_536, check_every=1,
        prefetch=2,
    )
    for _ in range(6):
        got = sc.find_in_file(str(p), early_stop=True)
        assert int(got[0]) == 10
    full = sc.find_in_file(str(p), early_stop=False)
    assert int(full[0]) == 10 and int(full[1]) == -1
    cnt = sc.count_in_file(str(p))
    from sliceslice_tpu.searcher import overlapping_count

    assert int(cnt[0]) == overlapping_count(corpus, corpus[10:20])
