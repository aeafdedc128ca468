"""BatchedSearcher: mixed lengths, group scatter, early-exit parity."""

import numpy as np

from sliceslice_tpu import BatchedSearcher, naive_find
from sliceslice_tpu.ops.layout import preprocess


def oracle_all(hay: bytes, needles):
    return np.array(
        [-1 if (o := naive_find(hay, n)) is None else o for n in needles],
        dtype=np.int64,
    )


def test_mixed_lengths_flat(rng):
    hay = bytes(rng.integers(97, 105, (2000,), dtype=np.uint8))
    needles = [
        b"",
        b"a",
        hay[100:101],
        hay[5:12],
        hay[1990:2000],
        hay[0:4],
        b"zzzz",
        hay[777:800],
        b"q" * 50,
        hay[3:3],
    ]
    bs = BatchedSearcher(needles)
    got = bs.find_all(hay)
    assert (got == oracle_all(hay, needles)).all()
    assert (bs.search_all(hay) == (got >= 0)).all()


def test_mixed_lengths_cols(rng):
    hay = bytes(rng.integers(97, 103, (30_000,), dtype=np.uint8))
    dh = preprocess(hay, kh=32, force_cols=True)
    needles = (
        [hay[i : i + k] for k in (1, 2, 3, 5, 8, 13, 21, 30) for i in (0, 7777, 29_000 - k)]
        + [b"nomatch!", b"zz", hay[-6:]]
    )
    bs = BatchedSearcher(needles)
    assert (bs.find_all(dh) == oracle_all(hay, needles)).all()


def test_group_order_preserved(rng):
    """Results come back in input order despite internal T-grouping."""
    hay = bytes(rng.integers(97, 100, (3000,), dtype=np.uint8))
    needles = [hay[i : i + k] for i, k in [(5, 9), (0, 1), (100, 4), (7, 17), (50, 2)]]
    bs = BatchedSearcher(needles)
    got = bs.find_all(hay)
    for nd, o in zip(needles, got):
        assert (naive_find(hay, nd) or 0) == o


def test_needle_longer_than_haystack(rng):
    hay = bytes(rng.integers(97, 100, (64,), dtype=np.uint8))
    bs = BatchedSearcher([hay + b"x", hay, hay[:5]])
    got = bs.find_all(hay)
    assert got[0] == -1 and got[1] == 0


def test_find_all_multiseg_parity(rng):
    # Early-exit economics are in-kernel now (compacted unfound list); this
    # pins the multi-segment sweep's exactness on the shapes the removed
    # host-loop API used to cover.
    hay = bytes(rng.integers(97, 101, (1_200_000,), dtype=np.uint8))
    dh = preprocess(hay, kh=16)
    assert dh.g >= 2
    needles = [hay[i : i + k] for i, k in
               [(0, 4), (600_000, 8), (1_199_990, 10), (3, 1), (900_000, 5)]]
    needles += [b"XYZ!", b"\x00\x01\x02"]
    bs = BatchedSearcher(needles)
    full = bs.find_all(dh)
    assert (full == oracle_all(hay, needles)).all()


def test_empty_batch():
    bs = BatchedSearcher([])
    assert bs.find_all(b"anything").shape == (0,)


def test_raw_kernel_cols_fallback(rng):
    """The raw kernel entry points accept byte tiles WITHOUT precomputed
    windows (pw=None packs on the fly) and must agree with the pw path and
    the oracle — guards the external raw-API contract now that every
    internal caller passes pw."""
    from sliceslice_tpu.needle import build_probe_table
    from sliceslice_tpu.ops import scan_kernel

    hay = bytes(rng.integers(97, 103, (40_000,), dtype=np.uint8))
    dh = preprocess(hay, kh=16, force_cols=True)
    needles = [hay[11:19], hay[39_990:39_998], b"\xffnomatch"]
    values, masks, lengths = build_probe_table(needles, t_max=2)
    ends = np.maximum(dh.length - lengths + 1, 0).astype(np.int32)

    via_cols = np.asarray(scan_kernel.batched_find_cols(
        dh.cols, values, masks, ends, s=dh.s))
    via_pw = np.asarray(scan_kernel.batched_find_cols(
        None, values, masks, ends, s=dh.s, pw=dh.windows()))
    assert (via_cols == via_pw).all()
    exp = oracle_all(hay, needles)
    got = np.where(via_cols >= scan_kernel.SENTINEL, -1, via_cols)
    assert (got == exp).all()

    cnt_cols = np.asarray(scan_kernel.batched_count_cols(
        dh.cols, values, masks, ends, s=dh.s))
    cnt_pw = np.asarray(scan_kernel.batched_count_cols(
        None, values, masks, ends, s=dh.s, pw=dh.windows()))
    assert (cnt_cols == cnt_pw).all()
    assert cnt_cols[2] == 0 and cnt_cols[0] >= 1


def test_batched_position_contract():
    """BatchedSearcher enforces the same position contract as the
    single-needle searchers (reference: position < size, src/x86.rs:300)."""
    import pytest

    from sliceslice_tpu import BatchedSearcher

    BatchedSearcher([b"abc", b"de"], position=1)  # valid for both
    with pytest.raises(ValueError, match="position"):
        BatchedSearcher([b"abc", b"de"], position=2)  # valid only for abc
    with pytest.raises(ValueError, match="position"):
        BatchedSearcher([b"abc"], position=-1)


def test_optimize_for_exactness(rng):
    """Adaptive block scheduling permutes group rows only — results stay
    exact (including absences and huge needles) after optimize_for."""
    from sliceslice_tpu import BatchedSearcher, preprocess

    hay = bytes(rng.integers(97, 102, (400_000,), dtype=np.uint8))
    dh = preprocess(hay, kh=16)
    needles = [hay[i : i + k] for i, k in
               [(300_000, 5), (10, 4), (399_990, 8), (100_000, 12), (7, 1)]]
    needles += [b"QQQQ", hay[200_000:202_500]]  # absent + huge
    bs = BatchedSearcher(needles)
    before = bs.find_all(dh)
    bs.optimize_for(dh)
    after = bs.find_all(dh)
    assert (before == after).all()
    assert (after == oracle_all(hay, needles)).all()
    # counts and positions ride the same reordered tables
    cnt = bs.count_all(dh)
    from sliceslice_tpu.searcher import overlapping_count

    assert list(cnt) == [overlapping_count(hay, nd) for nd in needles]


def test_optimize_for_device_path_exact_and_lazy_sync(rng):
    """The cold optimize_for path computes the schedule ON DEVICE (sweep ->
    argsort -> table/ends/order permute, zero readbacks, zero uploads —
    VERDICT r4 item 7): results stay exact, composing a second device
    reschedule stays exact, host consumers (positions) materialize the
    pending permutation lazily, and a host-path reschedule after a device
    one still works."""
    hay = bytes(rng.integers(97, 103, (200_000,), dtype=np.uint8))
    needles = [hay[i : i + k] for i, k in
               [(5, 4), (77, 7), (9_000, 12), (150_000, 5), (44, 16),
                (199_990, 9)]] + [b"NOPE!", b"zz"]
    dh = preprocess(hay, force_cols=True)
    bs = BatchedSearcher(needles)
    base = bs.find_all(dh)
    epoch0 = bs._epoch
    bs.optimize_for(dh)
    assert bs._epoch == epoch0 + 1
    # Device path: host copies intentionally stale until needed.
    assert any(g._host_perm_pending is not None for g in bs.groups)
    assert np.array_equal(bs.find_all(dh), base)
    # Second device reschedule composes the pending permutations.
    bs.optimize_for(dh)
    assert np.array_equal(bs.find_all(dh), base)
    # Host consumer triggers lazy sync and stays exact.
    pos = bs.positions_all(dh)
    assert all(g._host_perm_pending is None for g in bs.groups)
    for nd, p in zip(needles, pos):
        exp, q = [], hay.find(nd)
        while q >= 0:
            exp.append(q)
            q = hay.find(nd, q + 1)
        assert list(p) == exp, nd
    # Host-path (piggyback) reschedule after the device ones.
    bs.optimize_for(dh, firsts=base)
    assert np.array_equal(bs.find_all(dh), base)
    # count path uses the permuted ends cache.
    from sliceslice_tpu.searcher import overlapping_count

    cnt = bs.count_all(dh)
    assert list(cnt) == [overlapping_count(hay, nd) for nd in needles]
