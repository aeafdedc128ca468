"""Huge needles (k > MAX_NEEDLE_LEN): the exact filter+verify fallback —
arbitrary-length parity with the reference (src/lib.rs:52-59), plus the
2048/2049 boundary and the sharded-layer (mesh) huge paths."""

import numpy as np
import pytest

from sliceslice_tpu import BatchedSearcher, DynamicSearcher, preprocess
from sliceslice_tpu.needle import MAX_NEEDLE_LEN
from sliceslice_tpu.searcher import _host_positions, overlapping_count


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(99)
    data = bytearray(rng.integers(97, 110, (400_000,), dtype=np.uint8))
    return bytes(data)


def test_boundary_2048_2049(corpus):
    """k = MAX exactly rides the kernels; k = MAX+1 rides the fallback —
    identical answers either side of the boundary."""
    for k in (MAX_NEEDLE_LEN, MAX_NEEDLE_LEN + 1):
        nd = corpus[123_456 : 123_456 + k]
        s = DynamicSearcher(nd)
        assert s.find(corpus) == corpus.find(nd) == 123_456
        assert s.count_in(corpus) == overlapping_count(corpus, nd)
    assert DynamicSearcher(b"q" * (MAX_NEEDLE_LEN + 7)).find(corpus) is None


def test_huge_find_count_positions(corpus):
    k = 3_000
    nd = corpus[50_000 : 50_000 + k]
    s = DynamicSearcher(nd)
    dh = preprocess(corpus)
    assert s.find(dh) == 50_000
    assert s.search_in(dh)
    assert s.count_in(dh) == overlapping_count(corpus, nd)
    assert np.array_equal(s.positions(dh), _host_positions(corpus, nd))


def test_huge_overlapping_periodic():
    """Overlapping occurrences of a periodic huge needle count exactly."""
    nd = b"ab" * 1_600  # 3200 bytes
    hay = b"xx" + b"ab" * 1_610 + b"yy"
    s = DynamicSearcher(nd)
    assert s.find(hay) == 2
    assert s.count_in(hay) == overlapping_count(hay, nd)
    assert np.array_equal(s.positions(hay), _host_positions(hay, nd))


def test_huge_adversarial_prefix_repeats(corpus):
    """Many candidates sharing the 64-byte filter prefix but differing
    tails: verify rejects every false candidate."""
    block = corpus[1_000 : 1_064]  # the shared 64-byte prefix
    decoys = b"".join(block + bytes([i]) * 3_000 for i in range(5))
    nd = block + b"\xffTRUE" + bytes(3_000)
    hay = decoys + nd + decoys
    s = DynamicSearcher(nd)
    assert s.find(hay) == hay.find(nd) == len(decoys)
    assert s.count_in(hay) == 1


def test_huge_needle_longer_than_haystack():
    nd = b"z" * 4_000
    assert DynamicSearcher(nd).find(b"z" * 3_999) is None
    assert DynamicSearcher(nd).find(b"z" * 4_000) == 0


def test_batched_mixed_normal_and_huge(corpus):
    k = 2_500
    needles = [
        corpus[10:14],                    # kernel path
        corpus[77_000 : 77_000 + k],      # huge, present
        b"q" * k,                         # huge, absent
        b"absent!",                       # kernel path, absent
        corpus[-5:],
    ]
    bs = BatchedSearcher(needles)
    dh = preprocess(corpus)
    got = bs.find_all(dh)
    exp = [corpus.find(nd) for nd in needles]
    assert list(got) == exp
    cnt = bs.count_all(dh)
    assert list(cnt) == [overlapping_count(corpus, nd) for nd in needles]
    pos = bs.positions_all(dh)
    for nd, p in zip(needles, pos):
        assert np.array_equal(p, _host_positions(corpus, nd)), nd
    assert list(bs.search_all(dh)) == [e >= 0 for e in exp]


def test_batched_all_huge(corpus):
    needles = [corpus[5_000 : 5_000 + 2_100], b"w" * 2_200]
    bs = BatchedSearcher(needles)
    got = bs.find_all(corpus)
    assert list(got) == [5_000, -1]


def test_device_resident_variants_fence(corpus):
    bs = BatchedSearcher([corpus[:4], corpus[: MAX_NEEDLE_LEN + 1]])
    dh = preprocess(corpus)
    with pytest.raises(ValueError, match="MAX_NEEDLE_LEN"):
        bs.find_all_device(dh)
    with pytest.raises(ValueError, match="MAX_NEEDLE_LEN"):
        bs.count_all_device(dh)


def test_sharded_huge_needles(corpus):
    """Huge needles over the sharded layer: prefix filter under shard_map,
    candidates verified against the process's bytes; find/count/positions
    parity including a shard-boundary straddle and an adversarial decoy."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from sliceslice_tpu.parallel import ShardedBatchedSearcher, make_mesh

    mesh = make_mesh((4, 2))
    dh = preprocess(corpus, seg_rows=96)  # several segments per shard
    seg = dh.seg_bytes
    shard_bytes = (dh.g // 4 + (1 if dh.g % 4 else 0)) * seg
    k = MAX_NEEDLE_LEN + 700
    needles = [
        corpus[10:14],                                     # kernel path
        corpus[77_000 : 77_000 + k],                       # huge, present
        corpus[shard_bytes - 900 : shard_bytes - 900 + k], # straddles shards
        b"q" * k,                                          # huge, absent
        corpus[1_000 : 1_064] + b"\xffX" + bytes(2_500),   # adversarial: real
                                                           # 64-byte prefix,
                                                           # absent tail
        corpus[-5:],
    ]
    sb = ShardedBatchedSearcher(needles, mesh)
    got = sb.find_all(dh)
    assert list(got) == [corpus.find(nd) for nd in needles]
    cnt = sb.count_all(dh)
    assert list(cnt) == [overlapping_count(corpus, nd) for nd in needles]
    pos = sb.positions_all(dh)
    for nd, p in zip(needles, pos):
        assert np.array_equal(p, _host_positions(corpus, nd)), nd[:20]
    # gather=True is the multi-process global merge; single-process identity.
    pos_g = sb.positions_all(dh, gather=True)
    for p, q in zip(pos, pos_g):
        assert np.array_equal(p, q)


def test_sharded_huge_global_corpus_requires_local_bytes(corpus):
    """A GlobalCorpus assembled without its local byte range cannot verify
    huge candidates — clear error, not silence."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from sliceslice_tpu.parallel import ShardedBatchedSearcher, make_mesh
    from sliceslice_tpu.parallel.distributed import assemble_global_corpus

    mesh = make_mesh((4, 2))
    k = MAX_NEEDLE_LEN + 100
    # 400 KB / (96*128 B) = 33 segments; round to the 4-way data axis.
    gc = assemble_global_corpus(
        corpus, b"", len(corpus), 96, 64, mesh, g_local=36, keep_local=False
    )
    sb = ShardedBatchedSearcher([corpus[5_000 : 5_000 + k]], mesh)
    with pytest.raises(ValueError, match="keep_local"):
        sb.find_all(gc)
    gc2 = assemble_global_corpus(
        corpus, b"", len(corpus), 96, 64, mesh, g_local=36
    )
    assert list(sb.find_all(gc2)) == [5_000]
    assert list(sb.count_all(gc2)) == [overlapping_count(corpus, corpus[5_000 : 5_000 + k])]
    pos = sb.positions_all(gc2, gather=True)
    assert np.array_equal(pos[0], _host_positions(corpus, corpus[5_000 : 5_000 + k]))


def test_huge_dense_tier_period1():
    """Period-1 adversarial content: EVERY position passes the 64-byte
    prefix filter, so the sparse host-verify tier would degrade to O(len*k)
    memcmp work — the dense tier answers on device via the chained bitmap
    (identical chunks deduplicate to ~one scan).  Exact find/count/positions
    parity (VERDICT r3 item 4)."""
    k = 4096
    nd = b"a" * k
    hay = b"a" * 120_000 + b"b" + b"a" * 30_000
    s = DynamicSearcher(nd)
    dh = preprocess(hay)
    assert s.find(dh) == 0
    assert s.count_in(dh) == overlapping_count(hay, nd)
    assert np.array_equal(s.positions(dh), _host_positions(hay, nd))
    # and when the first run of 'a' is too short, the match moves past it
    hay2 = b"a" * 3_000 + b"c" + b"a" * 50_000 + b"d" * 9_000
    dh2 = preprocess(hay2)
    assert s.find(dh2) == hay2.find(nd) == 3_001
    assert s.count_in(dh2) == overlapping_count(hay2, nd)


def test_huge_dense_tier_aperiodic(corpus, monkeypatch):
    """Dense tier with DISTINCT chunks (no dedup): force it by shrinking the
    host-verify budget, then check parity on present/absent needles whose
    prefix occurs at several places."""
    import sliceslice_tpu.models.huge as huge_mod

    monkeypatch.setattr(huge_mod, "HOST_VERIFY_MAX", 2)
    prefix = corpus[9_000 : 9_064]
    k = 2_600
    present = corpus[9_000 : 9_000 + k]
    absent = prefix + b"\xff" + bytes(k - 65)
    hay = corpus[:200_000]
    dh = preprocess(hay)
    for nd in (present, absent):
        s = DynamicSearcher(nd)
        assert s.find(dh) == (None if hay.find(nd) < 0 else hay.find(nd))
        assert s.count_in(dh) == overlapping_count(hay, nd)
        assert np.array_equal(s.positions(dh), _host_positions(hay, nd))


def test_huge_dense_tier_no_host_bytes(monkeypatch):
    """Without retained host bytes the sparse tier is unavailable; the
    dense tier still answers exactly — provided the layout halo already
    fits the chunk tables."""
    import sliceslice_tpu.models.huge as huge_mod
    from sliceslice_tpu.needle import needed_halo_for_t

    monkeypatch.setattr(huge_mod, "HOST_VERIFY_MAX", 0)
    nd = b"ab" * 1_500  # k = 3000
    hay = b"xy" * 40_000 + b"ab" * 1_700 + b"z" * 100
    kh = needed_halo_for_t(huge_mod.CHUNK // 4)
    dh = preprocess(hay, kh=kh, keep_host=False)
    s = DynamicSearcher(nd)
    assert s.find(dh) == hay.find(nd)
    assert s.count_in(dh) == overlapping_count(hay, nd)
    assert np.array_equal(s.positions(dh), _host_positions(hay, nd))


def test_huge_dense_boundary_last_valid_position():
    """Dense tier at the exact end bound: needle occupying the final k bytes
    matches; one byte later does not (end = len - k + 1 exactness)."""
    k = 4_200
    nd = b"m" * k
    hay = b"q" * 100_000 + b"m" * k
    s = DynamicSearcher(nd)
    assert s.find(hay) == len(hay) - k
    assert s.count_in(hay) == 1
    hay_short = hay[:-1]
    assert DynamicSearcher(nd).find(hay_short) is None
