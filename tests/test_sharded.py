"""Distributed scanner tests on the 8-device virtual CPU mesh (the analogue
of testing multi-host logic single-host via 1xN meshes, SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from sliceslice_tpu import BatchedSearcher, naive_find
from sliceslice_tpu.needle import build_probe_table
from sliceslice_tpu.ops.layout import preprocess
from sliceslice_tpu.ops.scan_math import SENTINEL
from sliceslice_tpu.parallel import (
    ShardedBatchedSearcher,
    make_mesh,
    sharded_find_cols,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8,
    reason="needs an 8-device mesh (virtual CPU devices; run without "
    "SLICESLICE_TEST_TPU on a single chip)",
)


@pytest.fixture(scope="module")
def corpus(rng=np.random.default_rng(7)):
    return bytes(rng.integers(97, 103, (900_000,), dtype=np.uint8))


def _tables(needles, hay_len):
    values, masks, lengths = build_probe_table(needles)
    ends = np.maximum(hay_len - lengths + 1, 0).astype(np.int32)
    return values, masks, ends


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_find_matches_oracle(corpus, shape):
    mesh = make_mesh(shape)
    dh = preprocess(corpus, kh=16)
    assert dh.g >= 2
    rng = np.random.default_rng(11)
    needles = [
        corpus[i : i + k]
        for k in (2, 4, 7, 12)
        for i in map(int, rng.integers(0, len(corpus) - k, (3,)))
    ] + [b"ZZZZ", corpus[-9:]]
    values, masks, ends = _tables(needles, dh.length)
    got = np.asarray(sharded_find_cols(dh, values, masks, ends, mesh))
    for nd, o in zip(needles, got):
        exp = naive_find(corpus, nd)
        assert (None if o >= SENTINEL else int(o)) == exp, nd


def test_shard_boundary_exactly_once(corpus):
    """Needles straddling shard boundaries are found exactly once with the
    correct global offset (exactly-once rule, SURVEY.md §5.7)."""
    mesh = make_mesh((8, 1))
    dh = preprocess(corpus, kh=16)
    seg = dh.seg_bytes
    needles = []
    for b in range(1, dh.g):
        needles.append(corpus[b * seg - 6 : b * seg + 6])
    values, masks, ends = _tables(needles, dh.length)
    got = np.asarray(sharded_find_cols(dh, values, masks, ends, mesh))
    for nd, o in zip(needles, got):
        assert int(o) == naive_find(corpus, nd), nd


def test_sharded_batched_searcher(corpus):
    mesh = make_mesh((4, 2))
    dh = preprocess(corpus, kh=16)
    needles = [corpus[10:15], b"absent!", corpus[500_000:500_020], b"a"]
    sb = ShardedBatchedSearcher(needles, mesh)
    got = sb.find_all(dh)
    exp = BatchedSearcher(needles).find_all(dh)
    assert (got == exp).all()


def test_pad_segments_mesh_bigger_than_corpus():
    """More devices than segments: pad segments must not fabricate matches."""
    rng = np.random.default_rng(3)
    data = bytes(rng.integers(97, 100, (600_000,), dtype=np.uint8))
    mesh = make_mesh((8, 1))
    dh = preprocess(data, kh=16)
    needles = [data[:4], b"\x00\x00\x00", data[-5:]]
    values, masks, ends = _tables(needles, dh.length)
    got = np.asarray(sharded_find_cols(dh, values, masks, ends, mesh))
    for nd, o in zip(needles, got):
        assert (None if o >= SENTINEL else int(o)) == naive_find(data, nd), nd


def test_make_global_corpus_single_process():
    """Single-process path of the multi-host corpus assembly."""
    import jax

    from sliceslice_tpu.parallel.distributed import global_mesh, make_global_corpus

    mesh = global_mesh()
    local = np.zeros((8, 64, 128), dtype=np.uint8)
    arr = make_global_corpus(local, mesh)
    assert arr.shape == (8 * jax.process_count(), 64, 128)


def test_initialize_noop():
    from sliceslice_tpu.parallel.distributed import initialize

    initialize(num_processes=1)  # must be a no-op


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_count_matches_oracle(corpus, shape):
    """Sharded counts: exactly-once across shard boundaries, one psum."""
    from sliceslice_tpu.searcher import overlapping_count

    mesh = make_mesh(shape)
    dh = preprocess(corpus, kh=16)
    seg = dh.seg_bytes
    needles = [corpus[10:14], b"aab", b"absent!", corpus[seg - 3 : seg + 3], b"a"]
    got = ShardedBatchedSearcher(needles, mesh).count_all(dh)
    exp = np.array([overlapping_count(corpus, nd) for nd in needles])
    assert (got == exp).all()
