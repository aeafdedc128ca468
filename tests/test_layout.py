"""Device layout invariants: the column-major + halo construction is the
load-bearing trick (the analogue of the reference's overlap-tail memory-safety
argument, src/lib.rs:276-283 / src/x86.rs:257-261) — hammered directly."""

import numpy as np
import pytest

from sliceslice_tpu.ops.layout import (
    LANES,
    SEG_CAP_ROWS,
    plan_layout,
    preprocess,
)


def test_plan_layout_buckets():
    s, g = plan_layout(100, 3)
    assert (s, g) == (32, 1)
    s, g = plan_layout(50_000, 3)
    assert g == 1 and s * LANES >= 50_000 and s % 32 == 0
    # Mid-size corpora get fine-grained segments for the early exit.
    s, g = plan_layout(900_000, 3)
    assert s == 512 and g * s * LANES >= 900_000
    # Huge corpora: segment count capped (~64), segments grow.
    s, g = plan_layout(400 * 1024 * 1024, 3)
    assert s == SEG_CAP_ROWS and g * s * LANES >= 400 * 1024 * 1024
    assert g == -(-400 * 1024 * 1024 // (SEG_CAP_ROWS * LANES))
    # Large halo forces segment rows to cover it.
    s, g = plan_layout(100, 63)
    assert s >= 64


@pytest.mark.parametrize("length", [1, 127, 128, 4096, 10_000, 50_000])
def test_cols_layout_formula(length, rng):
    data = bytes(rng.integers(0, 256, (length,), dtype=np.uint8))
    dh = preprocess(data, kh=16, force_cols=True)
    cols = np.asarray(dh.cols)
    g_n, h, lanes = cols.shape
    assert lanes == LANES and h == dh.s + dh.kh and g_n == dh.g
    padded = np.zeros(dh.g * dh.seg_bytes + dh.kh, dtype=np.uint8)
    padded[:length] = np.frombuffer(data, dtype=np.uint8)
    # cols[g, s, c] == hay[g*SEG + c*S + s] for every row including halo rows.
    for g in range(dh.g):
        for s_i in list(range(0, dh.s, max(1, dh.s // 7))) + list(
            range(dh.s, h)
        ):
            for c in (0, 1, 63, 126, 127):
                flat = g * dh.seg_bytes + c * dh.s + s_i
                if flat < padded.size:
                    assert cols[g, s_i, c] == padded[flat], (g, s_i, c)


def test_flat_short_path(rng):
    data = bytes(rng.integers(0, 256, (300,), dtype=np.uint8))
    dh = preprocess(data)
    assert dh.cols is None and dh.flat is not None
    flat = np.asarray(dh.flat)
    assert flat.size >= 300 and (flat[:300] == np.frombuffer(data, np.uint8)).all()
    assert (flat[300:] == 0).all()


def test_ensure_halo_rebuild(rng):
    data = bytes(rng.integers(0, 256, (20_000,), dtype=np.uint8))
    dh = preprocess(data, kh=8, force_cols=True)
    assert dh.kh == 32  # rounded up
    dh2 = dh.ensure_halo(64)
    assert dh2.kh >= 64 and dh2.length == dh.length
    assert dh.ensure_halo(16) is dh
    dh3 = preprocess(data, kh=8, keep_host=False, force_cols=True)
    with pytest.raises(ValueError):
        dh3.ensure_halo(64)


def test_supports_needle_len(rng):
    data = bytes(rng.integers(0, 256, (20_000,), dtype=np.uint8))
    dh = preprocess(data, kh=32, force_cols=True)
    assert dh.supports_needle_len(32)
    assert not dh.supports_needle_len(64)


def test_windows_only_layout(rng):
    from sliceslice_tpu.models.batched import BatchedSearcher

    data = bytes(rng.integers(97, 105, (40_000,), dtype=np.uint8))
    needles = [data[100:105], data[9_000:9_007], b"zzzz"]
    dh = preprocess(data, kh=16, force_cols=True, windows_only=True)
    assert dh.tiled and dh.cols is None and dh.pw is not None
    # find/count consume packed windows only: work with cols dropped
    bs = BatchedSearcher(needles)
    got = bs.find_all(dh)
    exp = [data.find(nd) for nd in needles]
    assert got.tolist() == exp
    assert bs.count_all(dh).tolist() == [
        _count(data, nd) for nd in needles
    ]
    # positions needs byte tiles: lazily rebuilt from the host copy
    pos = bs.positions_all(dh)
    assert pos[0][0] == exp[0] and pos[2].size == 0
    assert dh.cols is not None  # rebuilt


def _count(data, nd):
    c = 0
    p = data.find(nd)
    while p != -1:
        c += 1
        p = data.find(nd, p + 1)
    return c


def test_windows_only_without_host_bytes_raises(rng):
    data = bytes(rng.integers(0, 256, (20_000,), dtype=np.uint8))
    dh = preprocess(
        data, kh=16, force_cols=True, windows_only=True, keep_host=False
    )
    assert dh.tiled and dh.cols is None
    with pytest.raises(ValueError, match="dropped"):
        dh.require_cols()
    # flat layouts have no cols at all
    flat = preprocess(b"abc")
    with pytest.raises(ValueError, match="flat"):
        flat.require_cols()


def test_drop_cols_roundtrip(rng):
    data = bytes(rng.integers(0, 256, (30_000,), dtype=np.uint8))
    dh = preprocess(data, kh=16, force_cols=True)
    ref = np.asarray(dh.cols)
    dh.drop_cols()
    assert dh.cols is None and dh.pw is not None
    np.testing.assert_array_equal(np.asarray(dh.require_cols()), ref)
