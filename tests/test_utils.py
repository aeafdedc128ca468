"""Utility-layer tests: measurement harness, mmap ingest, trace capture."""

import os

import numpy as np

from sliceslice_tpu.utils import Measurement, load_haystack, map_file, measure
from sliceslice_tpu.utils.profiling import trace


def test_measure_and_summary():
    calls = []
    m = measure(lambda: calls.append(1), name="x", warmup=2, samples=5,
                bytes_processed=1000)
    assert len(calls) == 7
    assert m.low <= m.estimate <= m.high
    assert m.gbps() is not None
    assert "GB/s" in m.summary()
    assert Measurement("y", [1.0]).gbps() is None


def test_map_file_and_load(tmp_path):
    p = tmp_path / "c.bin"
    p.write_bytes(b"hello corpus " * 1000)
    arr = map_file(str(p))
    assert arr.dtype == np.uint8 and bytes(arr[:5]) == b"hello"
    dh = load_haystack(str(p))
    assert dh.length == 13_000
    empty = tmp_path / "e.bin"
    empty.write_bytes(b"")
    assert map_file(str(empty)).size == 0


def test_trace_capture(tmp_path):
    import jax.numpy as jnp

    logdir = trace(lambda: jnp.arange(8) * 2, logdir=str(tmp_path / "tr"))
    found = []
    for root, _dirs, files in os.walk(logdir):
        found += files
    assert found, "trace produced no files"


def test_streaming_int64_offsets_past_2gib():
    """Offsets beyond the int32 range are exact: device math is window-local
    int32, the global base folds in int64 on host.  Spoof the window stride
    so the second window sits past 4 GiB without materializing gigabytes."""
    from sliceslice_tpu.utils.streaming import StreamingScanner

    sc = StreamingScanner([b"needle", b"absent-needle"], window_bytes=2**20)
    sc.window = 2**32  # window bases advance by this stride
    got = sc._scan(
        iter([b"first window, nothing here", b"xxxxxneedle-in-window-two"]),
        early_stop=False,
    )
    assert got[0] == 2**32 + 5
    assert got[1] == -1
