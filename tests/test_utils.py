"""Utility-layer tests: measurement harness, mmap ingest, trace capture."""

import os

import numpy as np
import pytest

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


def test_streaming_int32_guard():
    from sliceslice_tpu.utils.streaming import MAX_STREAM_BYTES, StreamingScanner

    sc = StreamingScanner([b"abc"], window_bytes=2**20)
    # Window bases advance by window_bytes; put the second window past the
    # int32 range without materializing gigabytes.
    sc.window = MAX_STREAM_BYTES
    with pytest.raises(ValueError):
        sc._scan(iter([b"tiny window 1", b"tiny window 2"]), early_stop=False)
