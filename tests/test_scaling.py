"""Scaling harness on the virtual 8-device mesh: exactness across device
counts plus report formatting (throughput numbers are meaningless on
interpreted CPU; exactness and plumbing are what's testable here)."""

import numpy as np

from sliceslice_tpu.ops.layout import preprocess
from sliceslice_tpu.parallel import format_report, measure_scaling

import jax
import pytest

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8,
    reason="needs an 8-device mesh (virtual CPU devices; run without "
    "SLICESLICE_TEST_TPU on a single chip)",
)



def test_measure_scaling_exactness(rng):
    corpus = bytes(rng.integers(97, 103, (700_000,), dtype=np.uint8))
    dh = preprocess(corpus, kh=16)
    needles = [corpus[i : i + k] for i, k in [(5, 4), (650_000, 8), (0, 2)]]
    needles.append(b"QZX")
    res = measure_scaling(dh, needles, device_counts=[1, 2, 8], samples=1)
    assert [r["devices"] for r in res] == [1, 2, 8]
    assert res[0]["efficiency"] == 1.0
    report = format_report(res)
    assert "devices" in report and "| 8 |" in report
