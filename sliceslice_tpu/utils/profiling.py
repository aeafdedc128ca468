"""Criterion-analogue measurement harness (reference: criterion benches,
bench/benches/i386.rs): warmup, repeated samples, low/estimate/high from the
sample distribution, plus achieved-bandwidth derivation against the HBM
roofline — the dual-metric idea (wall time + hardware-counter-like metric)
from the reference's perf-event benches (SURVEY.md §5.1)."""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

#: HBM bandwidth roofline, bytes/s (TPU v5e ~819 GB/s).
HBM_ROOFLINE = {"tpu v5": 819e9, "tpu v4": 1228e9, "tpu v6": 1640e9}


@dataclasses.dataclass
class Measurement:
    name: str
    samples_s: list
    bytes_processed: Optional[int] = None

    @property
    def low(self) -> float:
        return min(self.samples_s)

    @property
    def estimate(self) -> float:
        s = sorted(self.samples_s)
        return s[len(s) // 2]

    @property
    def high(self) -> float:
        return max(self.samples_s)

    def gbps(self, which: str = "estimate") -> Optional[float]:
        if self.bytes_processed is None:
            return None
        return self.bytes_processed / getattr(self, which) / 1e9

    def summary(self) -> str:
        ms = [f"{x * 1e3:.3f}" for x in (self.low, self.estimate, self.high)]
        line = f"{self.name}: [{ms[0]} {ms[1]} {ms[2]}] ms"
        if self.bytes_processed is not None:
            line += f"  ({self.gbps():.1f} GB/s effective)"
        return line


def measure(
    fn: Callable[[], object],
    name: str = "bench",
    warmup: int = 1,
    samples: int = 5,
    bytes_processed: Optional[int] = None,
) -> Measurement:
    """Run fn with warmup then timed samples (fn must block on completion,
    e.g. end in np.asarray / block_until_ready)."""
    for _ in range(warmup):
        fn()
    out = []
    for _ in range(samples):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return Measurement(name, out, bytes_processed)


def trace(fn, logdir: str = "/tmp/sliceslice_tpu_trace"):
    """Capture a jax.profiler trace of one invocation (SURVEY.md §5.1: the
    TPU-side observability story — per-kernel wall time and HBM counters in
    TensorBoard/xprof instead of Linux perf events)."""
    import jax

    with jax.profiler.trace(logdir):
        out = fn()
        jax.block_until_ready(out)
    return logdir
