"""One-shot latency decomposition (VERDICT r1 #3): attribute every
millisecond of a single cold-path `find_all` to device compute, the
host<->device link round trip, or host-side dispatch — proving how much of
the gap vs the reference's 35.18 ms wall (BASELINE.md) is the tunnel.

Methodology:
  compute   — sustained per-sweep time from K async sweeps + one sync
              (link costs amortize to ~0, leaving device time + the fixed
              ~1 ms/execution tunnel turnaround);
  link RTT  — a trivial jitted op (one vreg add) timed WITH sync: pure
              dispatch + round trip, no compute;
  host      — find_all_device dispatch time without sync, plus the numpy
              remap after readback;
  one-shot  — the real find_all (single sweep, single sync).

Usage: python scripts/oneshot_decompose.py [samples]
"""

import sys
import time


sys.path.insert(0, ".")

import sliceslice_tpu as st

REFERENCE_MS = 35.181


def best(fn, samples, warm=2):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return 1e3 * ts[0], 1e3 * ts[len(ts) // 2]


def main():
    samples = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax.numpy as jnp

    hay = open("data/i386.txt", "rb").read()
    words = [w for w in open("data/words.txt", "rb").read().split(b"\n") if w]
    dh = st.preprocess(hay, kh=24)
    bs = st.BatchedSearcher(words)
    bs.find_all(dh)  # parity warm
    K = 32

    def sustained():
        for _ in range(K - 1):
            bs.find_all_device(dh)
        bs.find_all_device(dh).block_until_ready()

    lo, _ = best(sustained, max(3, samples // 2))
    compute_ms = lo / K

    x = jnp.zeros((8,), jnp.int32)
    import jax

    tick = jax.jit(lambda a: a + 1)
    tick(x).block_until_ready()
    rtt_lo, rtt_med = best(lambda: tick(x).block_until_ready(), samples)

    disp_lo, _ = best(lambda: bs.find_all_device(dh), samples)

    one_lo, one_med = best(lambda: bs.find_all(dh), samples)

    model_lo = compute_ms + rtt_lo + disp_lo
    print(f"device compute (sustained/K):   {compute_ms:7.2f} ms/sweep")
    print(f"link round trip (trivial sync): {rtt_lo:7.2f} ms low, "
          f"{rtt_med:7.2f} ms med")
    print(f"host dispatch (no sync):        {disp_lo:7.2f} ms")
    print(f"one-shot find_all:              {one_lo:7.2f} ms low, "
          f"{one_med:7.2f} ms med")
    print(f"model (compute + RTT + dispatch): {model_lo:7.2f} ms  "
          f"(residual {one_lo - model_lo:+.2f} ms)")
    print(f"reference wall: {REFERENCE_MS:.2f} ms; "
          f"one-shot minus link RTT = {one_lo - rtt_lo:.2f} ms "
          f"({'BEATS' if one_lo - rtt_lo < REFERENCE_MS else 'behind'} "
          "the reference on compute+host alone)")


if __name__ == "__main__":
    main()
