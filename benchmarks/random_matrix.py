"""Random needle/haystack size matrix — the bench/benches/random.rs analogue.

Needle sizes {1, 5, 10, 20, 50, 100, 1000} (prefixes of data/needle) x
haystack sizes >= needle (prefixes of the 1000-byte data/haystack), single
``search_in`` per combination.  Reported per-search; for the TPU this is the
latency regime (dispatch + readback dominate a sub-microsecond scan) — the
batched/pairwise benches are the throughput regime.  Both are reported
honestly; correctness is asserted against the oracle for every cell.

Usage: python benchmarks/random_matrix.py
"""

import sys
import time

sys.path.insert(0, ".")

NEEDLE_SIZES = (1, 5, 10, 20, 50, 100, 1000)
HAY_SIZES = (1, 5, 10, 20, 50, 100, 1000)


def main():
    import sliceslice_tpu as st
    from sliceslice_tpu.utils import native

    needle_data = open("data/needle", "rb").read()
    hay_data = open("data/haystack", "rb").read()

    print("| needle | haystack | match | python find | SWAR | tpu dynamic |")
    print("|--------|----------|-------|-------------|------|-------------|")
    for ks in NEEDLE_SIZES:
        nd = needle_data[:ks]
        searcher = st.DynamicSearcher(nd)
        for hs in HAY_SIZES:
            if hs < ks:
                continue
            hay = hay_data[:hs]
            exp = st.naive_find(hay, nd)

            t0 = time.perf_counter()
            for _ in range(100):
                hay.find(nd)
            t_py = (time.perf_counter() - t0) / 100

            t_sw = float("nan")
            if native.available():
                native.swar_find(hay, nd)
                t0 = time.perf_counter()
                for _ in range(100):
                    native.swar_find(hay, nd)
                t_sw = (time.perf_counter() - t0) / 100

            got = searcher.find(hay)
            assert got == exp, (ks, hs, got, exp)
            t0 = time.perf_counter()
            for _ in range(3):
                searcher.find(hay)
            t_tpu = (time.perf_counter() - t0) / 3

            print(
                f"| {ks} | {hs} | {got is not None} | {t_py*1e6:.2f} us "
                f"| {t_sw*1e6:.2f} us | {t_tpu*1e6:.0f} us |"
            )


if __name__ == "__main__":
    main()
