"""Measure the optimize_for break-even point (dev tool, TPU).

``BatchedSearcher.optimize_for`` costs one measuring sweep plus a host
table rebuild; every later sweep over a similar corpus is faster.  This
harness measures, on the i386 word workload (4,585 needles x 857 KB):

  t_base  — sustained ms/sweep before optimize_for
  c_opt   — one-shot wall cost of the optimize_for call itself
  t_opt   — sustained ms/sweep after
  N*      — break-even sweep count  c_opt / (t_base - t_opt)

Prints one human-readable table; the measured numbers go in docs/API.md
(VERDICT r2 item 8).

Usage: python scripts/breakeven.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import sliceslice_tpu as st


def sustained(fn, k=32, rounds=4):
    ts = []
    fn()  # warm
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(k - 1):
            fn()
        fn().block_until_ready()
        ts.append((time.perf_counter() - t0) / k)
    return min(ts)


def main():
    words = open("data/words.txt", "rb").read().splitlines()
    hay = open("data/i386.txt", "rb").read()
    bs = st.BatchedSearcher(words)
    dh = st.preprocess(hay, kh=bs.max_t * 4)

    run = lambda: bs.find_all_device(dh)
    baseline = np.asarray(run())
    t_base = sustained(run)

    t0 = time.perf_counter()
    bs.optimize_for(dh)
    c_opt = time.perf_counter() - t0

    run2 = lambda: bs.find_all_device(dh)
    opt = np.asarray(run2())
    assert (opt == baseline).all(), "optimize_for changed results"
    t_opt = sustained(run2)

    gain = t_base - t_opt
    n_star = c_opt / gain if gain > 0 else float("inf")
    print(f"t_base : {t_base * 1e3:7.2f} ms/sweep")
    print(f"c_opt  : {c_opt * 1e3:7.2f} ms one-shot (measuring sweep + rebuild)")
    print(f"t_opt  : {t_opt * 1e3:7.2f} ms/sweep")
    print(f"gain   : {gain * 1e3:7.2f} ms/sweep ({t_base / t_opt:.2f}x)")
    print(f"N*     : {n_star:7.1f} sweeps to break even")


if __name__ == "__main__":
    main()
