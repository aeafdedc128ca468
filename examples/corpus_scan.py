"""Example: the flagship batched workload — many needles over one corpus,
preprocessed once, with device-resident results for pipelines.

    python examples/corpus_scan.py data/i386.txt data/words.txt
"""

import sys
import time

sys.path.insert(0, ".")


import sliceslice_tpu as st


def main(corpus_path: str, words_path: str):
    hay = open(corpus_path, "rb").read()
    words = [w for w in open(words_path, "rb").read().split(b"\n") if w]

    dh = st.preprocess(hay)          # device layout, built once
    bs = st.BatchedSearcher(words)   # probe tables, built once

    t0 = time.time()
    offsets = bs.find_all(dh)
    dt = time.time() - t0
    found = int((offsets >= 0).sum())
    print(f"{found}/{len(words)} needles found in {len(hay):,} bytes "
          f"({dt*1e3:.1f} ms incl. compile on first call)")
    for w, o in list(zip(words, offsets))[:5]:
        print(f"  {w.decode(errors='replace')!r:20} -> "
              f"{'offset ' + str(o) if o >= 0 else 'absent'}")


if __name__ == "__main__":
    main(*(sys.argv[1:3] or ("data/i386.txt", "data/words.txt")))
