"""Explicit coverage of BASELINE.json configs 1-3 on the reference's own
data files (configs 4-5, the sharded/multi-host scans, live in
test_sharded.py / test_scaling.py)."""

import numpy as np

from sliceslice_tpu import BatchedSearcher, DynamicSearcher, naive_find
from sliceslice_tpu.models.pallas_searcher import searcher_for_size
from sliceslice_tpu.ops.pairwise import PairwiseSearcher


def test_config1_ipsum_over_words(words):
    """Config 1: the fixed needle b"ipsum" searched in every dictionary word,
    exact match/no-match parity."""
    nd = b"ipsum"
    s = DynamicSearcher(nd)
    exp = [w.find(nd) >= 0 for w in words]
    # One-by-one through the dispatch ladder...
    got = [s.search_in(w) for w in words[:300]]
    assert got == exp[:300]
    # ...and the whole sweep through the pairwise kernel.
    ps = PairwiseSearcher([nd])
    assert (ps.contains_matrix(words)[0] == np.array(exp)).all()


def test_config3_reference_random_matrix():
    """The random needle/haystack size matrix from the reference bench
    (bench/benches/random.rs:16-23) on its exact data files: needle sizes
    {1,5,10,20,50,100,1000} x haystack prefixes, match + offset parity."""
    needle_data = open("data/needle", "rb").read()
    hay_data = open("data/haystack", "rb").read()
    for ks in (1, 5, 10, 20, 50, 100, 1000):
        nd = needle_data[:ks]
        s = DynamicSearcher(nd)
        for hs in (1, 5, 10, 20, 50, 100, 1000):
            if hs < ks:
                continue
            hay = hay_data[:hs]
            assert s.find(hay) == naive_find(hay, nd), (ks, hs)
    # And batched over the largest haystack.
    needles = [needle_data[:k] for k in (1, 5, 10, 20, 50, 100, 1000)]
    got = BatchedSearcher(needles).find_all(hay_data)
    for nd, o in zip(needles, got):
        exp = naive_find(hay_data, nd)
        assert (None if o < 0 else int(o)) == exp, len(nd)


def test_config2_specialized_rungs_on_i386(i386_small):
    """Config 3's dispatch rungs: every specialized size 2..16 plus memchr
    and generic, against the manual prefix."""
    for k in range(2, 17):
        nd = i386_small[1000 : 1000 + k]
        cls = searcher_for_size(k)
        assert cls(nd).find(i386_small) == naive_find(i386_small, nd), k
