"""Edge/contract tests — the analogue of the reference's panic tests
(src/x86.rs:533-565): invalid position, empty needle, size mismatch."""

import numpy as np
import pytest

from sliceslice_tpu import (
    DynamicSearcher,
    EmptyNeedleSearcher,
    MemchrSearcher,
    PallasSearcher,
    XlaSearcher,
)
from sliceslice_tpu.models.pallas_searcher import SPECIALIZED


@pytest.mark.parametrize("cls", [PallasSearcher, XlaSearcher, MemchrSearcher])
def test_empty_needle_rejected(cls):
    # reference: Avx2Searcher::new / with_position panic (src/x86.rs:545-549)
    with pytest.raises(ValueError):
        cls(b"")


@pytest.mark.parametrize("cls", [PallasSearcher, XlaSearcher, DynamicSearcher])
def test_invalid_position_rejected(cls):
    # reference: position < size assert (src/x86.rs:533-543)
    with pytest.raises(ValueError):
        cls.with_position(b"abc", 3)
    with pytest.raises(ValueError):
        cls.with_position(b"abc", -1)
    cls.with_position(b"abc", 2)  # boundary ok


def test_dynamic_empty_needle_always_true():
    # reference N0 arm (src/x86.rs:470,500)
    d = DynamicSearcher(b"")
    assert isinstance(d.inner, EmptyNeedleSearcher)
    assert d.search_in(b"") is True
    assert d.search_in(b"anything") is True
    assert d.find(b"xyz") == 0
    with pytest.raises(ValueError):
        DynamicSearcher.with_position(b"", 1)


def test_dynamic_dispatch_arms():
    assert isinstance(DynamicSearcher(b"x").inner, MemchrSearcher)
    for k in range(2, 17):
        inner = DynamicSearcher(b"a" * k).inner
        assert type(inner).__name__ == f"Searcher{k}"
    assert type(DynamicSearcher(b"a" * 17).inner) is PallasSearcher


def test_specialized_size_mismatch():
    # reference: SIZE/len assert (src/x86.rs:551-565)
    with pytest.raises(ValueError):
        SPECIALIZED[4](b"abc")
    with pytest.raises(ValueError):
        SPECIALIZED[2](b"abc")


def test_memchr_requires_single_byte():
    with pytest.raises(ValueError):
        MemchrSearcher(b"ab")


def test_haystack_type_contract():
    s = DynamicSearcher(b"ab")
    assert s.find("xxab") == 2  # str accepted
    assert s.find(np.frombuffer(b"abyy", np.uint8)) == 0
    with pytest.raises(TypeError):
        s.find(np.zeros(4, np.int32))
    assert s.find(bytearray(b"zzzab")) == 3
    assert s.find(memoryview(b"ab")) == 0


def test_inlined_alias():
    s = DynamicSearcher(b"ab")
    assert s.inlined_search_in(b"xxab") is True
    assert PallasSearcher(b"ab").inlined_search_in(b"zz") is False
