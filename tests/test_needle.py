"""Needle abstraction and probe-program compilation tests
(reference analogues: Needle SIZE tests src/lib.rs:333-363)."""

import numpy as np
import pytest

from sliceslice_tpu.needle import (
    MAX_NEEDLE_LEN,
    Needle,
    as_bytes,
    build_probe_table,
    needed_halo,
    num_probes,
    pack_le32,
    probe_program,
)


def eval_probes(window_bytes: bytes, values, masks) -> bool:
    """Oracle evaluation of a probe program against a byte window."""
    for t, (v, m) in enumerate(zip(values, masks)):
        chunk = window_bytes[4 * t : 4 * t + 4].ljust(4, b"\x00")
        if (pack_le32(chunk) ^ v) & m:
            return False
    return True


@pytest.mark.parametrize("k", list(range(1, 40)) + [61, 64, 100, 1000])
def test_probe_program_exact(k, rng):
    needle = bytes(rng.integers(0, 256, (k,), dtype=np.uint8))
    values, masks = probe_program(needle)
    assert len(values) == num_probes(k) == -(-k // 4)
    # Matching window passes; any single-byte corruption fails.
    pad = bytes(rng.integers(0, 256, (8,), dtype=np.uint8))
    assert eval_probes(needle + pad, values, masks)
    for i in range(k):
        corrupted = bytearray(needle + pad)
        corrupted[i] ^= 0x01
        assert not eval_probes(bytes(corrupted), values, masks), i
    # Bytes beyond k must not influence the result (mask narrowing).
    tail = bytearray(needle + pad)
    for i in range(k, len(tail)):
        tail[i] ^= 0xFF
    assert eval_probes(bytes(tail), values, masks)


def test_probe_program_empty():
    assert probe_program(b"") == ((), ())


def test_num_probes_and_halo():
    assert [num_probes(k) for k in [1, 2, 3, 4, 5, 8, 9]] == [1, 1, 1, 1, 2, 2, 3]
    assert needed_halo(1) == 3
    assert needed_halo(4) == 3
    assert needed_halo(5) == 7
    # Pair-looped widths round up to even.
    assert needed_halo(33) == 4 * 10 - 1  # T=9 -> 10


def test_as_bytes_conversions():
    assert as_bytes("abc") == b"abc"
    assert as_bytes(bytearray(b"xy")) == b"xy"
    assert as_bytes(memoryview(b"z")) == b"z"
    assert as_bytes(np.frombuffer(b"np", dtype=np.uint8)) == b"np"
    with pytest.raises(TypeError):
        as_bytes(np.zeros(3, np.int32))
    with pytest.raises(TypeError):
        as_bytes(123)


def test_needle_position_contract():
    n = Needle(b"abcd")
    assert n.position == 3  # default: last byte (reference src/x86.rs:285)
    assert Needle(b"abcd", 0).position == 0
    with pytest.raises(ValueError):
        Needle(b"abcd", 4)
    with pytest.raises(ValueError):
        Needle(b"abcd", -1)
    with pytest.raises(ValueError):
        Needle(b"")  # empty needle has no valid position (src/x86.rs:300)
    with pytest.raises(ValueError):
        Needle(b"x" * (MAX_NEEDLE_LEN + 1))


def test_position_recorded_but_ignored_by_device_kernels():
    """Pins the documented ``position`` contract (needle.py module doc):
    the value is validated and recorded for API parity, but the device
    kernels evaluate the dense probe program regardless of it — the
    compiled probe tables are byte-identical for every valid position,
    and search results are identical at every position (the reference
    merely changes WHICH byte filters first, never the answer,
    src/x86.rs:252-255)."""
    nd = b"hay-needle!"
    programs = {Needle(nd, p).probes for p in range(len(nd))}
    assert len(programs) == 1  # probe program independent of position
    assert Needle(nd, 2).position == 2  # ... but the value is recorded

    from sliceslice_tpu import DynamicSearcher

    # Past HOST_HAY_BYTES so the device rung (not the host SWAR rung,
    # which legitimately uses position) answers.
    hay = b"xx" * 2500 + nd + b"tail"
    for p in range(0, len(nd), 3):
        assert DynamicSearcher(nd, p).find(hay) == 5000


def test_build_probe_table_mixed(rng):
    needles = [b"", b"a", b"abc", b"abcd", b"abcdefgh", b"abcdefghij"]
    values, masks, lengths = build_probe_table(needles)
    assert values.shape == (6, 3)
    assert list(lengths) == [0, 1, 3, 4, 8, 10]
    # Inactive slots are mask-0 (trivially true).
    assert masks[0].sum() == 0
    assert masks[1, 1] == 0 and masks[1, 0] == 0xFF
    assert masks[3, 0] == 0xFFFFFFFF
    assert masks[5, 2] == 0xFFFF  # 10 % 4 == 2 -> 2-byte final mask
    with pytest.raises(ValueError):
        build_probe_table([b"abcdefghij"], t_max=2)
