"""Driver contract: __graft_entry__.entry() must stay jittable and
dryrun_multichip must execute the full sharded step on a virtual mesh."""

import sys

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def graft():
    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    return ge


def test_entry_jits_and_runs(graft):
    fn, args = graft.entry()
    out = np.asarray(jax.jit(fn)(*args))
    assert out.shape[0] >= 24
    # Spot-check parity against the oracle on the same tiny problem.
    dh, needles, hay, values, masks, ends = graft._tiny_problem()
    from sliceslice_tpu.ops.scan_math import SENTINEL

    for nd, off in zip(needles, out[: len(needles)]):
        exp = hay.find(nd)
        assert (exp if exp >= 0 else SENTINEL) == off, nd


@pytest.mark.parametrize("n", [2, 4, 8])
def test_dryrun_multichip(graft, n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    graft.dryrun_multichip(n)  # asserts exact parity internally
