"""Execute the multi-host path FOR REAL: 2 jax.distributed processes on CPU.

The reference sets the bar of *executing* cross-platform code paths rather
than leaving them compile-only (its wasm backend runs under wasmtime in CI,
.github/workflows/check.yml); the analogue here is driving
``jax.distributed.initialize`` + ``assemble_global_corpus`` +
``sharded_find_cols``/``sharded_count_cols`` across two real OS processes
(4 virtual CPU devices each -> one 8-device global mesh) and asserting
parity with a host oracle.  No process ever materializes the full corpus.

Launcher mode (no args): spawns the two workers and checks exit codes.
Worker mode:  python scripts/multihost_check.py <port> <process_id>
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NPROC = 2
DEVS_PER_PROC = 4
CORPUS_BYTES = 600_000
SEG_ROWS = 96  # small segments so every device gets several


def corpus_chunk(base: int, size: int) -> bytes:
    """Deterministic corpus generator — any process can produce any range
    without holding the whole corpus."""
    import numpy as np

    rng = np.random.default_rng(77)
    # Cheap but deterministic: one global draw is fine at this test size;
    # slice the requested range.
    full = rng.integers(97, 105, (CORPUS_BYTES,), dtype=np.uint8)
    return full[base : base + size].tobytes()


def worker(port: int, pid: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", DEVS_PER_PROC)

    import numpy as np

    import sliceslice_tpu  # noqa: F401  (config side effects: interpret mode)
    from sliceslice_tpu.needle import build_probe_table
    from sliceslice_tpu.ops.layout import LANES, round_up
    from sliceslice_tpu.parallel import sharded_count_cols, sharded_find_cols
    from sliceslice_tpu.parallel.distributed import (
        assemble_global_corpus,
        global_mesh,
        initialize,
    )

    initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=NPROC,
        process_id=pid,
    )
    assert jax.process_count() == NPROC, jax.process_count()
    assert jax.device_count() == NPROC * DEVS_PER_PROC
    mesh = global_mesh()

    # Each process builds ONLY its contiguous half (padded to whole segments
    # on the final host), plus the kh-byte peek past its range.  The global
    # segment count rounds to the data axis (8 shards over 2 processes).
    kh = 32
    seg = SEG_ROWS * LANES
    n_data = mesh.shape["data"]
    g_global = round_up(-(-CORPUS_BYTES // seg), NPROC * (n_data // NPROC))
    g_global = round_up(g_global, n_data)
    g_local = g_global // NPROC
    lo = pid * g_local * seg
    hi = min((pid + 1) * g_local * seg, CORPUS_BYTES)
    local = corpus_chunk(lo, max(hi - lo, 0))
    peek = corpus_chunk(hi, kh) if hi < CORPUS_BYTES else b""
    gc = assemble_global_corpus(
        local, peek, CORPUS_BYTES, SEG_ROWS, kh, mesh, g_local=g_local
    )
    assert gc.g == g_global

    # Needles: known plants (incl. one straddling the PROCESS boundary),
    # an absent one, and a high-count one.
    mid = NPROC // 2 * g_local * seg  # the cross-process shard boundary
    probes = [
        (corpus_chunk(10, 12), 12),
        (corpus_chunk(mid - 5, 10), 10),  # straddles process 0 / process 1
        (corpus_chunk(CORPUS_BYTES - 8, 8), 8),
        (b"ZZZZ!", 5),
        (corpus_chunk(0, 2), 2),
    ]
    needles = [nd for nd, _ in probes]
    values, masks, lengths = build_probe_table(needles)
    ends = np.maximum(CORPUS_BYTES - lengths.astype(np.int64) + 1, 0)

    got = np.asarray(sharded_find_cols(gc, values, masks, ends, mesh))
    cnt = np.asarray(sharded_count_cols(gc, values, masks, ends, mesh))

    # Oracle on the full corpus (test-only; workers CAN generate it here).
    from sliceslice_tpu.searcher import overlapping_count

    full = corpus_chunk(0, CORPUS_BYTES)
    for nd, o, c in zip(needles, got, cnt):
        exp = full.find(nd)
        eo = -1 if exp < 0 else exp
        oo = -1 if o >= 2**31 - 1 else int(o)
        assert oo == eo, (nd, oo, eo)
        assert int(c) == overlapping_count(full, nd), (nd, int(c))
    print(f"process {pid}: multihost parity ok "
          f"({len(needles)} needles, mesh {dict(zip(mesh.axis_names, mesh.devices.shape))})")


def main() -> None:
    if len(sys.argv) == 3:
        worker(int(sys.argv[1]), int(sys.argv[2]))
        return
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, str(port), str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(NPROC)
    ]
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        tail = b"\n".join(out.splitlines()[-8:]).decode(errors="replace")
        if p.returncode != 0:
            ok = False
            print(f"-- worker {i} FAILED (rc={p.returncode}) --\n{tail}")
        else:
            print(tail.splitlines()[-1] if tail else f"worker {i} ok")
    if not ok:
        sys.exit(1)
    print("multihost_check: 2-process sharded scan parity ok")


if __name__ == "__main__":
    main()
