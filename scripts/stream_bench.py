"""Streaming throughput benchmark: sustained GB/s over real multi-GB files.

The on-device numbers (BENCH_rNN) measure a device-resident corpus; this
harness measures the OTHER scale tier — utils/streaming.StreamingScanner
pulling files through the chip with pipelined ingestion, ONE fused jit
dispatch per window, and the one-readback device-fold protocol — and
records, per stream, the scanner's own attribution (read/prep/dispatch/
drain seconds + p50/p90 window latency, StreamingScanner.stats) so the
number is self-diagnosing (VERDICT r4 item 1).

Protocol facts this harness is built around (measured r4, docs/
ROUND4_RESPONSE.md):

* the FIRST device->host data readback permanently drops this transport's
  bulk bandwidth ~40x for the process — so EVERY timed stream runs in its
  own fresh child process, warmed up (zero-readback, exact shapes) before
  its link-ceiling probe and its single timed stream;
* the parent process NEVER imports jax (one chip: a second initialized
  process contends and inflates wall times 5-20x — ADVICE r4) — children
  run strictly serialized;
* the headline long stream is recorded alongside best-of-K short streams
  so one child's transport weather cannot define the round's number.

Prints a human table and a JSON line; bench.py records the same object in
BENCH_DETAIL_rNN.json.

Usage: python scripts/stream_bench.py [long_bytes] [--fast]
       python scripts/stream_bench.py --child <mode> <bytes> (internal)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

PATH = "/tmp/sliceslice_stream_bench.bin"
WINDOW = 32 << 20


def ensure_corpus(size: int) -> str:
    """Exact-``size`` random file (a stream scans its whole file, so each
    measured size needs its own); sizes share one master's prefix bytes."""
    if not (os.path.exists(PATH) and os.path.getsize(PATH) >= size):
        rng = np.random.default_rng(42)
        with open(PATH, "wb") as f:
            left = max(size, 1 << 30)
            while left:
                n = min(left, 256 << 20)
                f.write(rng.bytes(n))
                left -= n
    if os.path.getsize(PATH) == size:
        return PATH
    sized = f"/tmp/sliceslice_stream_bench_{size}.bin"
    if not (os.path.exists(sized) and os.path.getsize(sized) == size):
        with open(PATH, "rb") as src, open(sized, "wb") as dst:
            left = size
            while left:
                n = min(left, 256 << 20)
                dst.write(src.read(n))
                left -= n
    return sized


def draw_needles(path: str, size: int):
    """48 mixed-length substrings drawn from the corpus + an absent decoy
    (same draw as r4 so rounds compare)."""
    with open(path, "rb") as f:
        head = f.read(4 << 20)
        f.seek(size // 2)
        mid = f.read(1 << 20)
    rng = np.random.default_rng(7)
    return [
        bytes(src[o : o + k])
        for src in (head, mid)
        for k in (8, 12, 16, 24, 33, 64)
        for o in map(int, rng.integers(0, len(src) - 64, (4,)))
    ] + [b"\x00absent!" + bytes(8) + b"q" * 9]


def link_probes(window: int = 8 << 20, reps: int = 3) -> dict:
    """Two host->device ingest measurements on THIS child's link:

    * ``link_staging_gbps`` — upload + block only.  On transports that
      stage uploads locally and ship lazily (the axon tunnel), this is
      the STAGING rate, not the wire (r4 recorded it as the "ceiling",
      which made the stream look 100x off; it measured a local memcpy).
    * ``link_wire_mbps`` — upload + a dependent 8-byte readback per rep,
      which forces the staged bytes over the wire: the TRUE ingest
      ceiling a stream can sustain."""
    import jax
    import jax.numpy as jnp

    buf = np.random.default_rng(0).integers(0, 255, (window,), dtype=np.uint8)
    jnp.asarray(buf).block_until_ready()  # warm/register the buffer
    t0 = time.perf_counter()
    for _ in range(reps):
        jnp.asarray(buf).block_until_ready()
    staging = window * reps / (time.perf_counter() - t0) / 1e9
    probe = jax.jit(lambda x: x[:8].astype(jnp.int32).sum())
    int(np.asarray(probe(jnp.asarray(buf))))  # compile + settle
    t0 = time.perf_counter()
    done = 0
    for i in range(reps):
        buf[:64] = i  # content changes so nothing can be deduplicated
        int(np.asarray(probe(jnp.asarray(buf))))
        done += 1
        if time.perf_counter() - t0 > 15:
            break  # terrible weather: one rep is measurement enough
    wire = window * done / (time.perf_counter() - t0) / 1e6
    return {
        "link_staging_gbps": round(staging, 3),
        "link_wire_mbps": round(wire, 1),
        "wire_probe_reps": done,
    }


def child(mode: str, size: int) -> dict:
    """Run ONE timed stream on a clean link: transport flush -> wire
    probe -> weather-adaptive stream sizing -> warmup (exact shapes) ->
    the stream.  The wire on this transport swings ~0.2-40 MB/s with
    weather (docs/DESIGN.md), so the stream length is capped to a fixed
    time budget at the JUST-measured rate — a bad-weather round records a
    smaller exact measurement instead of a timeout hole."""
    import jax
    import jax.numpy as jnp

    from sliceslice_tpu.utils.streaming import StreamingScanner

    if jax.default_backend() != "tpu":
        return {"skipped": f"backend={jax.default_backend()}"}
    # Force the process's first (pathologically slow) wire flush on 32
    # bytes, before anything bulk — see StreamingScanner.warmup.
    np.asarray(jnp.zeros((8,), jnp.int32) + 1)
    res = {"mode": mode, "window": WINDOW}
    res.update(link_probes())
    wire = res.get("link_wire_mbps") or 0.0
    budget_s = 150 if mode == "positions" else 360
    if wire > 0:
        cap = int(wire * 1e6 * budget_s)
        eff = max(4 * WINDOW, min(size, cap) // WINDOW * WINDOW)
        if eff < size:
            res["requested_bytes"] = size
            res["sized_to_s"] = budget_s
            size = eff
    path = ensure_corpus(size)
    needles = draw_needles(path, size)
    if mode == "positions":
        needles = needles[:8] + needles[-1:]  # bitmap readback is per needle
    sc = StreamingScanner(needles, window_bytes=WINDOW)
    t0 = time.perf_counter()
    sc.warmup(modes=(mode,))
    res.update({
        "bytes": size, "needles": len(needles),
        "warmup_s": round(time.perf_counter() - t0, 1),
    })
    t0 = time.perf_counter()
    if mode == "find":
        out = sc.find_in_file(path, early_stop=False)
        # Spot parity: the drawn needles exist, the decoy does not.
        assert int(out[-1]) == -1
        assert all(int(x) >= 0 for x in out[:-1])
    elif mode == "count":
        out = sc.count_in_file(path)
        assert int(out[-1]) == 0
        assert all(int(x) >= 1 for x in out[:-1])
    elif mode == "positions":
        out = sc.positions_in_file(path)
        assert out[-1].size == 0
        assert all(p.size >= 1 and (np.diff(p) > 0).all() for p in out[:-1])
    else:
        raise SystemExit(f"unknown child mode {mode}")
    wall = time.perf_counter() - t0
    res["wall_s"] = round(wall, 3)
    res["gbps"] = round(size / wall / 1e9, 3)
    res["stats"] = sc.stats_summary()
    return res


def _spawn(mode: str, size: int, timeout: int = 1200) -> dict:
    """One serialized fresh-process measurement (the parent holds no
    device, so the child owns the chip alone)."""
    ensure_corpus(size)
    # Children re-read only the first `size` bytes of the shared corpus.
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", mode,
         str(size)],
        capture_output=True, text=True, timeout=timeout, cwd=REPO,
    )
    try:
        return json.loads(proc.stdout.strip().splitlines()[-1])
    except Exception:
        return {
            "error": f"child {mode} rc={proc.returncode}",
            "tail": proc.stderr[-800:],
        }


def backend_is_tpu() -> bool:
    """Probe the backend in a throwaway process (the parent must never
    initialize the device — it would contend with every child)."""
    p = subprocess.run(
        [sys.executable, "-c",
         "import jax; print(jax.default_backend())"],
        capture_output=True, text=True, timeout=300,
    )
    return p.stdout.strip().splitlines()[-1:] == ["tpu"]


def run(long_bytes: int, fast: bool = False, phase_budget_s: int = 1500) -> dict:
    if not backend_is_tpu():
        return {"skipped": "not on tpu"}
    short = 256 << 20
    res = {
        "window_bytes": WINDOW,
        "protocol": "one fresh child process per timed stream (each "
        "flushes the transport early, probes the WIRE rate, and sizes "
        "its stream to a time budget at that rate; children serialized, "
        "parent never touches the device)",
    }
    t0 = time.perf_counter()

    def within_budget(key):
        # Terrible weather degrades to a partial-but-honest record
        # instead of blowing the whole bench's wall budget.
        if time.perf_counter() - t0 < phase_budget_s:
            return True
        res[key] = {"skipped": "phase time budget exhausted"}
        return False

    res["find_long"] = _spawn("find", long_bytes)
    if within_budget("count_long"):
        res["count_long"] = _spawn(
            "count", long_bytes if not fast else short
        )
    shorts = []
    for _ in range(1 if fast else 2):
        if not within_budget("find_short"):
            break
        shorts.append(_spawn("find", short))
    if shorts:
        res["find_short"] = shorts
    ok_short = [s["gbps"] for s in shorts if "gbps" in s]
    if ok_short:
        res["find_short_best_gbps"] = max(ok_short)
    if within_budget("positions_small"):
        res["positions_small"] = _spawn("positions", 64 << 20)
    fl = res["find_long"]
    if "gbps" in fl and fl.get("link_wire_mbps"):
        # Fraction of the same-child measured WIRE ingest ceiling the
        # stream sustained (1.0 = fully wire-bound; r4's
        # "ingest_bound_fraction" divided by the staging rate instead and
        # made a wire-bound stream look 100x off).
        res["wire_ceiling_fraction"] = round(
            fl["gbps"] * 1e3 / fl["link_wire_mbps"], 3
        )
    return res


def main():
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        print(json.dumps(child(sys.argv[i + 1], int(sys.argv[i + 2]))))
        return
    long_bytes = 1 << 30
    for a in sys.argv[1:]:
        if a.isdigit():
            long_bytes = int(a)
    res = run(long_bytes, fast="--fast" in sys.argv)
    if "skipped" not in res:
        fl, cl = res["find_long"], res["count_long"]
        print(
            f"stream find : {fl.get('gbps', '?')} GB/s "
            f"({fl.get('wall_s', '?')}s for "
            f"{fl.get('bytes', 0)/2**30:.1f} GiB; wire ceiling "
            f"{fl.get('link_wire_mbps', '?')} MB/s -> "
            f"{100 * res.get('wire_ceiling_fraction', 0):.0f}% of it)\n"
            f"stream count: {cl.get('gbps', '?')} GB/s\n"
            f"short finds : best {res.get('find_short_best_gbps', '?')} "
            f"GB/s of {len(res.get('find_short', []))}\n"
            f"positions   : {res.get('positions_small', {}).get('gbps', '?')}"
            f" GB/s (per-window bitmap readbacks — link-collapse bound)",
            file=sys.stderr,
        )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
