"""Full i386 conformance sweep -> CONFORMANCE_rNN.json (driver artifact).

The reference's CI RUNS the complete conformance corpus on every push
(/root/reference/tests/i386.rs:46-70): every word of the 4,585-word
dictionary searched in every same-or-longer word (~10.5M ordered pairs),
and every word searched in the 857,425-byte i386 manual.  This script is
that run as a machine-checkable per-round artifact: both sweeps execute in
FULL on the device and are compared against the host ``bytes.find`` oracle
at first-match-OFFSET granularity (a strict superset of the reference's
bool assertions — BASELINE.json demands offsets).

Writes ``CONFORMANCE_rNN.json``:

    {"round": N, "short_pairs": ..., "short_mismatches": 0,
     "short_total_checked": ..., "long_words": 4585, "long_mismatches": 0,
     "platform": "tpu"}

Run standalone (``make conformance``) or from ``bench.py`` (every driver
bench run emits the artifact from the same session).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def next_round() -> int:
    """Current round number: one past the newest recorded BENCH artifact."""
    rounds = [0]
    for f in os.listdir(REPO):
        if f.startswith("BENCH_r") and f.endswith(".json"):
            try:
                rounds.append(int(f[len("BENCH_r"):-len(".json")]))
            except ValueError:
                pass
    return max(rounds) + 1


def run_conformance(full: bool = True, round_no: int | None = None) -> dict:
    """Execute both sweeps; returns the artifact dict (does not write).

    ``round_no``: the round to label the artifact with.  Callers that also
    write BENCH artifacts (bench.py) compute it ONCE up front and pass it
    here — inferring it again later would relabel reruns with the next
    round number (ADVICE r4)."""
    import jax

    import sliceslice_tpu as st
    from sliceslice_tpu.ops.pairwise import PairwiseSearcher

    platform = jax.default_backend()
    hay = open(os.path.join(REPO, "data/i386.txt"), "rb").read()
    words = [
        w for w in open(os.path.join(REPO, "data/words.txt"), "rb")
        .read().split(b"\n") if w
    ]
    if not full:
        # CPU-interpreter smoke slice (CI): same code path, reduced corpus.
        words = words[:96]
        hay = hay[: 96 * 1024]

    # Long sweep: all words x the manual, offsets.
    dh = st.preprocess(hay, kh=24)
    got_long = st.BatchedSearcher(words).find_all(dh)
    exp_long = np.asarray([hay.find(w) for w in words])
    long_mm = int((got_long != exp_long).sum())

    # Short sweep: the full ordered word x word matrix, offsets.  The
    # reference sweep is the ~10.5M same-or-longer pairs; the matrix is all
    # N^2 ordered pairs (shorter haystacks must report absent), a superset.
    ws = sorted(words, key=len)
    ps = PairwiseSearcher(ws)
    got_short = np.asarray(ps.first_matrix())  # int32[N, N] -1 absent
    lens = np.asarray([len(w) for w in ws])
    short_pairs = int((lens[None, :] >= lens[:, None]).sum())
    exp_short = np.empty_like(got_short)
    for i, nd in enumerate(ws):
        exp_short[i] = [h.find(nd) for h in ws]
    short_mm = int((got_short != exp_short).sum())

    return {
        "round": next_round() if round_no is None else int(round_no),
        "platform": platform,
        "full": bool(full),
        "long_words": len(words),
        "long_mismatches": long_mm,
        "short_words": len(ws),
        "short_pairs": short_pairs,
        "short_total_checked": int(exp_short.size),
        "short_mismatches": short_mm,
    }


def write_artifact(result: dict) -> str:
    path = os.path.join(REPO, f"CONFORMANCE_r{result['round']:02d}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    return path


def main():
    import jax

    full = jax.default_backend() == "tpu" or "--full" in sys.argv
    round_no = None
    if "--round" in sys.argv:
        round_no = int(sys.argv[sys.argv.index("--round") + 1])
    result = run_conformance(full=full, round_no=round_no)
    path = write_artifact(result)
    print(json.dumps(result))
    print(f"wrote {path}", file=sys.stderr)
    if result["long_mismatches"] or result["short_mismatches"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
