"""Regenerate benchmarks.svg — the README comparison chart — from the
NEWEST recorded BENCH_DETAIL_rNN.json (this framework's bars and the
same-host competitor bars are artifact values, never hand-edited, so the
chart cannot drift from the official artifact — VERDICT r4 item 4; the
reference keeps benchmarks.svg ↔ README.md:28-40 consistent).

Two small-multiple panels (long-haystack sweep, short-haystack all-pairs
sweep), horizontal bars of wall time per full sweep, linear axis, every bar
direct-labeled (the winning bar is otherwise invisible at this dynamic
range).  Reference-machine competitor numbers are the reference's
published table (README.md:34-38 of cloudflare/sliceslice-rs, i7-6700).

Usage: python scripts/make_benchmarks_svg.py  (writes benchmarks.svg)
"""

import json
import os
import re


import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
NEUTRAL = "#b5b3ac"  # competitor bars
ACCENT = "#2a78d6"  # this framework (categorical slot 1)

REF_LONG_MS = 35.181
REF_SHORT_MS = 79.416


def newest_detail() -> tuple:
    rounds = {}
    for f in os.listdir(REPO):
        m = re.fullmatch(r"BENCH_DETAIL_r(\d+)\.json", f)
        if m:
            rounds[int(m.group(1))] = f
    if not rounds:
        raise SystemExit("no BENCH_DETAIL_rNN.json artifacts found")
    n = max(rounds)
    return n, json.load(open(os.path.join(REPO, rounds[n])))


def build_rows(detail: dict) -> list:
    """(label, long_ms, short_ms, is_ours) — artifact-derived where a
    same-host or own measurement exists, reference-published otherwise."""
    comp = detail.get("competitors") or {}

    def med(key):
        t = comp.get(key)
        return round(t[1], 1) if t else None

    ours_long = detail["sustained_ms_per_sweep"]
    ours_short = detail.get("short_sweep_ms")
    return [
        ("std String::find (i7-6700)", 345.0, 335.6, False),
        ("memmem TwoWaySearcher (i7-6700)", 401.6, 88.0, False),
        ("twoway find_bytes (i7-6700)", 146.4, 274.8, False),
        ("python bytes.find (this host)",
         med("long_py_bytes_find_ms"), None, False),
        ("C++ SWAR scanner (this host, csrc/)",
         med("long_native_swar_ms"),
         comp.get("short_native_swar_allpairs_ms"), False),
        ("C++ Two-Way (this host, csrc/)",
         med("long_native_twoway_ms"), None, False),
        ("sse4-strstr avx2 C++ (i7-6700)", 38.6, 75.5, False),
        ("sliceslice v0.2.0 (i7-6700)", REF_LONG_MS, REF_SHORT_MS, False),
        ("sliceslice_tpu (1x TPU v5e, sustained)",
         round(ours_long, 2), ours_short and round(ours_short, 2), True),
    ]


def main() -> None:
    rnd, detail = newest_detail()
    ROWS = build_rows(detail)
    ours_long = detail["sustained_ms_per_sweep"]
    ours_short = detail.get("short_sweep_ms")
    PANELS = [
        ("Long haystack: 4,585 words x 857 KB i386.txt", 1,
         f"{REF_LONG_MS / ours_long:.1f}x"),
        ("Short haystack: all ~10.5M word pairs", 2,
         f"{REF_SHORT_MS / ours_short:.0f}x" if ours_short else "-"),
    ]
    fig, axes = plt.subplots(
        1, 2, figsize=(11, 3.8), dpi=100, facecolor=SURFACE
    )
    for ax, (title, col, speedup) in zip(axes, PANELS):
        rows = [r for r in ROWS if r[col] is not None and r[1] is not None]
        rows.sort(key=lambda r: -r[col])
        labels = [r[0] for r in rows]
        vals = [r[col] for r in rows]
        colors = [ACCENT if r[3] else NEUTRAL for r in rows]
        y = range(len(rows))
        ax.set_facecolor(SURFACE)
        ax.barh(y, vals, color=colors, height=0.62, zorder=3)
        vmax = max(vals)
        for yi, (v, r) in enumerate(zip(vals, rows)):
            ax.text(
                v + 0.012 * vmax, yi, f"{v:g} ms",
                va="center", ha="left", fontsize=8.5,
                color=TEXT if r[3] else TEXT2,
                fontweight="bold" if r[3] else "normal", zorder=4,
            )
        ax.set_yticks(list(y))
        ax.set_yticklabels(labels, fontsize=8.5, color=TEXT)
        ax.set_title(
            f"{title}\n(one full sweep; ours {speedup} vs reference)",
            fontsize=9.5, color=TEXT, loc="left",
        )
        ax.set_xlabel("wall time per sweep, ms (lower is better)",
                      fontsize=8.5, color=TEXT2)
        ax.set_xlim(0, vmax * 1.22)
        ax.tick_params(colors=TEXT2, labelsize=8)
        ax.grid(axis="x", color="#e4e3df", linewidth=0.8, zorder=0)
        for side in ("top", "right", "left"):
            ax.spines[side].set_visible(False)
        ax.spines["bottom"].set_color("#e4e3df")
    fig.suptitle(
        "Substring-search sweep benchmarks: published reference numbers vs "
        f"this framework (BENCH_DETAIL_r{rnd:02d}, first-offset parity "
        "enforced)",
        fontsize=10, color=TEXT, x=0.01, ha="left",
    )
    fig.tight_layout(rect=(0, 0, 1, 0.93))
    fig.savefig(os.path.join(REPO, "benchmarks.svg"), format="svg",
                facecolor=SURFACE)
    print("wrote benchmarks.svg")


if __name__ == "__main__":
    main()
