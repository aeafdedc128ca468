"""Regenerate benchmarks.svg — the README comparison chart.

Two small-multiple panels (long-haystack sweep, short-haystack all-pairs
sweep), horizontal bars of wall time per full sweep, linear axis, every bar
direct-labeled (the winning bar is otherwise invisible at this dynamic
range).  Competitor numbers are the reference's published table
(README.md:34-38 of cloudflare/sliceslice-rs, i7-6700) plus host
competitors measured on this machine; this framework's numbers come from
bench.py on one TPU v5e chip (sustained, K=32 async sweeps per sync).

Usage: python scripts/make_benchmarks_svg.py  (writes benchmarks.svg)
"""

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
NEUTRAL = "#b5b3ac"  # competitor bars
ACCENT = "#2a78d6"  # this framework (categorical slot 1)

# (label, long_ms, short_ms, is_ours)
ROWS = [
    ("std String::find (i7-6700)", 345.0, 335.6, False),
    ("memmem TwoWaySearcher (i7-6700)", 401.6, 88.0, False),
    ("twoway find_bytes (i7-6700)", 146.4, 274.8, False),
    ("python bytes.find (this host)", 445.0, None, False),
    ("C++ SWAR scanner (this host, csrc/)", 101.0, None, False),
    ("sse4-strstr avx2 C++ (i7-6700)", 38.6, 75.5, False),
    ("sliceslice v0.2.0 (i7-6700)", 35.2, 79.4, False),
    ("sliceslice_tpu (1x TPU v5e, sustained)", 2.53, 1.17, True),
]

PANELS = [
    ("Long haystack: 4,585 words x 857 KB i386.txt", 1, "13.6x"),
    ("Short haystack: all ~10.5M word pairs", 2, "68x"),
]


def main() -> None:
    fig, axes = plt.subplots(
        1, 2, figsize=(11, 3.8), dpi=100, facecolor=SURFACE
    )
    for ax, (title, col, speedup) in zip(axes, PANELS):
        rows = [r for r in ROWS if r[col] is not None]
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
        "this framework (bench.py, first-offset parity enforced)",
        fontsize=10, color=TEXT, x=0.01, ha="left",
    )
    fig.tight_layout(rect=(0, 0, 1, 0.93))
    fig.savefig("benchmarks.svg", format="svg", facecolor=SURFACE)
    print("wrote benchmarks.svg")


if __name__ == "__main__":
    main()
