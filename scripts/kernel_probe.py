"""Kernel cost-isolation experiments (dev tool, TPU).

A stripped copy of the find kernel's fullscan path (blocks-only grid,
in-kernel segment fori, double-buffered DMA, hoisted windows) with ablation
knobs, to locate the ~109 ns/(needle, segment) floor that makes t=1 and
t=2 fullscans cost the same:

  full     — probes + select + min-reduce + out update (the real math)
  premask  — like full, but the final slot compares against per-segment
             premasked window copies (4 mask classes in VMEM scratch,
             dynamic class index per needle) — drops the per-needle AND
  premsel  — premask + select-chain: where(eq0, where(eq1, iota, NR), NR)
             instead of and(eq0, eq1) + one select — tests whether selects
             issue on the (apparently free) reduction unit while AND
             contends with the compares
  nomin    — probes only, OR-accumulate into out (drops first-offset math)
  noprobe  — select+min on a constant mask (drops probe compares)
  empty    — needle loop with only the out_ref update (scalar floor)
  dedup    — prefix-window deduplication (t=2 only): the slot-0 compare is
             hoisted OUT of the needle loop — once per (block, segment) the
             kernel materializes a candidate plane where(w0 == uval, 0,
             NO_ROW) per UNIQUE slot-0 value in the block (host-built
             per-block unique tables, U= knob caps the count), and each
             needle ORs its class's plane into the row iota instead of
             comparing.  Per-needle saving: [load w0 + cmp + AND] becomes
             [load plane + OR]; per-segment cost: U x (cmp + select +
             store).  Pays iff the block's unique count is well below its
             needle count — the dictionary-sweep hypothesis (DESIGN.md
             "first-window deduplication").
  swpipe   — needle-loop software pipelining: all scalar SMEM table reads
             for an unroll group issue BEFORE any of the group's vector
             chains, so the scalar core runs a full group ahead of the VPU
             (the other DESIGN.md candidate lever).

Usage: python scripts/kernel_probe.py [t=K] [u=N] [U=N] [variant ...]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sliceslice_tpu as st
from sliceslice_tpu.ops.scan_kernel import (
    LANES,
    NO_ROW,
    SENTINEL,
    _seg_dma_factory,
)

NBLK = 256


@functools.lru_cache(maxsize=32)
def build(g, h, s, t, n_pad, variant, unroll=4, umax=8):
    cs = s
    dedup = variant == "dedup"
    if dedup and t != 2:
        raise SystemExit("dedup ablation is t=2 only")

    def kernel(val_ref, msk_ref, *rest):
        if dedup:
            uval_ref, cls_ref, pw_hbm, out_ref = rest[:4]
            pbuf, p4buf, sem, pm_scr, dd_scr = rest[4:]
        else:
            uval_ref = cls_ref = dd_scr = None
            pw_hbm, out_ref, pbuf, p4buf, sem, pm_scr = rest
        seg_dma = _seg_dma_factory(pw_hbm, pbuf, p4buf, sem, h)
        for c in seg_dma(0, 0):
            c.start()
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (cs, LANES), 0)

        def scan_segment(gi, carry):
            slot = jax.lax.rem(gi, 2)

            @pl.when(gi + 1 < g)
            def _():
                for c in seg_dma(gi + 1, jax.lax.rem(gi + 1, 2)):
                    c.start()

            for c in seg_dma(gi, slot):
                c.wait()
            # hoisted windows (single chunk, t<=4)
            wins = []
            for ti in range(t):
                src = pbuf if ti % 2 == 0 else p4buf
                off = pl.multiple_of(4 * (ti - ti % 2), 8)
                wins.append(src[slot, pl.ds(off, cs), :])
            if variant in ("premask", "premsel", "dedup"):
                # One premasked copy of the final-slot window per mask
                # class, built once per (block, segment) — the per-needle
                # masked compare then drops its AND.
                pm_scr[0] = wins[t - 1] & jnp.uint32(0xFF)
                pm_scr[1] = wins[t - 1] & jnp.uint32(0xFFFF)
                pm_scr[2] = wins[t - 1] & jnp.uint32(0xFFFFFF)
                pm_scr[3] = wins[t - 1]
            if dedup:
                # Candidate plane per unique slot-0 value in the block:
                # 0 where the window matches, NO_ROW where it doesn't.
                nbi = pl.program_id(0)
                for u in range(umax):
                    dd_scr[u] = jnp.where(
                        wins[0] == uval_ref[nbi, u], 0, NO_ROW
                    )

            def scan_one(n):
                if variant == "empty":
                    out_ref[n, :] = jnp.minimum(
                        out_ref[n, :], jnp.int32(SENTINEL)
                    )
                    return
                if dedup:
                    bad0 = dd_scr[cls_ref[n, 0]]
                    m = msk_ref[n, 1]
                    cls = (
                        (m > 0xFF).astype(jnp.int32)
                        + (m > 0xFFFF).astype(jnp.int32)
                        + (m > 0xFFFFFF).astype(jnp.int32)
                    )
                    last_eq = pm_scr[cls] == val_ref[n, 1]
                    lmin = jnp.min(
                        jnp.where(last_eq, row_iota | bad0, NO_ROW),
                        axis=0, keepdims=True,
                    )
                    gmin = jnp.where(lmin < NO_ROW, lmin + gi, SENTINEL)
                    fin = jnp.minimum(out_ref[n, :].reshape(1, LANES), gmin)
                    out_ref[n, :] = fin.reshape(LANES)
                    return
                if variant != "noprobe":
                    eqs = []
                    for ti in range(t):
                        v = val_ref[n, ti]
                        if ti == t - 1 and variant in ("premask", "premsel"):
                            m = msk_ref[n, ti]
                            cls = (
                                jnp.int32(0)
                                + (m > 0xFF).astype(jnp.int32)
                                + (m > 0xFFFF).astype(jnp.int32)
                                + (m > 0xFFFFFF).astype(jnp.int32)
                            )
                            eqs.append(pm_scr[cls] == v)
                        elif ti == t - 1:
                            eqs.append((wins[ti] & msk_ref[n, ti]) == v)
                        else:
                            eqs.append(wins[ti] == v)
                    if variant == "premsel":
                        # select-chain instead of AND-chain: masked iota
                        # narrows through each eq.
                        mrows = row_iota
                        for eq in eqs:
                            mrows = jnp.where(eq, mrows, NO_ROW)
                        lmin = jnp.min(mrows, axis=0, keepdims=True)
                        gmin = jnp.where(lmin < NO_ROW, lmin + gi, SENTINEL)
                        fin = jnp.minimum(
                            out_ref[n, :].reshape(1, LANES), gmin
                        )
                        out_ref[n, :] = fin.reshape(LANES)
                        return
                    acc = None
                    for eq in eqs:
                        acc = eq if acc is None else jnp.logical_and(acc, eq)
                else:
                    acc = wins[0] == jnp.uint32(0xFFFFFFFF)
                if variant == "nomin":
                    found = jnp.max(acc.astype(jnp.int32), axis=0,
                                    keepdims=True)
                    fin = jnp.minimum(
                        out_ref[n, :].reshape(1, LANES),
                        jnp.where(found > 0, gi, SENTINEL),
                    )
                    out_ref[n, :] = fin.reshape(LANES)
                    return
                lmin = jnp.min(
                    jnp.where(acc, row_iota, NO_ROW), axis=0, keepdims=True
                )
                gmin = jnp.where(lmin < NO_ROW, lmin + gi, SENTINEL)
                fin = jnp.minimum(out_ref[n, :].reshape(1, LANES), gmin)
                out_ref[n, :] = fin.reshape(LANES)

            def group(i, c):
                for j in range(unroll):
                    scan_one(unroll * i + j)
                return c

            def group_pipelined(i, c):
                # Stage 1: every scalar SMEM read for the group, up front.
                staged = []
                for j in range(unroll):
                    n = unroll * i + j
                    vals = [val_ref[n, ti] for ti in range(t)]
                    staged.append((n, vals, msk_ref[n, t - 1]))
                # Stage 2: the vector chains, no scalar reads interleaved.
                for n, vals, m in staged:
                    acc = None
                    for ti in range(t):
                        v = vals[ti]
                        eq = (
                            ((wins[ti] & m) == v)
                            if ti == t - 1
                            else (wins[ti] == v)
                        )
                        acc = eq if acc is None else jnp.logical_and(acc, eq)
                    lmin = jnp.min(
                        jnp.where(acc, row_iota, NO_ROW),
                        axis=0, keepdims=True,
                    )
                    gmin = jnp.where(lmin < NO_ROW, lmin + gi, SENTINEL)
                    fin = jnp.minimum(out_ref[n, :].reshape(1, LANES), gmin)
                    out_ref[n, :] = fin.reshape(LANES)
                return c

            body = group_pipelined if variant == "swpipe" else group
            jax.lax.fori_loop(0, NBLK // unroll, body, 0)
            return carry

        out_ref[:] = jnp.full((NBLK, LANES), SENTINEL, jnp.int32)
        jax.lax.fori_loop(0, g, scan_segment, 0)

    in_specs = [
        pl.BlockSpec((NBLK, t), lambda nb: (nb, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((NBLK, t), lambda nb: (nb, 0), memory_space=pltpu.SMEM),
    ]
    scratch = [
        pltpu.VMEM((2, h - 3, LANES), jnp.uint32),
        pltpu.VMEM((2, h - 7, LANES), jnp.uint32),
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.VMEM((4, cs, LANES), jnp.uint32),
    ]
    if dedup:
        in_specs += [
            # Whole unique table in SMEM (a few hundred scalars), indexed
            # by program id — per-block SMEM slicing hits tiling rules.
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (NBLK, 1), lambda nb: (nb, 0), memory_space=pltpu.SMEM
            ),
        ]
        scratch.append(pltpu.VMEM((umax, cs, LANES), jnp.int32))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    return pl.pallas_call(
        kernel,
        grid=(n_pad // NBLK,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (NBLK, LANES), lambda nb: (nb, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, LANES), jnp.int32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def main():
    args = sys.argv[1:]
    t = 2
    unroll = 4
    umax = 8
    variants = []
    for a in args:
        if a.startswith("t="):
            t = int(a[2:])
        elif a.startswith("u="):
            unroll = int(a[2:])
        elif a.startswith("U="):
            umax = int(a[2:])
        else:
            variants.append(a)
    variants = variants or ["full", "nomin", "noprobe", "empty"]
    hay = open("data/i386.txt", "rb").read()
    dh = st.preprocess(hay, kh=24)
    pw = dh.windows()
    g, rows, _ = pw.shape
    h = rows + 3
    n = 4585
    n_pad = -(-n // NBLK) * NBLK
    rng = np.random.default_rng(0)
    values = rng.integers(1, 7, (n_pad, t), dtype=np.uint32).astype(np.uint32)
    masks = np.full((n_pad, t), 0xFFFFFFFF, np.uint32)
    # Mixed mask classes on the final slot (k % 4 = 1, 2, 3, 0).
    classes = np.array([0xFF, 0xFFFF, 0xFFFFFF, 0xFFFFFFFF], np.uint32)
    masks[:, t - 1] = classes[np.arange(n_pad) % 4]
    values = (values & masks).astype(np.uint32)
    # Plant a few real needles so correctness is observable (t=2 only).
    import struct
    if t == 2:
        for row, off in ((0, 100_000), (201, 40_000), (255, 700_000), (4000, 856_000)):
            nd = hay[off : off + 8]
            v0 = struct.unpack("<I", nd[:4])[0]
            v1 = struct.unpack("<I", nd[4:8])[0]
            values[row] = (v0, v1 & masks[row, 1])
    vals_d = jnp.asarray(values)
    msks_d = jnp.asarray(masks)
    # Per-block unique slot-0 tables for the dedup variant (host-built,
    # exactly what a production optimize_for reorder would emit).
    nblocks = n_pad // NBLK
    uvals = np.zeros((nblocks, umax), np.uint32)
    cls = np.zeros(n_pad, np.int32)
    for b in range(nblocks):
        blk = values[b * NBLK : (b + 1) * NBLK, 0]
        u, inv = np.unique(blk, return_inverse=True)
        if len(u) > umax:
            raise SystemExit(
                f"block {b} has {len(u)} unique slot-0 values > U={umax}"
            )
        uvals[b, : len(u)] = u
        cls[b * NBLK : (b + 1) * NBLK] = inv
    uval_d = jnp.asarray(uvals)
    cls_d = jnp.asarray(cls.reshape(-1, 1))
    K = 32
    ref_out = None
    for variant in variants:
        call = build(g, h, dh.s, t, n_pad, variant, unroll, umax)
        if variant == "dedup":
            run = lambda: call(vals_d, msks_d, uval_d, cls_d, pw)
        else:
            run = lambda: call(vals_d, msks_d, pw)
        out = np.asarray(run())  # compile+warm
        if variant == "full":
            ref_out = out
        elif variant in ("premask", "premsel", "dedup", "swpipe") and (
            ref_out is not None
        ):
            print(f"{variant} == full:", (out == ref_out).all())
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(K - 1):
                run()
            run().block_until_ready()
            ts.append((time.perf_counter() - t0) / K)
        per = min(ts)
        print(f"{variant:8s}: {per * 1e3:7.3f} ms/sweep  "
              f"{per * 1e9 / (n * g):6.1f} ns/(needle,seg)")


if __name__ == "__main__":
    main()
