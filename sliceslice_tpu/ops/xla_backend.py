"""Portable XLA (non-Pallas) search paths.

The role of the reference's portable ``StdSimdSearcher`` (src/stdsimd.rs) —
one algorithm expressed through the compiler's portable vector model, running
on any JAX backend (CPU/TPU), used both as the short-haystack rung of the
dispatch ladder and as a differential-testing reference for the Pallas
kernels (the way the reference tests wasm under wasmtime, check.yml).

Probe slot ``t`` compares the packed 4-byte window at static offset ``4*t``
(see needle.probe_program).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .scan_math import (
    SENTINEL,
    first_offset,
    packed_windows,
    probe_acc,
    segment_positions,
    value_slicer,
)


@jax.jit
def _find_flat_impl(flat, values, masks, end):
    """flat: uint8[(Lp,)]; values/masks: [(T,)]; end scalar -> first offset."""
    h = flat.astype(jnp.uint32)
    p = (
        h
        | (jnp.roll(h, -1) << 8)
        | (jnp.roll(h, -2) << 16)
        | (jnp.roll(h, -3) << 24)
    )
    lp = flat.shape[0]
    acc = None
    for t in range(values.shape[0]):
        pt = jnp.roll(p, -4 * t) if t else p
        # Pre-masked table values (needle.py contract): 2-op masked compare.
        eq = (pt & masks[t]) == values[t]
        acc = eq if acc is None else jnp.logical_and(acc, eq)
    idx = jnp.arange(lp, dtype=jnp.int32)
    valid = jnp.logical_and(acc, idx < end)
    return jnp.min(jnp.where(valid, idx, SENTINEL))


def find_flat(flat, values, masks, end):
    """First match offset (or SENTINEL) of one probe program over a flat
    zero-padded uint8 haystack.  Wrap-around from the rolls only touches
    positions masked by ``end``, so semantics are exact."""
    return _find_flat_impl(
        flat,
        jnp.asarray(values, jnp.uint32),
        jnp.asarray(masks, jnp.uint32),
        jnp.asarray(end, jnp.int32),
    )


@functools.partial(jax.jit, static_argnums=(4,))
def _find_cols_impl(cols, values, masks, end, s):
    seg = s * 128
    t_num = values.shape[0]

    def body(g, best):
        tile = jax.lax.dynamic_index_in_dim(cols, g, axis=0, keepdims=False)
        p = packed_windows(tile)
        probes = [(4 * t, values[t], masks[t]) for t in range(t_num)]
        acc = probe_acc(value_slicer(p, s), probes)
        fl = first_offset(acc, end - g * seg, s)
        fg = jnp.where(fl < SENTINEL, fl + g * seg, SENTINEL)
        return jnp.minimum(best, fg)

    return jax.lax.fori_loop(0, cols.shape[0], body, jnp.int32(SENTINEL))


def find_cols(cols, values, masks, end, s: int):
    """First match over the tiled (G, S+KH, 128) column layout — same math as
    the Pallas kernel, expressed as plain XLA."""
    return _find_cols_impl(
        cols,
        jnp.asarray(values, jnp.uint32),
        jnp.asarray(masks, jnp.uint32),
        jnp.asarray(end, jnp.int32),
        s,
    )


@functools.partial(jax.jit, static_argnums=(4,))
def _find_batched_cols_impl(cols, values, masks, ends, s):
    def one(vals, msks, end):
        return _find_cols_impl(cols, vals, msks, end, s)

    return jax.vmap(one)(values, masks, ends)


def find_batched_cols(cols, values, masks, ends, s: int):
    """Vectorized multi-needle variant (N, T) tables -> (N,) first offsets."""
    return _find_batched_cols_impl(
        cols,
        jnp.asarray(values, jnp.uint32),
        jnp.asarray(masks, jnp.uint32),
        jnp.asarray(ends, jnp.int32),
        s,
    )


@jax.jit
def _find_batched_flat_impl(flat, values, masks, ends):
    def one(vals, msks, end):
        return _find_flat_impl(flat, vals, msks, end)

    return jax.vmap(one)(values, masks, ends)


def find_batched_flat(flat, values, masks, ends):
    return _find_batched_flat_impl(
        flat,
        jnp.asarray(values, jnp.uint32),
        jnp.asarray(masks, jnp.uint32),
        jnp.asarray(ends, jnp.int32),
    )


# -- all-occurrence positions: packed match bitmaps --------------------------
#
# Capability extension (the reference returns bool only; memchr-class
# libraries expose find_iter): evaluate every position and return a packed
# uint32 bitmap, 1/8th the corpus in bytes, decoded to sorted offsets on
# host.  Full scan by construction (an absence proof needs one anyway), so
# the portable XLA formulation is already at bandwidth; no Pallas variant
# needed.


@functools.partial(jax.jit, static_argnums=(4,))
def _match_bitmap_cols_impl(cols, values, masks, end, s):
    seg = s * 128
    t_num = values.shape[0]

    def one_seg(tile, g_idx):
        p = packed_windows(tile)
        probes = [(4 * t, values[t], masks[t]) for t in range(t_num)]
        acc = probe_acc(value_slicer(p, s), probes)  # (s, 128) bool
        pos = segment_positions(s) + g_idx * seg
        valid = jnp.logical_and(acc, pos < end)
        # Pack 32 consecutive rows per lane into one word: bit b of
        # word [q, lane] = match at row 32*q + b (decode in
        # decode_match_bitmap).  Disjoint bits, so a sum is an OR.
        w = valid.reshape(s // 32, 32, 128).astype(jnp.uint32)
        shifts = jnp.arange(32, dtype=jnp.uint32)[None, :, None]
        return jnp.sum(w << shifts, axis=1, dtype=jnp.uint32)

    return jax.vmap(one_seg)(cols, jnp.arange(cols.shape[0]))


def match_bitmap_cols(cols, values, masks, end, s: int):
    """Packed match bitmap over the tiled layout: uint32[(G, S/32, 128)],
    bit ``b`` of word ``[g, q, lane]`` set iff a valid match starts at
    ``pos = g*S*128 + lane*S + 32*q + b`` (``pos < end`` applied)."""
    return _match_bitmap_cols_impl(
        cols,
        jnp.asarray(values, jnp.uint32),
        jnp.asarray(masks, jnp.uint32),
        jnp.asarray(end, jnp.int32),
        s,
    )


@functools.partial(jax.jit, static_argnums=(4,))
def _match_bitmap_batched_impl(cols, values, masks, ends, s):
    def one(vals, msks, end):
        return _match_bitmap_cols_impl(cols, vals, msks, end, s)

    return jax.vmap(one)(values, masks, ends)


def match_bitmap_batched(cols, values, masks, ends, s: int):
    """Batched :func:`match_bitmap_cols`: (N, T) probe tables ->
    uint32[(N, G, S/32, 128)] packed bitmaps (N * corpus/8 bytes — batch
    callers should chunk N)."""
    return _match_bitmap_batched_impl(
        cols,
        jnp.asarray(values, jnp.uint32),
        jnp.asarray(masks, jnp.uint32),
        jnp.asarray(ends, jnp.int32),
        s,
    )


def decode_match_bitmap(words: "np.ndarray", s: int) -> "np.ndarray":
    """Decode :func:`match_bitmap_cols` output to sorted match offsets
    (int64[M], ascending).  Prefers the native C++ decoder (popcount-sized
    output, ctz walk — csrc/swarscan.cpp) and falls back to the numpy
    unpackbits decode, which materializes 8x the bitmap in bytes."""
    from ..utils import native

    out = native.decode_bitmap(words, s)
    if out is not None:
        return out
    return decode_match_bitmap_numpy(words, s)


def decode_match_bitmap_numpy(words: "np.ndarray", s: int) -> "np.ndarray":
    """Pure-numpy reference decode (kept as the no-toolchain fallback and
    the differential oracle for the native decoder)."""
    import numpy as np

    words = np.ascontiguousarray(np.asarray(words, dtype=np.uint32))
    g, q, lanes = words.shape
    seg = s * lanes
    bits = np.unpackbits(
        words.view(np.uint8).reshape(g, q, lanes, 4), axis=-1,
        bitorder="little",
    ).reshape(g, q, lanes, 32)
    gg, qq, ll, bb = np.nonzero(bits)
    pos = (
        gg.astype(np.int64) * seg
        + ll.astype(np.int64) * s
        + 32 * qq.astype(np.int64)
        + bb.astype(np.int64)
    )
    pos.sort()
    return pos
