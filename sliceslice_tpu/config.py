"""Runtime configuration.

The reference selects its native layer at compile time via ``cfg(target_arch)``
(src/lib.rs:10-24); here the equivalent switch is the JAX platform: Pallas
kernels compile through Mosaic on TPU and fall back to the Pallas interpreter
elsewhere (how the reference runs its wasm backend under wasmtime in CI).
"""

from __future__ import annotations

import os

import jax

# Persistent compilation cache: Mosaic kernel compiles are expensive (remote
# compile service on this setup); cache across processes.
_cache_dir = os.environ.get(
    "SLICESLICE_TPU_CACHE", os.path.expanduser("~/.cache/sliceslice_tpu_xla")
)
if _cache_dir:
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

#: Force Pallas interpreter mode: True/False, or None for auto (interpret
#: whenever the default backend is not a real TPU).
interpret: bool | None = None

#: Default number of needles evaluated per Pallas grid step (tuned on
#: TPU v5e with the while_loop segment walk: 256 beats 128 by ~6% on the
#: i386 sweep — fewer blocks means fewer per-block prologues and window
#: rebuilds, and the compacted unfound list keeps early-exit economics
#: per-needle regardless of block size; capped per-call so SMEM probe
#: tables stay small).
NEEDLE_BLOCK = 256


def use_interpret() -> bool:
    if interpret is not None:
        return interpret
    env = os.environ.get("SLICESLICE_TPU_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() != "tpu"
