"""Persistent XLA compilation cache for the training/bench entry points.

The supervisor (scripts/train_supervised.sh) runs training in bounded
chunks; without a persistent cache every chunk re-pays the full jit
compile (~4-5 min for the fused PPO iteration, ~2.5 min for anymal's
Newton pipeline) — ~25% of each chunk's wall clock.  JAX's disk cache
serializes the compiled executable and is verified to work across
processes on the axon TPU backend (round-5 measurement: 1.5 s cold ->
0.26 s warm for a toy program; the PPO program compiles once per code
revision instead of once per chunk).

Opt out with NIGHTMARE_COMPILE_CACHE=0; relocate with
JAX_COMPILATION_CACHE_DIR (honored if already set).
"""

from __future__ import annotations

import os


def enable_persistent_compile_cache(path: str | None = None) -> None:
    if os.environ.get("NIGHTMARE_COMPILE_CACHE") == "0":
        return
    import jax

    cache_dir = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or "/tmp/nightmare_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # cache everything including backend-config-sensitive programs;
        # the key hashes the serialized HLO + compile options + backend
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - config names move across jax versions
        print(f"persistent compile cache unavailable: {e}")
