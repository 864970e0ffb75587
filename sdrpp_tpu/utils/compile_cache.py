"""Persistent JAX compilation cache for warm process starts.

The reference rebuilds a demod chain in microseconds because its "build"
is object wiring (decoder_modules/radio/src/radio_module.h:322-336 logs
the set-mode latency); our structural equivalent is jit re-trace, which
within one process is cached by JAX but across processes used to pay the
full XLA compile every time — `cli decode meteor` on a 13.3 s capture
measured 59.5 s wall, compile-dominated (PERFORMANCE.md r3). Enabling
``jax_compilation_cache_dir`` persists compiled executables keyed by HLO
+ compile options, so a second process with the same chain config loads
the binary instead of recompiling.

Guards for the axon tunnel (PERFORMANCE.md):
- ``jax_raise_persistent_cache_errors`` stays False — a corrupt/readonly
  cache degrades to a cold compile, never a crash;
- entries below 1 s of compile time are not persisted (the tunnel adds
  5-30 ms launch latency per executable; caching trivia just inflates
  the directory);
- the cache directory is keyed per JAX version by JAX itself (the
  backend build hash is part of the key), so tunnel/backend upgrades
  invalidate cleanly.
"""

from __future__ import annotations

import os
from pathlib import Path

__all__ = ["enable_persistent_cache", "default_cache_dir"]

_enabled: str | None = None


def default_cache_dir() -> Path:
    env = os.environ.get("SDRPP_TPU_CACHE_DIR")
    if env:
        return Path(env)
    xdg = os.environ.get("XDG_CACHE_HOME")
    base = Path(xdg) if xdg else Path.home() / ".cache"
    return base / "sdrpp_tpu" / "jax"


def enable_persistent_cache(cache_dir: str | os.PathLike | None = None,
                            min_compile_secs: float = 1.0) -> str | None:
    """Turn on the persistent compilation cache; returns the directory,
    or None if disabled (SDRPP_TPU_NO_CACHE=1) or setup failed (the run
    proceeds uncached — never fatal)."""
    global _enabled
    if os.environ.get("SDRPP_TPU_NO_CACHE"):
        return None
    if _enabled is not None:
        return _enabled
    env_min = os.environ.get("SDRPP_TPU_CACHE_MIN_SECS")
    if env_min is not None:  # CPU-backend tests persist fast compiles
        try:
            min_compile_secs = float(env_min)
        except ValueError:  # malformed env must not make setup fatal
            pass
    try:
        import jax

        path = Path(cache_dir) if cache_dir else default_cache_dir()
        path.mkdir(parents=True, exist_ok=True)
        # Cache-key determinism: Pallas/Mosaic kernel bodies are opaque
        # custom-call payloads, so the Python TRACEBACK locations they
        # embed leak into the compilation-cache key — the same graph
        # built from a different call site (cli preheat vs the UI
        # engine vs its builder thread) would silently MISS. Dropping
        # tracebacks from MLIR locations (innermost frame only) makes
        # lowering byte-identical across call sites and processes;
        # measured: the full WFM UI step's lowered text becomes
        # identical across constructions, offsets, and entry points.
        jax.config.update("jax_include_full_tracebacks_in_locations",
                          False)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        jax.config.update("jax_raise_persistent_cache_errors", False)
        # long-lived services churn configs: cap the cache (LRU) so the
        # directory cannot grow without bound
        jax.config.update("jax_compilation_cache_max_size", 4 * 2 ** 30)
        _enabled = str(path)
        return _enabled
    except Exception:
        return None
