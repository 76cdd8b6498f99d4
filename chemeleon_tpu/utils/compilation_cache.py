"""Persistent XLA compilation cache (cross-process).

New-shape compiles of the 1000-step sampler scan take 20 s-10 min through
the TPU tunnel; the cache makes every repeat instantaneous across CLI runs,
server restarts, bench and tests. Keys hash the optimized HLO + compile
options, so stale hits are not a risk. Off by CHEMTPU_NO_CACHE=1."""

from __future__ import annotations

import os
from pathlib import Path


def enable_persistent_compilation_cache(
        cache_dir=None, min_compile_time_secs: float = 1.0) -> None:
    """Idempotent: respects an already-configured cache dir (tests/bench
    configure their own) and the CHEMTPU_NO_CACHE=1 escape hatch."""
    if os.environ.get("CHEMTPU_NO_CACHE") == "1":
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    if cache_dir is None:
        cache_dir = (Path(os.environ.get("XDG_CACHE_HOME",
                                         Path.home() / ".cache"))
                     / "chemeleon_tpu" / "jax_compilation")
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_time_secs)
    except (OSError, AttributeError):  # read-only FS / very old jax
        pass
