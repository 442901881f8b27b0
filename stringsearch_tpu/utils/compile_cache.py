"""Persistent XLA compilation cache for the harness entry points.

Remote-TPU compiles through the axon tunnel cost tens of seconds to
minutes per shape (a 256 MB build graph is several minutes); a
persistent on-disk cache makes every re-run of bench/cli/microbench
reuse previously compiled executables across processes. Opt out with
STRINGSEARCH_TPU_NO_COMPILE_CACHE=1 (e.g. when measuring compile time
itself).

The reference has no analog (rustc compiles once, ahead of time); this
is TPU-environment plumbing, kept out of library import paths so plain
`import stringsearch_tpu` never mutates global jax config.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "STRINGSEARCH_TPU_COMPILE_CACHE", "/tmp/stringsearch_tpu_jax_cache"
)


def enable_persistent_cache(for_cpu: bool = False) -> None:
    """Turn on jax's persistent compilation cache (idempotent).

    Off for CPU-backend runs unless `for_cpu`: XLA:CPU AOT results
    loaded cross-process can carry machine-feature mismatches (observed
    "+prefer-no-gather not supported on the host machine ... could lead
    to SIGILL" warnings), and CPU compiles are cheap anyway — the cache
    pays off on the remote-TPU path, where compiles cost minutes."""
    if os.environ.get("STRINGSEARCH_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    try:
        if not for_cpu and jax.default_backend() == "cpu":
            return
        os.makedirs(_DEFAULT_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _DEFAULT_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a failure
        pass
