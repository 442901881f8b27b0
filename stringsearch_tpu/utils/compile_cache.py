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


def enable_persistent_cache(for_cpu: bool = False,
                            min_secs: float = 1.0,
                            cache_dir: str | None = None) -> None:
    """Turn on jax's persistent compilation cache (idempotent).

    Off for CPU-backend runs unless `for_cpu`: XLA:CPU AOT results
    loaded cross-process can carry machine-feature mismatches (observed
    "+prefer-no-gather not supported on the host machine ... could lead
    to SIGILL" warnings) — a concern only when the cache directory is
    shared across heterogeneous machines, which /tmp is not. The fuzz
    runner opts in with for_cpu=True + a low min_secs: long campaigns
    must `jax.clear_caches()` periodically (compiled CPU executables
    exhaust the process mmap budget, ~100 maps each against the 65530
    vm.max_map_count default), and the persistent cache turns the
    post-clear recompile storm into disk loads."""
    if os.environ.get("STRINGSEARCH_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    try:
        if not for_cpu and jax.default_backend() == "cpu":
            return
        d = cache_dir or _DEFAULT_DIR
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_secs)
    except Exception:  # cache is an optimization, never a failure
        pass
