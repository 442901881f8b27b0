"""Headline benchmark: SA-construction throughput (bytes/s) on one chip.

Prints ONE JSON line:
  {"metric": "sa_build_bytes_per_s", "value": N, "unit": "B/s",
   "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star target of
1 GB/s/chip on enwik-class input (the reference publishes no numbers of
its own — see BASELINE.md).

Metric definition matches the reference harness: bytes/s =
input_len / wall_time_of_one_sort (ref: crates/divsuftest/src/main.rs:179).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

TARGET_BYTES_PER_S = 1e9  # BASELINE.json north star: >= 1 GB/s/chip


def main() -> None:
    size = int(os.environ.get("BENCH_SIZE", 1 << 24))  # 16 MiB default
    reps = int(os.environ.get("BENCH_REPS", 3))

    import jax
    import jax.numpy as jnp

    from stringsearch_tpu.engines.doubling import build_adaptive
    from stringsearch_tpu.harness.corpus import enwik_like

    text_host = np.frombuffer(enwik_like(size), dtype=np.uint8)
    text = jnp.asarray(text_host)

    def sync(x) -> float:
        # block_until_ready is a no-op through the axon tunnel; force
        # execution with a scalar reduction fetched to host (4-byte pull)
        return float(np.asarray(jnp.max(x)))

    # warmup / compile (the adaptive build's shape schedule is input-
    # deterministic, so one warmup run compiles every kernel the timed
    # reps will use)
    sa, isa = build_adaptive(text)
    sync(sa)

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sa, isa = build_adaptive(text)
        sync(sa)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    bps = size / dt

    # correctness gate: the benched output must verify
    from stringsearch_tpu.core.verify import is_valid

    ok = bool(is_valid(text, sa))
    if not ok:
        print(json.dumps({"metric": "sa_build_bytes_per_s", "value": 0.0,
                          "unit": "B/s", "vs_baseline": 0.0,
                          "error": "verification failed"}))
        sys.exit(1)

    print(json.dumps({
        "metric": "sa_build_bytes_per_s",
        "value": round(bps, 1),
        "unit": "B/s",
        "vs_baseline": round(bps / TARGET_BYTES_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
