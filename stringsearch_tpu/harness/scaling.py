"""Scaling-efficiency harness — sharded build throughput vs shard count.

BASELINE.json's north star includes ">= 80% scaling efficiency at 2+
hosts". The reference has no distributed story to compare against (rayon
threads only, ref: crates/sacapart/src/lib.rs:45-51); this harness defines
the measurement for the TPU build: partitioned SA construction sharded
over the mesh's "parts" axis (parallel/mesh.py), timed at 1, 2, 4, ... P
shards with throughput in B/s and efficiency = (bps_k / bps_1) / k.

Run on however many devices the backend exposes:
  python -m stringsearch_tpu.harness.scaling 4m            # real TPU devices
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python -m stringsearch_tpu.harness.scaling 1m        # virtual 8-dev mesh
On a multi-host slice, initialize `jax.distributed` first; the same
shard_map code rides ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from stringsearch_tpu.utils.sizes import format_throughput, parse_size


def measure(
    size: int, reps: int = 3, backend: str | None = None
) -> list[tuple[int, float, float]]:
    import jax
    import jax.numpy as jnp

    from stringsearch_tpu.harness.corpus import enwik_like
    from stringsearch_tpu.parallel.mesh import build_sharded, make_mesh

    devs = jax.devices(backend) if backend else jax.devices()
    text = enwik_like(size)

    def sync(x):
        np.asarray(jnp.max(x))

    rows = []
    k = 1
    while k <= len(devs):
        mesh = make_mesh(k, batch_axis=1, devices=devs)
        chunks, sas, _lens = build_sharded(text, mesh)  # warmup/compile
        sync(sas)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            chunks, sas, _lens = build_sharded(text, mesh)
            sync(sas)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        rows.append((k, dt, size / dt))
        k *= 2
    return rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="stringsearch-tpu-scaling")
    ap.add_argument("size", nargs="?", default="4m", help="input size (k/m/g)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args(argv)

    if args.device == "cpu":
        import jax

        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    size = parse_size(args.size)
    rows = measure(size, args.reps, backend=args.device)
    base = rows[0][2]
    print(f"{'Shards':>6}  {'Time':>9}  {'Throughput':>14}  {'Efficiency':>10}")
    for k, dt, bps in rows:
        eff = bps / (base * k)
        print(f"{k:>6}  {dt:>8.3f}s  {format_throughput(bps):>14}  {eff:>9.1%}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
