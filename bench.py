"""Headline benchmark: SA-construction throughput (bytes/s) on one chip.

Prints ONE JSON line:
  {"metric": "sa_build_bytes_per_s", "value": N, "unit": "B/s",
   "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star target of
1 GB/s/chip on 256 MB enwik-class input (the reference publishes no
numbers of its own — see BASELINE.md). The default size IS the size the
target is defined on (256 MB); override with BENCH_SIZE for smaller
scans. Per-engine detail (doubling at several sizes + dc3) goes to
BENCH_DETAIL.json and stderr so the headline line stays parseable.

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


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _bench_build(build, text, reps: int) -> float:
    """Min wall time of one build, reference formula main.rs:179."""
    import jax.numpy as jnp

    def sync(x) -> float:
        # block_until_ready is a no-op through the axon tunnel; force
        # execution with a scalar reduction fetched to host (4-byte pull)
        return float(np.asarray(jnp.max(x)))

    sa = build(text)
    sync(sa)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sa = build(text)
        sync(sa)
        times.append(time.perf_counter() - t0)
    return min(times), sa


def main() -> None:
    size = int(os.environ.get("BENCH_SIZE", 1 << 28))  # 256 MB: the
    # size the >=1 GB/s/chip target is defined on (BASELINE.md)
    reps = int(os.environ.get("BENCH_REPS", 3))

    from stringsearch_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # re-runs skip the multi-minute 2^28 compile

    import jax.numpy as jnp

    from stringsearch_tpu.engines.doubling import _auto_depth, build_sa
    from stringsearch_tpu.harness.corpus import enwik_like

    detail: dict = {"sizes": {}}

    # cache keyed by size + a digest of the first/last 64 KB (validated on
    # load so a stale or foreign file can't silently become the input),
    # written atomically via temp file + os.replace
    import hashlib

    def _digest(arr: np.ndarray) -> str:
        h = hashlib.sha256()
        h.update(arr[: 1 << 16].tobytes())
        h.update(arr[-(1 << 16):].tobytes())
        return h.hexdigest()[:16]

    cache = f"/tmp/stringsearch_bench_enwik_{size}.bin"
    meta = cache + ".sha"
    text_host = None
    if os.path.exists(cache) and os.path.getsize(cache) == size \
            and os.path.exists(meta):
        cand = np.fromfile(cache, dtype=np.uint8)
        with open(meta) as f:
            want = f.read().strip()
        if _digest(cand) == want:
            _log(f"loading {size} bytes of enwik-like text from {cache} ...")
            text_host = cand
    if text_host is None:
        _log(f"generating {size} bytes of enwik-like text ...")
        text_host = np.frombuffer(enwik_like(size), dtype=np.uint8)
        try:
            tmp = cache + f".tmp{os.getpid()}"
            text_host.tofile(tmp)
            os.replace(tmp, cache)
            with open(meta + f".tmp{os.getpid()}", "w") as f:
                f.write(_digest(text_host))
            os.replace(meta + f".tmp{os.getpid()}", meta)
        except OSError:
            pass

    def doubling_build(t):
        # the headline path: no ISA, so a build that resolves in the
        # full-round loop skips the final inverse-permutation sort
        return build_sa(t, depth=_auto_depth(int(t.shape[0])))

    # provenance stamp for every sizes entry written by THIS run, so
    # carried-over entries from older engine revisions are identifiable
    import subprocess

    try:
        rev = subprocess.run(
            ["git", "-C", os.path.dirname(__file__) or ".",
             "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:  # incl. SubprocessError/TimeoutExpired: stamp is
        rev = "unknown"  # best-effort, never the reason a bench dies
    stamp = {"rev": rev, "date": time.strftime("%Y-%m-%d")}

    # headline: doubling engine at the full size
    text = jnp.asarray(text_host)
    _log(f"doubling @ {size} B (depth {_auto_depth(size)}) ...")
    dt, sa = _bench_build(doubling_build, text, reps)
    bps = size / dt
    detail["sizes"][str(size)] = {"doubling_bytes_per_s": round(bps, 1),
                                  "wall_s": round(dt, 4), **stamp}
    _log(f"doubling: {dt:.3f}s -> {bps/1e6:.1f} MB/s")

    # correctness gate: the benched output must verify
    from stringsearch_tpu.core.verify import is_valid

    ok = bool(is_valid(text, sa))
    if not ok:
        print(json.dumps({"metric": "sa_build_bytes_per_s", "value": 0.0,
                          "unit": "B/s", "vs_baseline": 0.0,
                          "error": "verification failed"}))
        sys.exit(1)

    # detail: smaller-size scan, unless BENCH_FAST skips the extras
    if not os.environ.get("BENCH_FAST"):
        small = min(size, 1 << 24)
        if small != size:
            ts = jnp.asarray(text_host[:small])
            dts, _ = _bench_build(doubling_build, ts, reps)
            detail["sizes"][str(small)] = {
                "doubling_bytes_per_s": round(small / dts, 1),
                "wall_s": round(dts, 4), **stamp}
            _log(f"doubling @ {small}: {dts:.3f}s -> {small/dts/1e6:.1f} MB/s")
    # third-party-competitor column (the reference bench races saca-k,
    # ref: crates/divsuftest/src/main.rs:162-164): the host C++ SA-IS
    # oracle at <= 16 MB, and the oracle-vs-flagship speed ratio
    if not os.environ.get("BENCH_FAST"):
        try:
            from stringsearch_tpu import oracle

            osz = min(size, 1 << 24)
            ohost = text_host[:osz].tobytes()
            oracle.build(ohost[:4096])  # warm the .so load
            t0 = time.perf_counter()
            oracle.build(ohost)
            dto = time.perf_counter() - t0
            tpu_bps = detail["sizes"].get(str(osz), {}).get(
                "doubling_bytes_per_s", bps)
            detail["oracle_vs_flagship"] = {
                "size": osz,
                "oracle_bytes_per_s": round(osz / dto, 1),
                "oracle_wall_s": round(dto, 4),
                "flagship_bytes_per_s": tpu_bps,
                "flagship_speedup": round(tpu_bps / (osz / dto), 3),
                "note": ("host C++ SA-IS (single core) vs the TPU "
                         "doubling engine at the same bytes — the "
                         "repo's analog of the reference racing "
                         "saca-k"), **stamp}
            _log(f"oracle @ {osz}: {dto:.3f}s -> {osz/dto/1e6:.1f} MB/s "
                 f"(flagship x{tpu_bps / (osz / dto):.2f})")
        except Exception as e:
            detail["oracle_vs_flagship"] = {"error": repr(e)[:200]}
            _log(f"oracle bench failed: {e!r}")

    # the dc3 second engine: opt-in via BENCH_DC3 — its host-driven
    # recursion compiles one program per level and the remote-compile
    # tunnel takes minutes per shape, which would risk the driver's
    # bench window (measured numbers live in BENCH_DETAIL.json / README)
    if os.environ.get("BENCH_DC3"):
        try:
            from stringsearch_tpu.engines import dc3

            dsz = min(size, int(os.environ.get("BENCH_DC3_SIZE", 1 << 22)))
            td = text_host[:dsz]
            dtd, _ = _bench_build(lambda t: jnp.asarray(dc3.sort(t).sa),
                                  td, reps)
            detail["dc3"] = {"size": dsz,
                             "bytes_per_s": round(dsz / dtd, 1),
                             "wall_s": round(dtd, 4)}
            _log(f"dc3 @ {dsz}: {dtd:.3f}s -> {dsz/dtd/1e6:.1f} MB/s")
        except Exception as e:  # keep the headline alive
            detail["dc3"] = {"error": repr(e)[:200]}
            _log(f"dc3 bench failed: {e!r}")

    # carry over hand-recorded metric runs (queries/scaling/dc3 — the
    # BASELINE metrics measured outside this script's headline path)
    detail_path = os.path.join(os.path.dirname(__file__) or ".",
                               "BENCH_DETAIL.json")
    try:
        with open(detail_path) as f:
            prev = json.load(f)
        if "recorded_metrics" in prev:
            detail["recorded_metrics"] = prev["recorded_metrics"]
        # keep sizes measured by earlier runs that this run didn't touch,
        # but only when they carry a provenance stamp (rev/date) so a
        # stale unstamped number can't silently read as current
        dropped = []
        for k, v in prev.get("sizes", {}).items():
            if isinstance(v, dict) and "rev" in v:
                detail["sizes"].setdefault(k, v)
            elif k not in detail["sizes"]:
                dropped.append(k)
        if dropped:
            _log(f"dropping unstamped carried-over sizes entries "
                 f"(no rev provenance): {sorted(dropped)}")
    except (OSError, ValueError):
        pass
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)

    print(json.dumps({
        "metric": "sa_build_bytes_per_s",
        "value": round(bps, 1),
        "unit": "B/s",
        "vs_baseline": round(bps / TARGET_BYTES_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
