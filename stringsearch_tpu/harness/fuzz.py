"""Continuous differential fuzzing — cargo-fuzz/libFuzzer equivalent.

Capability parity: the reference fuzzes `sort(arbitrary bytes)` with
libFuzzer and commits minimized crashers back into the regression corpus
(ref: crates/divsufsort/fuzz/fuzz_targets/fuzz_target_1.rs:4-6; corpus at
crates/divsufsort/src/testdata/, crash-<hash> naming).

Here each iteration generates adversarial bytes (mutation strategies biased
toward SACA-breaking patterns: runs, repeats, low alphabets, splices),
sorts with the TPU engine(s), verifies on-device, and crosschecks
byte-exact against the C++ oracle. Failures are shrunk by greedy bisection
and written to fuzz-crashes/crash-<sha1>, matching the reference's naming
convention.

Run: python -m stringsearch_tpu.harness.fuzz --iters 200 --device cpu
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

import numpy as np


def _mutate(rng: np.random.Generator, max_len: int) -> bytes:
    n = int(rng.integers(1, max_len))
    strategy = int(rng.integers(0, 6))
    if strategy == 0:  # uniform random
        return bytes(rng.integers(0, 256, n, dtype=np.uint8))
    if strategy == 1:  # tiny alphabet
        a = int(rng.choice([1, 2, 3, 4]))
        return bytes(rng.integers(0, a, n, dtype=np.uint8))
    if strategy == 2:  # periodic repeats
        p = int(rng.integers(1, 9))
        unit = bytes(rng.integers(0, 256, p, dtype=np.uint8))
        return (unit * (n // p + 1))[:n]
    if strategy == 3:  # long runs with rare breaks
        arr = np.full(n, int(rng.integers(0, 256)), dtype=np.uint8)
        for _ in range(int(rng.integers(0, 4))):
            arr[int(rng.integers(0, n))] = int(rng.integers(0, 256))
        return bytes(arr)
    if strategy == 4:  # splice of two periodic regions
        a = _mutate(rng, max(n // 2, 2))
        b = _mutate(rng, max(n // 2, 2))
        return (a + b)[:n]
    # near-sorted bytes
    arr = np.sort(rng.integers(0, 256, n, dtype=np.uint8))
    idx = rng.integers(0, n, max(1, n // 10))
    arr[idx] = rng.integers(0, 256, len(idx), dtype=np.uint8)
    return bytes(arr)


def _check(data: bytes, engines) -> str | None:
    """Returns an error string or None."""
    from stringsearch_tpu import oracle
    from stringsearch_tpu.core.types import NotSorted
    from stringsearch_tpu.engines import get_engine

    want = oracle.build(data)
    if oracle.sufcheck(data, want) != 0:
        return "oracle output failed sufcheck"
    for name in engines:
        sa = get_engine(name)(data)
        try:
            sa.verify()
        except NotSorted as e:
            return f"{name}: verify failed: {e}"
        if not np.array_equal(np.asarray(sa.sa), want):
            return f"{name}: mismatch vs oracle"
    return None


def _shrink(data: bytes, engines) -> bytes:
    """Greedy bisection shrink of a failing input."""
    changed = True
    while changed and len(data) > 1:
        changed = False
        for cut in (len(data) // 2, len(data) // 4, 1):
            if cut == 0:
                continue
            for cand in (data[cut:], data[:-cut]):
                if cand and _check(cand, engines) is not None:
                    data = cand
                    changed = True
                    break
            if changed:
                break
    return data


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="stringsearch-tpu-fuzz")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--max-len", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--engines", default="doubling")
    ap.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--out", default="fuzz-crashes")
    args = ap.parse_args(argv)

    if args.device == "cpu":
        import jax

        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    seed = args.seed if args.seed is not None else int(time.time())
    rng = np.random.default_rng(seed)
    engines = args.engines.split(",")
    print(f"fuzzing engines={engines} seed={seed} iters={args.iters}")

    failures = 0
    for i in range(args.iters):
        data = _mutate(rng, args.max_len)
        err = _check(data, engines)
        if err is not None:
            failures += 1
            shrunk = _shrink(data, engines)
            digest = hashlib.sha1(shrunk).hexdigest()
            os.makedirs(args.out, exist_ok=True)
            path = os.path.join(args.out, f"crash-{digest}")
            with open(path, "wb") as f:
                f.write(shrunk)
            print(f"[{i}] FAILURE: {err} -> shrunk to {len(shrunk)}B at {path}")
        if (i + 1) % 25 == 0:
            print(f"[{i + 1}/{args.iters}] ok so far, {failures} failures")
    print(f"done: {args.iters} iterations, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
