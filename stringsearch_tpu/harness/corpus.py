"""Adversarial / regression corpus generator.

Capability parity with the reference's committed fuzz corpus
(ref: crates/divsufsort/src/testdata/ — 3 fuzz seeds + 8 minimized
crash-* inputs, replayed by unit tests at crates/divsufsort/src/lib.rs:31-92).
We don't copy those byte files; we regenerate the *patterns* that break
SACAs — long runs, short-period repeats, near-repeats, all-equal, sparse
alphabets, high-entropy bytes, and multi-byte UTF-8 (the reference's
`shruggy` case, lib.rs:84-86) — deterministically from fixed seeds, so the
same conformance corpus is reproducible everywhere.
"""

from __future__ import annotations

import numpy as np


def shruggy() -> bytes:
    """UTF-8 multi-byte regression case (ref: divsufsort/src/lib.rs:84-86)."""
    return "¯\\_(ツ)_/¯".encode("utf-8")


def regression_corpus() -> dict[str, bytes]:
    """Small adversarial inputs replayed by the unit tests."""
    rng = np.random.default_rng(0xD1F5)
    c: dict[str, bytes] = {}
    c["empty"] = b""
    c["one"] = b"\x00"
    c["two-eq"] = b"aa"
    c["shruggy"] = shruggy()
    c["all-zero-64"] = bytes(64)
    c["all-ff-257"] = b"\xff" * 257
    c["run-then-step"] = b"a" * 100 + b"b" + b"a" * 100
    c["period2"] = b"ab" * 300
    c["period3"] = b"abc" * 200
    c["near-repeat"] = (b"abcabcabd" * 64)[:500]
    c["fibonacci"] = _fibonacci_string(13)
    c["descending"] = bytes(range(255, -1, -1))
    c["ascending"] = bytes(range(256))
    c["sparse-alpha"] = bytes(rng.integers(0, 2, 800, dtype=np.uint8))
    c["quad-alpha"] = bytes(rng.integers(0, 4, 1200, dtype=np.uint8))
    c["random-17"] = bytes(rng.integers(0, 256, 17, dtype=np.uint8))
    c["random-4k"] = bytes(rng.integers(0, 256, 4096, dtype=np.uint8))
    c["zeros-with-noise"] = _zeros_with_noise(rng, 1000, 10)
    c["blocky"] = b"".join(bytes([b]) * 37 for b in rng.integers(0, 256, 30, dtype=np.uint8))
    c["high-then-low"] = b"\xfe\xff" * 200 + b"\x00\x01" * 200
    return c


def _fibonacci_string(k: int) -> bytes:
    a, b = b"a", b"ab"
    for _ in range(k):
        a, b = b, b + a
    return b


def _zeros_with_noise(rng, n: int, flips: int) -> bytes:
    arr = np.zeros(n, dtype=np.uint8)
    idx = rng.integers(0, n, flips)
    arr[idx] = rng.integers(1, 256, flips, dtype=np.uint8)
    return bytes(arr)


def enwik_like(n: int, seed: int = 7) -> bytes:
    """English-ish Markov text: repetitive, skewed byte histogram — the
    compressible text class the GB/s targets are defined on (enwik8/9)."""
    rng = np.random.default_rng(seed)
    words = [
        b"the", b"of", b"and", b"in", b"to", b"a", b"is", b"was", b"for",
        b"wikipedia", b"article", b"category", b"http", b"reference",
        b"[[", b"]]", b"{{", b"}}", b"==", b"link", b"page", b"&quot;",
    ]
    out = bytearray()
    while len(out) < n:
        w = words[int(rng.integers(0, len(words)))]
        out += w
        out += b" " if rng.random() > 0.1 else b"\n"
    return bytes(out[:n])


def random_bytes(n: int, alphabet: int = 256, seed: int = 1) -> bytes:
    rng = np.random.default_rng(seed)
    return bytes(rng.integers(0, alphabet, n, dtype=np.uint8))
