"""Prefix-doubling SACA — the flagship TPU engine.

Capability parity: exact suffix-array construction for u8 text, the role
played by divsufsort in the reference (ref: crates/divsufsort/src/lib.rs:20-29
`sort_in_place` / `sort`). The *algorithm* is deliberately different — the
reference's trsort already contains a rank-doubling loop over B* suffixes
(ref: crates/divsufsort/src/trsort.rs:1347-1411 doubling via
`ISAd += ISAd - ISA`); here that idea is generalized to the whole text and
re-expressed with data-parallel primitives only:

  1. initial ranks from a 3-byte packed radix key (one sort) — the analog of
     divsufsort's 2-char bucket radix placement
     (ref: crates/divsufsort/src/divsufsort.rs:127-161);
  2. doubling rounds: sort positions by (rank[i], rank[i+h]) pairs, assign
     new dense ranks with a vectorized neighbor-diff + prefix-sum —
     O(log n) rounds of XLA sort;
  3. stop when all ranks are unique (lax.while_loop with an on-device
     uniqueness flag — no host round-trip per round).

Everything is int32 (n < 2^31, matching the reference's Idx=i32,
ref: crates/divsufsort/src/common.rs:4). All shapes static under jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from stringsearch_tpu.core.types import SuffixArray, as_text_array

_I32 = jnp.int32


def _pack3(t: jnp.ndarray, off: int) -> jnp.ndarray:
    """Three biased bytes starting at `off` packed into 27 bits."""
    n = t.shape[0] - 6  # t is the text padded with 6 zero sentinels
    return (
        (jax.lax.dynamic_slice_in_dim(t, off, n) << 18)
        | (jax.lax.dynamic_slice_in_dim(t, off + 1, n) << 9)
        | jax.lax.dynamic_slice_in_dim(t, off + 2, n)
    )


def _scatter_to_text_order(sa, rank_s):
    """rank[sa] = rank_s as a 1-key sort — cheaper than an XLA scatter.

    `sa` is a permutation of 0..n-1, so sorting (sa, rank_s) by sa places
    rank_s[j] at text position sa[j]; measured on TPU this beats the
    random-access scatter (`.at[sa].set`) by ~2x at n=2^24.
    """
    _, rank = jax.lax.sort((sa, rank_s), num_keys=1)
    return rank


def _initial_rank(text: jnp.ndarray):
    """Dense ranks by the first 6 bytes (two 27-bit keys, one 2-key sort).

    Bytes are biased +1 so past-the-end (0) sorts below any real byte —
    the analog of divsufsort's 2-char bucket radix placement
    (ref: crates/divsufsort/src/divsufsort.rs:127-161), widened to 6 bytes
    so the doubling loop starts at h=6.
    """
    n = text.shape[0]
    t = jnp.concatenate([text.astype(_I32) + 1, jnp.zeros((6,), _I32)])
    key1 = _pack3(t, 0)
    key2 = _pack3(t, 3)
    iota = jnp.arange(n, dtype=_I32)
    k1s, k2s, sa = jax.lax.sort((key1, key2, iota), num_keys=2)
    diff = (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])
    new_flag = jnp.concatenate([jnp.ones((1,), _I32), diff.astype(_I32)])
    rank_s = jnp.cumsum(new_flag) - 1
    rank = _scatter_to_text_order(sa, rank_s)
    done = rank_s[-1] == n - 1
    return rank, sa, done


def _shift_ranks(rank, h):
    """rank_h[i] = rank[i+h] with -1 past the end — a shift, not a gather.

    h is traced; the concat+dynamic-slice form keeps it a contiguous copy
    (the `jnp.take(rank, iota+h)` form costs a full random-gather pass on
    TPU, ~2x the price of the sort itself at n=2^24).
    """
    n = rank.shape[0]
    ext = jnp.concatenate([rank, jnp.full((n,), -1, _I32)])
    return jax.lax.dynamic_slice_in_dim(ext, h, n)


def _doubling_round(text_len: int, rank, h):
    """One doubling round: returns (new_rank, sa, done)."""
    n = text_len
    iota = jnp.arange(n, dtype=_I32)
    rank_h = _shift_ranks(rank, h)
    r1s, r2s, sa = jax.lax.sort((rank, rank_h, iota), num_keys=2)
    diff = (r1s[1:] != r1s[:-1]) | (r2s[1:] != r2s[:-1])
    new_flag = jnp.concatenate([jnp.ones((1,), _I32), diff.astype(_I32)])
    rank_s = jnp.cumsum(new_flag) - 1
    new_rank = _scatter_to_text_order(sa, rank_s)
    done = rank_s[-1] == n - 1
    return new_rank, sa, done


@jax.jit
def build_with_isa(text: jnp.ndarray):
    """Jittable SA construction. Returns (sa, isa) both int32 [n].

    `isa` (inverse suffix array / final ranks) comes for free from the
    doubling state and feeds verification and LCP construction.
    """
    n = text.shape[0]
    rank0, sa0, done0 = _initial_rank(text)

    def cond(state):
        _rank, _sa, h, done = state
        return (~done) & (h < n)

    def body(state):
        rank, _sa, h, _done = state
        new_rank, sa, done = _doubling_round(n, rank, h)
        return new_rank, sa, h * 2, done

    rank, sa, _h, _done = jax.lax.while_loop(
        cond, body, (rank0, sa0, jnp.int32(3), done0)
    )
    return sa, rank


@jax.jit
def _initial_rank_jit(text):
    return _initial_rank(text)


@jax.jit
def _round_jit(rank, h):
    return _doubling_round(rank.shape[0], rank, h)


def sort_traced(text, tracer) -> "SuffixArray":
    """Traced build: host-stepped doubling rounds with per-phase dumps.

    The tracing analog of the reference's crosscheck-feature build
    (ref: crates/divsufsort/src/crosscheck.rs; trace calls threaded through
    phases, e.g. divsufsort.rs:177,190). The fast path (`sort`) carries no
    tracing code at all — tracing selects this separate execution path.
    """
    arr = as_text_array(text)
    n = int(arr.shape[0])
    tracer.log(f"doubling engine n={n}")
    if n < 3:
        sa = sort(arr)
        tracer.dump("SA final", sa.sa)
        tracer.flush()
        return sa
    rank, sa, done = _initial_rank_jit(arr)
    tracer.dump("rank h=3 (3-byte radix)", rank)
    tracer.dump("SA h=3", sa)
    h = 3
    while not bool(done) and h < n:
        rank, sa, done = _round_jit(rank, jnp.int32(h))
        h *= 2
        tracer.log(f"round -> h={h} done={bool(done)}")
        tracer.dump(f"rank h={h}", rank)
        tracer.dump(f"SA h={h}", sa)
    tracer.dump("SA final", sa)
    tracer.flush()
    return SuffixArray(arr, sa)


def sort_in_place(text, sa_out: np.ndarray) -> None:
    """Fill a caller-provided int32 buffer (ref API shape:
    crates/divsufsort/src/lib.rs:20-22)."""
    sa, _ = build_with_isa(as_text_array(text))
    np.copyto(sa_out, np.asarray(sa))


def sort(text) -> SuffixArray:
    """Build the suffix array of `text` on the default JAX device.

    Ref API: crates/divsufsort/src/lib.rs:25-29 `sort(text) -> SuffixArray`.
    Short inputs (n < 3) take host fast paths like the reference's n ∈
    {0,1,2} cases (ref: crates/divsufsort/src/divsufsort.rs:18-29).
    """
    arr = as_text_array(text)
    n = int(arr.shape[0])
    if n >= (1 << 31):
        raise ValueError("text length must be < 2^31 for the i32 index path")
    if n == 0:
        return SuffixArray(arr, np.zeros((0,), np.int32))
    if n == 1:
        return SuffixArray(arr, np.zeros((1,), np.int32))
    if n == 2:
        host = np.asarray(arr)
        # equal first bytes → the shorter suffix (position 1) sorts first
        sa = [0, 1] if host[0] < host[1] else [1, 0]
        return SuffixArray(arr, np.asarray(sa, np.int32))
    sa, _isa = build_with_isa(arr)
    return SuffixArray(arr, sa)
