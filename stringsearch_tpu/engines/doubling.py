"""Prefix-doubling SACA with tied-group compaction — the flagship TPU engine.

Capability parity: exact suffix-array construction for u8 text, the role
played by divsufsort in the reference (ref: crates/divsufsort/src/lib.rs:20-29
`sort_in_place` / `sort`). The *algorithm* is deliberately different — the
reference's trsort already contains a rank-doubling loop over B* suffixes
(ref: crates/divsufsort/src/trsort.rs:1347-1411 doubling via
`ISAd += ISAd - ISA`); here that idea is generalized to the whole text and
re-expressed with data-parallel primitives only. The build is ONE jitted
program with no host round-trips:

  1. initial ranks from a 24-byte packed radix key (six raw-byte uint32
     keys, one multi-key sort) — the analog of divsufsort's 2-char bucket
     radix placement (ref: crates/divsufsort/src/divsufsort.rs:127-161),
     taken much deeper because on TPU one extra sort key costs ~1/6 of a
     full extra doubling round (measured on v5e);
  2. full-width doubling rounds — sort by (rank[i], rank[i+h]), assign
     head-slot ranks with a neighbor-diff + cumulative max — inside a
     lax.while_loop, until at most n/8 positions remain in tied groups;
  3. two-level compaction (Larsson–Sadakane re-expressed for TPU): tied
     group members move to a static n/8-capacity array, then to an
     n/128-capacity array once few enough; rounds sort only those,
     scattering rank/SA updates back into the full arrays — the analog
     of trsort's sorted-run skipping via negative ISA sentinels
     (ref: crates/divsufsort/src/trsort.rs:1363-1410).

Past-the-end positions take the marker rank -(i+1): negative (before
every real rank, so a suffix that has ended sorts before every suffix
that continues) and decreasing in i (so when two suffixes both end
within the comparison window, the shorter — larger i — sorts first).
This lets the initial keys pack four RAW bytes per uint32 word (zero
padding) instead of biasing each byte to 9 bits.

Ranks are "head-slot" ranks — the SA slot index of the group's first
element — so a compacted element's global SA slot is
`group_head_rank + offset_within_group`. Head-slot ranks are
order-isomorphic to dense ranks and equal the final ISA once all groups
are singletons.

Indexes default to int32 (n < 2^31, the reference's Idx=i32,
ref: crates/divsufsort/src/common.rs:4); pass idx=jnp.int64 (with jax
x64 enabled) for the 64-bit mode (ref: c-sources/divsufsort_private.h:63-84
BUILD_DIVSUFSORT64). All shapes are static under jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from stringsearch_tpu.core.types import SuffixArray, as_text_array

_I32 = jnp.int32


def _sent(idx) -> jnp.ndarray:
    return jnp.asarray(np.iinfo(np.dtype(idx)).max, idx)


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


def _shift_ranks(rank, h):
    """rank_h[i] = rank[i+h] with -1 past the end — a shift, not a gather.

    h is traced; the concat+dynamic-slice form keeps it a contiguous copy
    (the `jnp.take(rank, iota+h)` form costs a full random-gather pass on
    TPU, ~2x the price of the sort itself at n=2^24).
    """
    n = rank.shape[0]
    ext = jnp.concatenate([rank, jnp.full((n,), -1, rank.dtype)])
    return jax.lax.dynamic_slice_in_dim(ext, h, n)


def _heads_and_tied(new_flag_bool, j):
    """head[j] = slot index of j's group head; tied[j] = group size >= 2."""
    head = jax.lax.cummax(jnp.where(new_flag_bool, j, -1))
    nxt_head = jnp.concatenate([head[1:], jnp.full((1,), -1, head.dtype)])
    tied = (head != j) | (nxt_head == head)
    return head, tied


def _initial_full(text, idx=_I32):
    """6-byte initial sort. Returns (rank, sa_s, rank_s, count_tied)."""
    n = text.shape[0]
    t = jnp.concatenate([text.astype(_I32) + 1, jnp.zeros((6,), _I32)])
    key1 = _pack3(t, 0)
    key2 = _pack3(t, 3)
    j = jnp.arange(n, dtype=idx)
    k1s, k2s, sa_s = jax.lax.sort((key1, key2, j), num_keys=2)
    new_flag = jnp.concatenate(
        [jnp.ones((1,), bool), (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])]
    )
    rank_s, tied = _heads_and_tied(new_flag, j)
    rank = _scatter_to_text_order(sa_s, rank_s)
    return rank, sa_s, rank_s, jnp.sum(tied.astype(idx))


def _full_round(rank, h, idx=_I32):
    """One full-width round with head-slot ranks + tied count."""
    n = rank.shape[0]
    j = jnp.arange(n, dtype=idx)
    rank_h = _shift_ranks(rank, h)
    r1s, r2s, sa_s = jax.lax.sort((rank, rank_h, j), num_keys=2)
    new_flag = jnp.concatenate(
        [jnp.ones((1,), bool), (r1s[1:] != r1s[:-1]) | (r2s[1:] != r2s[:-1])]
    )
    rank_s, tied = _heads_and_tied(new_flag, j)
    rank = _scatter_to_text_order(sa_s, rank_s)
    return rank, sa_s, rank_s, jnp.sum(tied.astype(idx))


def _extract(rank_s, sa_s, m: int, idx=_I32):
    """Compact the members of all tied groups into capacity-m arrays.

    Returns (g [m], pos [m]): group-head ranks and text positions, sorted
    by g (groups contiguous). Pad slots carry g = sentinel, pos = n.
    """
    n = rank_s.shape[0]
    j = jnp.arange(n, dtype=idx)
    nxt_head = jnp.concatenate([rank_s[1:], jnp.full((1,), -1, idx)])
    tied = (rank_s != j) | (nxt_head == rank_s)
    key = jnp.where(tied, rank_s, _sent(idx))
    ks, pos = jax.lax.sort((key, sa_s), num_keys=1)
    g = ks[:m]
    pos = jnp.where(g == _sent(idx), n, pos[:m])
    return g, pos


def _compact_round(g, pos, rank, sa, h, idx=_I32):
    """One compacted round over the tied groups only.

    g/pos: [m] group-head ranks + positions (pads g=sentinel, pos=n);
    rank/sa: full [n] state updated by scatter. Returns
    (g', pos', rank', sa', count) with resolved entries blanked to pads.
    """
    n = rank.shape[0]
    m = g.shape[0]
    sent = _sent(idx)
    j = jnp.arange(m, dtype=idx)
    ph = pos + h
    key2 = jnp.where(ph < n, jnp.take(rank, jnp.clip(ph, 0, n - 1)), -1)
    g_s, k2_s, pos_s = jax.lax.sort((g, key2, pos), num_keys=3)
    group_f = jnp.concatenate([jnp.ones((1,), bool), g_s[1:] != g_s[:-1]])
    run_f = group_f | jnp.concatenate(
        [jnp.ones((1,), bool), k2_s[1:] != k2_s[:-1]]
    )
    ghead = jax.lax.cummax(jnp.where(group_f, j, -1))
    rhead = jax.lax.cummax(jnp.where(run_f, j, -1))
    valid = g_s != sent
    slot = jnp.where(valid, g_s + (j - ghead), n)
    new_g = jnp.where(valid, g_s + (rhead - ghead), sent)
    rank = rank.at[jnp.where(valid, pos_s, n)].set(new_g, mode="drop")
    sa = sa.at[slot].set(pos_s, mode="drop")
    nxt_rhead = jnp.concatenate([rhead[1:], jnp.full((1,), -1, idx)])
    tied = valid & ((rhead != j) | (nxt_rhead == rhead))
    count = jnp.sum(tied.astype(idx))
    g_next = jnp.where(tied, new_g, sent)
    pos_next = jnp.where(tied, pos_s, n)
    return g_next, pos_next, rank, sa, count


@partial(jax.jit, static_argnames=("idx",))
def build_with_isa(text: jnp.ndarray, idx=_I32):
    """Jittable fused SA construction. Returns (sa, isa) `idx`-typed [n].

    One device program: full doubling rounds in a while_loop until the
    tied count drops to n/4, one extraction into a static n/4-capacity
    buffer, then compacted rounds in a second while_loop until every
    group is a singleton. `isa` (the final head-slot ranks = inverse
    suffix array) comes for free and feeds verification and LCP work.
    """
    n = text.shape[0]
    n_i = jnp.asarray(n, idx)
    rank0, sa0, rank_s0, count0 = _initial_full(text, idx)
    threshold = n // 4
    h0 = jnp.minimum(jnp.asarray(6, idx), n_i)

    def cond1(st):
        _rank, _sa, _rank_s, h, count = st
        return (count > threshold) & (h < n_i)

    def body1(st):
        rank, _sa, _rank_s, h, _count = st
        rank, sa_s, rank_s, count = _full_round(rank, h, idx)
        return rank, sa_s, rank_s, jnp.minimum(h + h, n_i), count

    rank, sa, rank_s, h, count = jax.lax.while_loop(
        cond1, body1, (rank0, sa0, rank_s0, h0, count0)
    )

    m = max(n // 4, 1)
    g0, pos0 = _extract(rank_s, sa, m, idx)

    def cond2(st):
        _g, _pos, _rank, _sa, h, count = st
        return (count > 0) & (h < n_i)

    def body2(st):
        g, pos, rank, sa, h, _count = st
        g, pos, rank, sa, count = _compact_round(g, pos, rank, sa, h, idx)
        return g, pos, rank, sa, jnp.minimum(h + h, n_i), count

    _g, _pos, rank, sa, _h, _count = jax.lax.while_loop(
        cond2, body2, (g0, pos0, rank, sa, h, count)
    )
    return sa, rank


def build_adaptive(text: jnp.ndarray):
    """Back-compat alias: the fused build IS the adaptive build now."""
    return build_with_isa(text)


# ---------------------------------------------------------------------------
# traced build (separate, host-stepped path used by `crosscheck --trace`)
# ---------------------------------------------------------------------------


@jax.jit
def _initial_rank_jit(text):
    rank, sa_s, _rank_s, count = _initial_full(text)
    return rank, sa_s, count == 0


@jax.jit
def _round_jit(rank, h):
    rank, sa_s, _rank_s, count = _full_round(rank, h)
    return rank, sa_s, count == 0


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
    tracer.dump("rank h=6 (6-byte radix)", rank)
    tracer.dump("SA h=6", sa)
    h = 6
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
    np.copyto(sa_out, np.asarray(sort(text).sa))


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
