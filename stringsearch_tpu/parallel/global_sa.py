"""Exact global suffix array over a sharded text — multi-chip doubling.

This is the "stretch goal" capability beyond the reference: `sacapart`
(ref: crates/sacapart/src/lib.rs:26-98) only ever builds *independent*
per-partition SAs and accepts degraded cross-boundary matches. Here the
text lives sharded over the mesh's "parts" axis and the engine produces
the exact suffix array OF THE WHOLE TEXT, with every doubling round's
global sort running as a chunk-level bitonic merge-split over ICI
(parallel/distsort.py) — no device ever holds the full text.

Algorithm = the flagship prefix-doubling engine
(engines/doubling.py, itself the generalization of trsort's doubling loop,
ref: crates/divsufsort/src/trsort.rs:1363-1410), re-expressed shard-wise:

  per round (h static per compiled step, doubling each round):
    1. rank_h[i] = rank[i+h] — two static `ppermute` hops (the source
       global position i+h falls in at most two neighbor shards);
    2. global sort by (rank, rank_h, gidx) — sharded bitonic merge-split;
    3. new dense ranks: local neighbor-diff flags with the boundary value
       shifted in from the previous shard, local cumsum + exclusive
       all-gather offset = global cumsum;
    4. redistribute ranks to text order by globally sorting (gidx, rank) —
       sorting by the permutation index IS the inverse scatter, and it
       re-balances shards exactly (shard s ends up with positions
       [s*L, (s+1)*L)).

Zero-padding to P*L keeps all shapes static: pad bytes are encoded below
every real byte, so pad suffixes occupy exactly the first `pad` slots of
the sorted order and are dropped from the final SA (same order-preservation
argument as parallel/partitioned.py's padding note).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stringsearch_tpu.core.types import BytesLike, as_text_array
from stringsearch_tpu.parallel.distsort import (
    exclusive_shard_offset,
    sharded_sort,
    shift_in_from_prev,
)

_I32 = jnp.int32
_AXIS = "parts"


def _global_iota(chunk_len: int):
    me = jax.lax.axis_index(_AXIS)
    return me * chunk_len + jnp.arange(chunk_len, dtype=_I32)


def _dense_ranks_from_sorted(eq_prev: jnp.ndarray):
    """Global dense rank of each sorted element from `same as previous` flags.

    eq_prev: bool [L], True where the element's key equals its global
    predecessor's (shard-boundary handled by the caller).
    """
    new_flag = (~eq_prev).astype(_I32)
    local = jnp.cumsum(new_flag)
    offset = exclusive_shard_offset(local[-1], _AXIS)
    return local + offset - 1  # global 0-based dense ranks


def _initial_shard_ranks(chunk: jnp.ndarray):
    """Ranks by the first 3 bytes (+1 bias, 0 = past-end), shard-wise."""
    length = chunk.shape[0]
    t = chunk.astype(_I32) + 1
    # first two bytes of the NEXT shard (zeros past the last shard)
    p = jax.lax.axis_size(_AXIS)
    me = jax.lax.axis_index(_AXIS)
    perm = [(i, (i - 1) % p) for i in range(p)]
    nxt = jax.lax.ppermute(t[:2], _AXIS, perm)
    nxt = jnp.where(me == p - 1, jnp.zeros_like(nxt), nxt)
    ext = jnp.concatenate([t, nxt])  # [L+2]
    key = (ext[:length] << 18) | (ext[1 : length + 1] << 9) | (ext[2 : length + 2])
    gidx = _global_iota(length)
    key_s, gidx_s = sharded_sort((key, gidx), _AXIS, num_keys=1)
    prev_key = shift_in_from_prev(key_s[-1:], _AXIS, -1)
    eq_prev = key_s == jnp.concatenate([prev_key, key_s[:-1]])
    rank_s = _dense_ranks_from_sorted(eq_prev)
    # back to text order
    _, rank = sharded_sort((gidx_s, rank_s), _AXIS, num_keys=1)
    n_pad = length * jax.lax.axis_size(_AXIS)
    done = jax.lax.pmax(jnp.max(rank_s), _AXIS) == n_pad - 1
    return rank, gidx_s, done


def _shifted_ranks(rank: jnp.ndarray, h: int, total_shards: int):
    """rank_h[i] = rank[global i + h], -1 past the end. h static."""
    length = rank.shape[0]
    p = total_shards
    me = jax.lax.axis_index(_AXIS)
    d, r = divmod(h, length)

    def from_offset(delta):
        if delta >= p:
            return jnp.full_like(rank, -1)
        perm = [(i, i - delta) for i in range(delta, p)]
        src = jax.lax.ppermute(rank, _AXIS, perm) if perm else rank
        return jnp.where(me + delta < p, src, -1)

    if r == 0:
        return from_offset(d)
    a = from_offset(d)      # provides positions [r, L) of the window
    b = from_offset(d + 1)  # provides positions [0, r)
    return jnp.concatenate([a[r:], b[:r]])


def _doubling_step(chunk_len: int, total_shards: int, h: int, rank):
    """One distributed doubling round (h static). Returns (rank, sa, done)."""
    rank_h = _shifted_ranks(rank, h, total_shards)
    gidx = _global_iota(chunk_len)
    r1s, r2s, sa_s = sharded_sort((rank, rank_h, gidx), _AXIS, num_keys=3)
    prev = shift_in_from_prev(
        jnp.stack([r1s[-1], r2s[-1]]), _AXIS, -2
    )
    eq_prev = (
        (r1s == jnp.concatenate([prev[:1], r1s[:-1]]))
        & (r2s == jnp.concatenate([prev[1:2], r2s[:-1]]))
    )
    rank_s = _dense_ranks_from_sorted(eq_prev)
    n_pad = chunk_len * total_shards
    done = jax.lax.pmax(jnp.max(rank_s), _AXIS) == n_pad - 1
    _, rank = sharded_sort((sa_s, rank_s), _AXIS, num_keys=1)
    return rank, sa_s, done


def _wrap(mesh: Mesh, fn, n_out: int):
    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=tuple(P(_AXIS) for _ in range(n_out)),
        out_specs=None,
        check_vma=False,
    )
    return sharded


class GlobalSuffixArray:
    """Exact suffix array of a mesh-sharded text (multi-chip, one index).

    Unlike `ShardedSuffixArray` (independent per-partition SAs with
    repair-at-query), this builds THE suffix array of the whole text; the
    result shards hold SA[s*L:(s+1)*L] of the global sorted order.
    """

    def __init__(self, text: BytesLike, mesh: Mesh):
        if _AXIS not in mesh.shape:
            raise ValueError(f'mesh must have a "{_AXIS}" axis')
        self.mesh = mesh
        arr = as_text_array(text)
        self.n = int(arr.shape[0])
        p = mesh.shape[_AXIS]
        self.num_shards = p
        # min chunk of 3 keeps the cross-shard 2-byte key window inside the
        # immediate next shard (tiny texts just carry extra zero padding)
        chunk = max(-(-max(self.n, p) // p), 3)
        self.chunk_len = chunk
        pad = chunk * p - self.n
        self.pad = pad
        if pad:
            arr = jnp.concatenate([arr, jnp.zeros((pad,), jnp.uint8)])
        sharding = NamedSharding(mesh, P(_AXIS))
        self.text_padded = jax.device_put(arr, sharding)
        self._build()

    def _build(self) -> None:
        mesh, chunk, p = self.mesh, self.chunk_len, self.num_shards
        n_pad = chunk * p

        init = jax.jit(
            jax.shard_map(
                _initial_shard_ranks,
                mesh=mesh,
                in_specs=P(_AXIS),
                out_specs=(P(_AXIS), P(_AXIS), P()),
                check_vma=False,
            )
        )
        rank, sa, done = init(self.text_padded)
        h = 3
        while not bool(done) and h < n_pad:
            step = jax.jit(
                jax.shard_map(
                    partial(_doubling_step, chunk, p, h),
                    mesh=mesh,
                    in_specs=P(_AXIS),
                    out_specs=(P(_AXIS), P(_AXIS), P()),
                    check_vma=False,
                )
            )
            rank, sa, done = step(rank)
            h *= 2
        self.rank = rank  # ISA over the padded text, text order, sharded
        self._sa_sharded = sa  # sorted order, sharded
        self._sa_host: Optional[np.ndarray] = None

    def suffix_array(self) -> np.ndarray:
        """The exact SA of the (unpadded) text as a host int32 [n]."""
        if self._sa_host is None:
            full = np.asarray(jax.device_get(self._sa_sharded))
            # pad suffixes sort strictly first; drop them
            self._sa_host = full[self.pad :].astype(np.int32)
        return self._sa_host

    def longest_substring_match_batch(self, needles):
        """Batched LCS query against the sharded global SA — distributed.

        Each shard binary-searches its contiguous slice of the global
        sorted order against the (replicated) text; the per-shard
        candidates reduce over ICI with an all-gather + argmax. No device
        ever materializes the whole SA. Same LCS-of-needle-prefix
        semantics as the single-device path
        (ref: crates/sacabase/src/lib.rs:39-99).
        """
        from stringsearch_tpu.core import compare as cmp
        from stringsearch_tpu.core.search import (
            _ceil_log2,
            _needle_batch_to_windows,
            lcs_kernel,
        )
        from stringsearch_tpu.core.types import LongestCommonSubstring

        if not needles:
            return []
        padded, _lens, width = _needle_batch_to_windows(needles)
        needles_dev = jnp.asarray(padded)
        n, mesh, chunk = self.n, self.mesh, self.chunk_len
        steps = _ceil_log2(chunk + 1) + 1
        text = self.text_padded

        def per_shard(sa_slice, text_full, nds):
            start, _ = lcs_kernel(text_full, sa_slice, nds, steps)
            # recompute true lengths against the text, then mask pad
            # suffixes (start >= n) and clamp matches at the real end of
            # text (a \x00-bearing needle must not extend into zero pad)
            windows = cmp.gather_window(text_full, start[None, :], nds.shape[-1])[0]
            length = cmp.prefix_match_len(windows, nds)
            length = jnp.minimum(length, n - start)
            length = jnp.where(start < n, length, -1)
            all_len = jax.lax.all_gather(length, _AXIS, axis=0)  # [P, B]
            all_start = jax.lax.all_gather(start, _AXIS, axis=0)
            best_p = jnp.argmax(all_len, axis=0)
            best_len = jnp.maximum(jnp.max(all_len, axis=0), 0)
            best_start = jnp.take_along_axis(all_start, best_p[None, :], axis=0)[0]
            return best_start, best_len

        query = jax.jit(
            jax.shard_map(
                per_shard,
                mesh=mesh,
                in_specs=(P(_AXIS), P(), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )
        )
        start, length = query(self._sa_sharded, text, needles_dev)
        start = np.asarray(start)
        length = np.asarray(length)
        host = np.asarray(self.text_padded[: self.n])
        return [
            LongestCommonSubstring(host, int(start[i]), int(length[i]))
            for i in range(len(needles))
        ]

    def longest_substring_match(self, needle):
        return self.longest_substring_match_batch([needle])[0]

    def to_suffix_array_index(self):
        """Materialize a single-device `SuffixArray` for the query API."""
        from stringsearch_tpu.core.types import SuffixArray

        text = self.text_padded[: self.n]
        return SuffixArray(text, jnp.asarray(self.suffix_array()))


def build_global(text: BytesLike, mesh: Mesh) -> GlobalSuffixArray:
    """Build the exact global SA of `text` sharded over `mesh`'s "parts"."""
    return GlobalSuffixArray(text, mesh)
