"""Pallas MSD radix-partition probes — the last unmeasured primitive.

The round-4 ceiling argument (README roofline, `headline_ceiling_r4`)
establishes that the sort-based build runs at ~97% of what `lax.sort`
passes allow (~48-52 MB/s at 2^28). The ONE primitive-level route past
that ceiling is a radix-partition pass: if grouping (key, payload) pairs
by an 8-bit key field costs a small fraction of the 1.31 s flat
1-key+payload `lax.sort` at 2^28, then a partitioned initial (cheap
grouping + 3-6x-cheaper batched per-bucket sorts, see the microbench
`batched_sort` rows) and a radix-structured inverse permutation rewrite
the build's phase arithmetic. The reference's own initial phase is
precisely such a radix placement (ref:
crates/divsufsort/src/divsufsort.rs:127-161, the 2-char bucket scatter).

TPU has no scattered-store primitive, so the partition must be staged:

  phase 1 (count): per grid block, a 256-bin histogram of the tile's
      key bytes — one-hot expansion contracted on the MXU;
  glue (XLA): exclusive scans over [blocks, 256] produce each
      (block, bin)'s global destination offset — O(B*256) work;
  phase 2 (place): per block, group the tile's pairs by bin INSIDE
      VMEM (rank arithmetic below + one MXU permutation matmul), then
      flush each bin's run to its destination with contiguous DMAs.

The probes below measure each stage's real cost on hardware, because
each has a distinct failure mode the composition must price:

  * `block_histograms` — phase-1 cost (read bandwidth + MXU work);
  * `local_group`      — phase-2a cost (the VMEM bucket staging);
  * `granule_flush`    — phase-2b cost: HBM->VMEM->HBM DMA throughput
      at granule sizes 32..4096 elements with DYNAMIC destination
      offsets — the direct test of the "sub-512B scattered DMAs are
      latency-bound" claim the round-4 README made by assertion.

Composition arithmetic (see `harness/microbench.py radix`): a full
8-bit pass = phase 1 + phase 2a + phase 2b at the granule the bin
population supports, plus the granule-quantization pad overhead
(ceil(hist/G)*G slots per (block, bin): expected B*256*G/2 pads that
downstream consumers must mask or re-compact).

Design notes for the in-kernel steps (all shapes static, no scatter):

  - histogram: onehot[t, r] = (bin(key[t]) == r); hist = 1s @ onehot on
    the MXU (the classic TPU histogram — a [1, T] x [T, 256] matmul).
  - within-tile rank WITHOUT gather: with colcum = inclusive column
    cumsum of onehot, the element's rank-in-its-bin is
    rowsum(onehot * (colcum - 1)) and its bin's local segment start is
    rowsum(onehot * local_base[None, :]) — pure elementwise + row
    reduction; no take_along_axis (Mosaic's dynamic in-VMEM gather is
    the primitive being avoided).
  - the local reorder is a permutation matmul: M[s, t] = (dest[t] == s)
    contracted against the pair planes split into exact-in-f32 16-bit
    halves — O(T^2) MACs per tile ride the MXU.
  - every flush DMA has STATIC size G (Pallas cannot issue
    dynamic-length copies); only destinations are dynamic.

Run: python -m stringsearch_tpu.harness.microbench radix --n 24
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32 = jnp.int32


# ---------------------------------------------------------------------------
# phase 1: per-block histograms
# ---------------------------------------------------------------------------


def _hist_kernel(keys_ref, out_ref, *, tile: int, chunk: int, shift: int):
    """256-bin histogram of one [1, tile] block of uint32 keys.

    The tile is processed in [chunk, 256] one-hot slabs contracted on
    the MXU; f32 accumulation is exact (counts <= tile < 2^24).
    """
    bins = jax.lax.broadcasted_iota(jnp.int32, (chunk, 256), 1)
    acc = jnp.zeros((1, 256), jnp.float32)
    for c in range(tile // chunk):
        k = keys_ref[0, pl.ds(c * chunk, chunk)]
        b = ((k >> shift) & 0xFF).astype(jnp.int32)
        onehot = (b[:, None] == bins).astype(jnp.float32)
        acc = acc + jnp.dot(
            jnp.ones((1, chunk), jnp.float32), onehot,
            preferred_element_type=jnp.float32,
        )
    out_ref[0, :] = acc[0].astype(jnp.int32)


@partial(jax.jit, static_argnames=("tile", "chunk", "shift"))
def block_histograms(keys: jnp.ndarray, tile: int = 8192,
                     chunk: int = 1024, shift: int = 24) -> jnp.ndarray:
    """[B, 256] per-block histograms of ((keys >> shift) & 0xFF)."""
    n = keys.shape[0]
    if n % tile:
        raise ValueError(f"n={n} must be a multiple of tile={tile}")
    nblocks = n // tile
    return pl.pallas_call(
        partial(_hist_kernel, tile=tile, chunk=chunk, shift=shift),
        out_shape=jax.ShapeDtypeStruct((nblocks, 256), jnp.int32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, tile), lambda b: (b, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, 256), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
    )(keys.reshape(nblocks, tile))


# ---------------------------------------------------------------------------
# phase 2a: in-VMEM local grouping (bucket staging)
# ---------------------------------------------------------------------------


def _group_kernel(keys_ref, pay_ref, gk_ref, gp_ref, lb_ref,
                  *, tile: int, shift: int):
    """Group one block's (key, payload) pairs by bin inside VMEM.

    Emits the grouped pairs plus the tile's local bin starts [256]
    (exclusive scan of the tile histogram). The reorder is one
    permutation matmul on 16-bit planes (exact in f32).
    """
    k = keys_ref[0, :]
    p = pay_ref[0, :]
    b = ((k >> shift) & 0xFF).astype(jnp.int32)
    bins = jax.lax.broadcasted_iota(jnp.int32, (tile, 256), 1)
    onehot = (b[:, None] == bins).astype(jnp.float32)
    colcum = jnp.cumsum(onehot, axis=0)  # inclusive
    hist = colcum[-1, :]
    local_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.cumsum(hist)[:-1]]
    )
    # dest[t] = local_base[bin t] + (rank of t within its bin) — masked
    # row sums, no gather
    dest = jnp.sum(onehot * (local_base[None, :] + colcum - 1.0), axis=1)
    dest_i = dest.astype(jnp.int32)
    slots = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    perm = (dest_i[None, :] == slots).astype(jnp.float32)  # [s, t]
    planes = jnp.stack(
        [
            (k >> 16).astype(jnp.float32),
            (k & 0xFFFF).astype(jnp.float32),
            (p.astype(jnp.uint32) >> 16).astype(jnp.float32),
            (p.astype(jnp.uint32) & 0xFFFF).astype(jnp.float32),
        ],
        axis=1,
    )  # [t, 4]; every value < 2^16: exact in f32
    g = jnp.dot(perm, planes, preferred_element_type=jnp.float32)
    gk = (g[:, 0].astype(jnp.uint32) << 16) | g[:, 1].astype(jnp.uint32)
    gp = (g[:, 2].astype(jnp.uint32) << 16) | g[:, 3].astype(jnp.uint32)
    gk_ref[0, :] = gk
    gp_ref[0, :] = gp.astype(jnp.int32)
    lb_ref[0, :] = local_base.astype(jnp.int32)


@partial(jax.jit, static_argnames=("tile", "shift"))
def local_group(keys: jnp.ndarray, payload: jnp.ndarray,
                tile: int = 1024, shift: int = 24):
    """Per-block VMEM bucket staging: returns (grouped_keys,
    grouped_payload, local_base [B, 256]) with each tile's pairs
    reordered bin-contiguously (block-local order preserved in-bin)."""
    n = keys.shape[0]
    if n % tile:
        raise ValueError(f"n={n} must be a multiple of tile={tile}")
    nblocks = n // tile
    gk, gp, lb = pl.pallas_call(
        partial(_group_kernel, tile=tile, shift=shift),
        out_shape=(
            jax.ShapeDtypeStruct((nblocks, tile), jnp.uint32),
            jax.ShapeDtypeStruct((nblocks, tile), jnp.int32),
            jax.ShapeDtypeStruct((nblocks, 256), jnp.int32),
        ),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, tile), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(keys.reshape(nblocks, tile), payload.reshape(nblocks, tile))
    return gk.reshape(n), gp.reshape(n), lb


# ---------------------------------------------------------------------------
# phase 2b: granule-flush DMA probe
# ---------------------------------------------------------------------------


def _flush_kernel(desc_ref, src_ref, out_ref, scratch, sem,
                  *, granule: int, per_block: int):
    """Stage one [per_block, granule] source window into VMEM, then
    flush each granule row to a DYNAMIC destination row of the HBM
    output — the isolated data motion of a partition pass's phase 2b
    (read n, write n, granule-grained placement)."""
    blk = pl.program_id(0)
    stage = pltpu.make_async_copy(
        src_ref.at[pl.ds(blk * per_block, per_block), :], scratch, sem
    )
    stage.start()
    stage.wait()

    def body(i, _):
        d = desc_ref[blk * per_block + i]
        copy = pltpu.make_async_copy(
            scratch.at[i], out_ref.at[d], sem
        )
        copy.start()
        copy.wait()
        return 0

    jax.lax.fori_loop(0, per_block, body, 0)


@partial(jax.jit, static_argnames=("granule", "per_block", "out_rows"))
def granule_flush(desc: jnp.ndarray, src: jnp.ndarray, granule: int,
                  per_block: int, out_rows: int) -> jnp.ndarray:
    """Scatter granule rows of `src` (int32 [total, granule]) to rows
    `desc` (int32 [total]) of a [out_rows, granule] output. Pure
    dynamic-offset DMA throughput probe."""
    total = desc.shape[0]
    if total % per_block:
        raise ValueError("per_block must divide the descriptor count")
    nblocks = total // per_block
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((per_block, granule), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        partial(_flush_kernel, granule=granule, per_block=per_block),
        out_shape=jax.ShapeDtypeStruct((out_rows, granule), jnp.int32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(desc, src)


# ---------------------------------------------------------------------------
# reference checks (host)
# ---------------------------------------------------------------------------


def check_histogram(keys: np.ndarray, tile: int = 8192,
                    shift: int = 24) -> bool:
    got = np.asarray(block_histograms(jnp.asarray(keys), tile=tile,
                                      shift=shift))
    b = (keys >> np.uint32(shift)) & np.uint32(0xFF)
    want = np.stack([
        np.bincount(b[i * tile:(i + 1) * tile], minlength=256)
        for i in range(len(keys) // tile)
    ])
    return bool(np.array_equal(got, want))


def check_local_group(keys: np.ndarray, payload: np.ndarray,
                      tile: int = 1024, shift: int = 24) -> bool:
    gk, gp, lb = (np.asarray(x) for x in local_group(
        jnp.asarray(keys), jnp.asarray(payload), tile=tile, shift=shift))
    ball = (keys >> np.uint32(shift)) & np.uint32(0xFF)
    for i in range(len(keys) // tile):
        sl = slice(i * tile, (i + 1) * tile)
        order = np.argsort(ball[sl], kind="stable")
        if not np.array_equal(gk[sl], keys[sl][order]):
            return False
        if not np.array_equal(gp[sl], payload[sl][order]):
            return False
        hist = np.bincount(ball[sl], minlength=256)
        base = np.concatenate([[0], np.cumsum(hist)[:-1]])
        if not np.array_equal(lb[i], base):
            return False
    return True


def check_granule_flush(total: int = 64, granule: int = 128,
                        per_block: int = 16) -> bool:
    rng = np.random.default_rng(0)
    desc = rng.permutation(total).astype(np.int32)
    src = rng.integers(0, 1 << 30, (total, granule), dtype=np.int32)
    out = np.asarray(granule_flush(jnp.asarray(desc), jnp.asarray(src),
                                   granule, per_block, total))
    want = np.zeros_like(src)
    want[desc] = src
    return bool(np.array_equal(out, want))
