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
    contracted against the pair planes split into exact-in-bf16 8-bit
    bytes — O(T^2) MACs per tile ride the MXU.
  - every flush DMA has STATIC size G (Pallas cannot issue
    dynamic-length copies); only destinations are dynamic.

MEASURED VERDICT (2026-08-22, v5e, BENCH_DETAIL radix_partition_probe_r5):
negative, decisively — the grouping stage alone costs 1.77x the entire
flat lax.sort it would replace at 2^28 (2.37 s vs 1.34 s), the best
composed 8-bit pass is 3.5x, and VMEM-feasible tiles pay 16-32x
granule-quantization write amplification. The scatter DMAs themselves
are NOT the bottleneck (16-27 GB/s pipelined at W=16 outstanding).
These kernels stay as the measurement harness + regression surface for
that closed question.

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

# Mosaic requires the sublane (second-minor) block dimension to be a
# multiple of 8, so the histogram kernel processes 8 blocks per grid
# step (the grouping kernels instead shape each tile [tile//128, 128]).
_ROWS = 8


# ---------------------------------------------------------------------------
# phase 1: per-block histograms
# ---------------------------------------------------------------------------


def _hist_kernel(keys_ref, out_ref, *, tile: int, chunk: int, shift: int,
                 rows: int):
    """256-bin histograms of `rows` [tile]-blocks of uint32 keys.

    Each row is processed in [chunk, 256] one-hot slabs contracted on
    the MXU; f32 accumulation is exact (counts <= tile < 2^24). The
    kernel handles `rows` blocks per grid step because Mosaic requires
    the sublane block dimension to be a multiple of 8.
    """
    bins = jax.lax.broadcasted_iota(jnp.int32, (chunk, 256), 1)
    for r in range(rows):
        acc = jnp.zeros((1, 256), jnp.float32)
        for c in range(tile // chunk):
            k = keys_ref[r, pl.ds(c * chunk, chunk)]
            b = ((k >> shift) & 0xFF).astype(jnp.int32)
            onehot = (b[:, None] == bins).astype(jnp.float32)
            acc = acc + jnp.dot(
                jnp.ones((1, chunk), jnp.float32), onehot,
                preferred_element_type=jnp.float32,
            )
        out_ref[r, :] = acc[0].astype(jnp.int32)


@partial(jax.jit,
         static_argnames=("tile", "chunk", "shift", "interpret"))
def block_histograms(keys: jnp.ndarray, tile: int = 8192,
                     chunk: int = 1024, shift: int = 24,
                     interpret: bool = False) -> jnp.ndarray:
    """[B, 256] per-block histograms of ((keys >> shift) & 0xFF)."""
    n = keys.shape[0]
    if n % (tile * _ROWS):
        raise ValueError(f"n={n} must be a multiple of {tile * _ROWS}")
    nblocks = n // tile
    return pl.pallas_call(
        partial(_hist_kernel, tile=tile, chunk=chunk, shift=shift,
                rows=_ROWS),
        out_shape=jax.ShapeDtypeStruct((nblocks, 256), jnp.int32),
        grid=(nblocks // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, tile), lambda b: (b, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((_ROWS, 256), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(keys.reshape(nblocks, tile))


# ---------------------------------------------------------------------------
# phase 2a: in-VMEM local grouping (bucket staging)
# ---------------------------------------------------------------------------


def _dest_kernel(keys_ref, dest_ref, lb_ref, *, tile: int,
                 shift: int, chunk: int):
    """Within-tile destination ranks: dest[t] = local_base[bin t] +
    rank-of-t-in-its-bin, plus the tile's local bin starts [256].

    MXU formulation (cumsum/gather/scatter have no Pallas TPU
    lowering): the column cumsum of the [tile, 256] bin one-hot rides
    the MXU HIERARCHICALLY — a [chunk, chunk] triangular matmul per
    chunk plus a tiny cross-chunk carry (cost per element: chunk*256
    MACs, not tile*256) — and dest is a masked row sum. The 0/1
    triangle and one-hot operands are bf16 (exact: counts <= 256 fit
    the 8-bit mantissa) with f32 accumulation.
    """
    k = keys_ref[...].reshape(tile)
    b = ((k >> shift) & 0xFF).astype(jnp.int32)
    bins = jax.lax.broadcasted_iota(jnp.int32, (tile, 256), 1)
    onehot = (b[:, None] == bins).astype(jnp.bfloat16)
    tri_c = (
        jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
        <= jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    ).astype(jnp.bfloat16)  # tri[i, j] = (j <= i): inclusive scan
    carry = jnp.zeros((1, 256), jnp.float32)
    rows = []
    for c in range(tile // chunk):
        oc = jax.lax.slice(onehot, (c * chunk, 0),
                           ((c + 1) * chunk, 256))
        cc = jnp.dot(tri_c, oc, preferred_element_type=jnp.float32)
        rows.append(cc + carry)
        carry = carry + jax.lax.slice(cc, (chunk - 1, 0), (chunk, 256))
    colcum = jnp.concatenate(rows, axis=0)  # [tile, 256] inclusive
    strict_lt = (
        jax.lax.broadcasted_iota(jnp.int32, (256, 256), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (256, 256), 1)
    ).astype(jnp.float32)
    local_base = jnp.dot(carry, strict_lt,
                         preferred_element_type=jnp.float32)  # [1, 256]
    dest = jnp.sum(
        onehot.astype(jnp.float32) * (local_base + colcum - 1.0), axis=1)
    dest_ref[...] = dest.astype(jnp.int32).reshape(dest_ref.shape)
    # [256] -> (1, 8, 32) is an unsupported shape cast; write the bin
    # starts as an 8-row broadcast plane instead (row 0 is consumed)
    lb_ref[...] = jnp.broadcast_to(
        local_base.astype(jnp.int32), (8, 256)
    ).reshape(lb_ref.shape)


def _place_kernel(keys_ref, pay_ref, dest_ref, gk_ref, gp_ref,
                  *, tile: int):
    """Apply within-tile destination ranks: one [tile, tile]
    permutation matmul over 8-bit planes (bf16-exact, values < 256).

    Split from _dest_kernel because fusing the hierarchical-cumsum
    pipeline with the permutation matmul in one Mosaic kernel sends
    the compiler into a multi-minute layout search (measured: each
    half compiles in < 9 s, the fusion did not return in 9 min). The
    split costs one extra HBM round trip of the [n] i32 dest array.
    """
    k = keys_ref[...].reshape(tile)
    p = pay_ref[...].reshape(tile)
    dest_i = dest_ref[...].reshape(tile)
    slots = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    perm = (dest_i[None, :] == slots).astype(jnp.bfloat16)  # [s, t]
    pu = p.astype(jnp.uint32)
    # 8-bit planes: exact in bf16; Mosaic has no u32<->f32 casts, so
    # hop through i32 (values < 256). Stack in i32 and cast the 2D
    # result: minor-dim insertion is only supported for 32-bit types.
    planes = jnp.stack(
        [((k >> s) & 0xFF).astype(jnp.int32) for s in (24, 16, 8, 0)]
        + [((pu >> s) & 0xFF).astype(jnp.int32) for s in (24, 16, 8, 0)],
        axis=1,
    ).astype(jnp.bfloat16)  # [t, 8]
    g = jnp.dot(perm, planes, preferred_element_type=jnp.float32)
    # column EXTRACTION via masked row sums, not lax.slice: Mosaic
    # mis-lowers lane-offset slices of narrow arrays (measured: the
    # offset-1 column reads back as zero), while masked reductions are
    # exact
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, 8), 1)
    pl8 = [
        jnp.sum(jnp.where(col == c, g, 0.0), axis=1)
        .astype(jnp.int32).astype(jnp.uint32)
        for c in range(8)
    ]
    gk = (pl8[0] << 24) | (pl8[1] << 16) | (pl8[2] << 8) | pl8[3]
    gp = (pl8[4] << 24) | (pl8[5] << 16) | (pl8[6] << 8) | pl8[7]
    gk_ref[...] = gk.reshape(gk_ref.shape)
    gp_ref[...] = gp.astype(jnp.int32).reshape(gp_ref.shape)


@partial(jax.jit,
         static_argnames=("tile", "shift", "chunk", "interpret"))
def local_group(keys: jnp.ndarray, payload: jnp.ndarray,
                tile: int = 1024, shift: int = 24, chunk: int = 128,
                interpret: bool = False):
    """Per-block VMEM bucket staging: returns (grouped_keys,
    grouped_payload, local_base [B, 256]) with each tile's pairs
    reordered bin-contiguously (block-local order preserved in-bin).

    Layout: each tile is a [tile//128, 128] plane of a 3D array so one
    grid step owns exactly one tile while the sublane block dimension
    stays a multiple of 8 (tile >= 1024). Two pallas_calls (see
    _place_kernel for why the fusion is off the table)."""
    n = keys.shape[0]
    if tile % (128 * 8):
        raise ValueError(f"tile={tile} must be a multiple of 1024")
    if n % tile:
        raise ValueError(f"n={n} must be a multiple of tile={tile}")
    nblocks = n // tile
    sub = tile // 128
    vspec = pl.BlockSpec((1, sub, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    k3 = keys.reshape(nblocks, sub, 128)
    p3 = payload.reshape(nblocks, sub, 128)
    dest, lb = pl.pallas_call(
        partial(_dest_kernel, tile=tile, shift=shift, chunk=chunk),
        out_shape=(
            jax.ShapeDtypeStruct((nblocks, sub, 128), jnp.int32),
            jax.ShapeDtypeStruct((nblocks, 8, 256), jnp.int32),
        ),
        grid=(nblocks,),
        in_specs=[vspec],
        out_specs=(
            vspec,
            pl.BlockSpec((1, 8, 256), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(k3)
    gk, gp = pl.pallas_call(
        partial(_place_kernel, tile=tile),
        out_shape=(
            jax.ShapeDtypeStruct((nblocks, sub, 128), jnp.uint32),
            jax.ShapeDtypeStruct((nblocks, sub, 128), jnp.int32),
        ),
        grid=(nblocks,),
        in_specs=[vspec, vspec, vspec],
        out_specs=(vspec, vspec),
        interpret=interpret,
    )(k3, p3, dest)
    return gk.reshape(n), gp.reshape(n), lb[:, 0, :]


# ---------------------------------------------------------------------------
# phase 2b: granule-flush DMA probe
# ---------------------------------------------------------------------------


def _flush_kernel(desc_ref, src_ref, out_ref, dsc, sem,
                  *, granule: int, per_block: int):
    """Flush each granule row of the block's source window to a DYNAMIC
    destination row of the HBM output — the isolated data motion of a
    partition pass's phase 2b (read n, write n, granule-grained
    placement). Granule rows move HBM->HBM directly: the DMA engine
    pays the same read+write traffic a VMEM-staged flush would, without
    capping per_block at what a VMEM stage can hold."""
    blk = pl.program_id(0)
    # stage the block's descriptor window into SMEM (a full-array SMEM
    # operand overflows SMEM at 2^28 / granule 128, and blocked SMEM
    # operands hit XLA-vs-Mosaic layout clashes)
    dstage = pltpu.make_async_copy(
        desc_ref.at[pl.ds(blk * per_block, per_block)], dsc, sem
    )
    dstage.start()
    dstage.wait()

    # W outstanding DMAs (issue i, wait i-W): measures pipelined
    # scatter throughput, not per-DMA round-trip latency — a serialized
    # start();wait() loop caps at the ~6 us DMA latency (~160 k DMA/s)
    # regardless of granule
    W = min(16, per_block)

    def _copy(i):
        d = dsc[i]
        return pltpu.make_async_copy(
            src_ref.at[blk * per_block + i], out_ref.at[d], sem)

    def body(i, _):
        _copy(i).start()

        @pl.when(i >= W)
        def _wait_prev():
            _copy(i - W).wait()

        return 0

    jax.lax.fori_loop(0, per_block, body, 0)

    def drain(i, _):
        _copy(i).wait()
        return 0

    jax.lax.fori_loop(per_block - W, per_block, drain, 0)


@partial(jax.jit, static_argnames=("granule", "per_block", "out_rows",
                                   "interpret"))
def granule_flush(desc: jnp.ndarray, src: jnp.ndarray, granule: int,
                  per_block: int, out_rows: int,
                  interpret: bool = False) -> jnp.ndarray:
    """Scatter granule rows of `src` (int32 [total, granule]) to rows
    `desc` (int32 [total]) of a [out_rows, granule] output. Pure
    dynamic-offset DMA throughput probe."""
    total = desc.shape[0]
    if total % per_block:
        raise ValueError("per_block must divide the descriptor count")
    if per_block != total and per_block % 1024:
        raise ValueError("per_block must be a multiple of 1024 (the XLA "
                         "tiling of the rank-1 i32 descriptor array, "
                         "which per-block DMA slices must align to)")
    # DMA-unit layout: a granule must be sublane-aligned. granule=128
    # is exactly one (1, 128) lane row (allowed); larger granules must
    # be multiples of 1024 and ride as [8, granule//8] slabs so each
    # unit owns full 8-sublane tiles (Mosaic rejects 1-sublane slices
    # of wider rows: "slice shape along dimension 0 must be aligned").
    if granule == 128:
        unit = (granule,)
    elif granule % 1024 == 0:
        unit = (8, granule // 8)
    else:
        raise ValueError(
            f"granule={granule}: only 128 or multiples of 1024 are "
            "DMA-alignable")
    nblocks = total // per_block
    out = pl.pallas_call(
        partial(_flush_kernel, granule=granule, per_block=per_block),
        out_shape=jax.ShapeDtypeStruct((out_rows,) + unit, jnp.int32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.SMEM((per_block,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(desc, src.reshape((total,) + unit))
    return out.reshape(out_rows, granule)


# ---------------------------------------------------------------------------
# reference checks (host)
# ---------------------------------------------------------------------------


def check_histogram(keys: np.ndarray, tile: int = 8192,
                    shift: int = 24, interpret: bool = False) -> bool:
    got = np.asarray(block_histograms(jnp.asarray(keys), tile=tile,
                                      shift=shift, interpret=interpret))
    b = (keys >> np.uint32(shift)) & np.uint32(0xFF)
    want = np.stack([
        np.bincount(b[i * tile:(i + 1) * tile], minlength=256)
        for i in range(len(keys) // tile)
    ])
    return bool(np.array_equal(got, want))


def check_local_group(keys: np.ndarray, payload: np.ndarray,
                      tile: int = 1024, shift: int = 24,
                      interpret: bool = False) -> bool:
    gk, gp, lb = (np.asarray(x) for x in local_group(
        jnp.asarray(keys), jnp.asarray(payload), tile=tile, shift=shift,
        interpret=interpret))
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


def check_granule_flush(total: int = 2048, granule: int = 128,
                        per_block: int = 1024,
                        interpret: bool = False) -> bool:
    rng = np.random.default_rng(0)
    desc = rng.permutation(total).astype(np.int32)
    src = rng.integers(0, 1 << 30, (total, granule), dtype=np.int32)
    out = np.asarray(granule_flush(jnp.asarray(desc), jnp.asarray(src),
                                   granule, per_block, total,
                                   interpret=interpret))
    want = np.zeros_like(src)
    want[desc] = src
    return bool(np.array_equal(out, want))
