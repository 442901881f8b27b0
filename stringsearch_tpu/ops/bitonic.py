"""Pallas TPU bitonic sort — VMEM-fused stages, variadic 32-bit operands.

Why this exists: every phase of the SACA engines is one `jax.lax.sort`
(see engines/doubling.py), and on TPU the XLA sort is the wall — a
(key, payload) sort of 2^24 elements costs ~50 ms device time on v5e,
~7x off HBM speed-of-light, because the bitonic network pays HBM
traffic roughly every other stage. This kernel runs the same XOR
bitonic network (ref-free; the classic formulation: for k in 2,4,..,n:
for j in k/2,..,1: exchange i with i^j, direction (i & k) == 0) but
blocks the array into VMEM tiles of 2^17..2^19 elements so that:

  * the first log2(V) stage groups — ~75% of all compare-exchanges —
    run in ONE grid pass over HBM (`_local_sort_kernel`);
  * each remaining stage group k > V needs only log2(k/V) cross-block
    passes, and the last of them fuses the group's entire local tail
    (j <= V/2) into the same kernel (`_cross_kernel`).

MEASURED VERDICT (v5e, 2026-08-20; regenerate with
harness/microbench.py and /tmp-style variant probes): the fusion does
NOT beat XLA. kv 2^24: this kernel 137 ms vs lax.sort 75 ms (device
~112 vs ~50 ms after the ~25 ms dispatch floor). The per-stage
decomposition on a [4096,128] tile pins the cause: 5.1 us/stage for a
bare loop with elementwise body (loop-carried VMEM round trips),
9.5 us with partner rolls/gathers, 14.4 us with the full comparator —
i.e. a stage is VMEM-BANDWIDTH-bound at ~12-15 vector ops each
touching the whole tile, while XLA's stage is HBM-bound at ~3 ops.
VMEM is only ~3-4x faster than HBM on v5e, so fusing stages into VMEM
without shrinking ops-per-stage cannot win; winning needs
register-blocked multi-stage processing (read an (8,128) vreg once,
run all in-register distances), which Mosaic does not expose. The
kernel therefore stays OPT-IN (STRINGSEARCH_TPU_PALLAS=1) as a
documented negative result; `device_sort` routes to lax.sort.

Exchange mechanics inside a [R, 128] VMEM tile:
  * lane-distance j < 128: partner = take_along_axis(x, lane ^ j) — the
    one dynamic-gather Mosaic supports (along the minor/lane axis);
  * sublane-distance j >= 128: partner row = row ^ (j/128), realized as
    a select between two dynamic circular rolls (tpu.DynamicRotate).

The stage network runs as RUNTIME loops (fori/while over stage
distances) rather than an unrolled Python loop: an unrolled network at
v = 2^19 is ~190 stages of vector ops and OOM-killed the Mosaic
compiler; the loop form keeps the traced program O(1) in tile size.

Both partners compute the identical swap predicate, so the update is a
single select per operand: new = where(swap, partner, mine).

NOT a stable sort (bitonic networks are not); every call site in the
engines either carries a unique final operand inside the key set or is
order-insensitive within ties (see engines/doubling.py notes). Operands
are uint32 in-kernel; the wrapper order-preservingly maps int32 keys to
uint32 (XOR 0x80000000) and bitcasts payloads.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
# Tile sizing: the kernel keeps ~6 live [R,128] copies per operand set
# (inputs, partners from rolls, canonical a/b, selects), so tile bytes *
# C (operands) is capped at 4 MB and the Mosaic scoped-VMEM limit is
# raised to 64 MB (measured: c=2 at v=2^19 allocates ~24 MB on v5e).
_VMEM_BUDGET = 4 * 1024 * 1024
_VMEM_LIMIT = 64 * 1024 * 1024
_MIN_PALLAS_N = 1 << 15  # below this lax.sort wins on dispatch overhead


def _tile_elems(c: int) -> int:
    """Largest power-of-two tile so c operands fit the VMEM budget.

    STRINGSEARCH_TPU_PALLAS_TILE overrides (tests use a tiny tile so the
    cross-block kernels are exercised at small n, and because interpret
    mode's per-kernel graphs must stay small for CPU XLA to compile).
    """
    env = os.environ.get("STRINGSEARCH_TPU_PALLAS_TILE")
    if env:
        return int(env)
    v = 1 << 20
    while v * c * 4 > _VMEM_BUDGET:
        v >>= 1
    return v


def _lex_gt(a_keys, b_keys):
    """Lexicographic a > b over equal-length uint32 key lists."""
    gt = a_keys[-1] > b_keys[-1]
    for ak, bk in zip(reversed(a_keys[:-1]), reversed(b_keys[:-1])):
        gt = (ak > bk) | ((ak == bk) & gt)
    return gt


def _swap_pred(dir_asc, a_keys, b_keys):
    """swap = dir ? (a > b) : (b > a), in pure logical ops.

    Mosaic cannot lower a select that PRODUCES i1 vectors ("Unsupported
    target bitwidth for truncation" on arith.trunci i8->i1), so the
    direction blend must be &/| rather than jnp.where.
    """
    gt = _lex_gt(a_keys, b_keys)
    lt = _lex_gt(b_keys, a_keys)
    return (dir_asc & gt) | (~dir_asc & lt)


def _global_idx(shape, block_start):
    """Element's global linear index as an i32 [R, 128] array."""
    return (
        block_start
        + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    )


def _lane_exchange(xs, num_keys, jj: int, k, gi, enable):
    """Compare-exchange at STATIC lane distance jj < 128.

    k is a traced i32 scalar; `enable` (traced bool) turns the stage
    into a no-op — the tail loop always runs all 7 lane stages and masks
    the ones above the group's first distance.
    """
    shape = xs[0].shape
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    perm = lane ^ jj
    partners = tuple(jnp.take_along_axis(x, perm, axis=1) for x in xs)
    low = (lane & jj) == 0
    a = [jnp.where(low, x, p) for x, p in zip(xs, partners)]
    b = [jnp.where(low, p, x) for x, p in zip(xs, partners)]
    dir_asc = (gi & k) == 0
    swap = _swap_pred(dir_asc, a[:num_keys], b[:num_keys]) & enable
    return tuple(jnp.where(swap, p, x) for x, p in zip(xs, partners))


def _sublane_exchange(xs, num_keys, j, k, gi):
    """Compare-exchange at TRACED sublane distance j >= 128.

    partner row = row ^ (j/128), realized as a select between two
    dynamic circular rolls (tpu.DynamicRotate): rows with the j-bit
    unset read row+jrow = roll(x, R-jrow); rows with it set read
    row-jrow = roll(x, jrow). No wraparound ever survives the select
    (row ^ jrow is always in range).
    """
    shape = xs[0].shape
    r = shape[0]
    jrow = jax.lax.div(j, jnp.int32(_LANES))
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    bit_unset = (row & jrow) == 0
    partners = tuple(
        jnp.where(
            bit_unset,
            pltpu.roll(x, r - jrow, axis=0),
            pltpu.roll(x, jrow, axis=0),
        )
        for x in xs
    )
    a = [jnp.where(bit_unset, x, p) for x, p in zip(xs, partners)]
    b = [jnp.where(bit_unset, p, x) for x, p in zip(xs, partners)]
    dir_asc = (gi & k) == 0
    swap = _swap_pred(dir_asc, a[:num_keys], b[:num_keys])
    return tuple(jnp.where(swap, p, x) for x, p in zip(xs, partners))


def _sublane_exchange_static(xs, num_keys, j: int, k: int, gi):
    """Compare-exchange at STATIC sublane distance j >= 128.

    Static form of `_sublane_exchange`: the two partner views are static
    slice+concat "rolls" (no dynamic rotate, no loop), which Mosaic
    lowers to plain sublane shifts.
    """
    shape = xs[0].shape
    r = shape[0]
    jrow = j // _LANES

    def roll_up(x):  # roll_up[i] = x[i + jrow]
        return jnp.concatenate([x[jrow:], x[:jrow]], axis=0)

    def roll_dn(x):  # roll_dn[i] = x[i - jrow]
        return jnp.concatenate([x[r - jrow :], x[: r - jrow]], axis=0)

    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    bit_unset = (row & jrow) == 0
    partners = tuple(
        jnp.where(bit_unset, roll_up(x), roll_dn(x)) for x in xs
    )
    a = [jnp.where(bit_unset, x, p) for x, p in zip(xs, partners)]
    b = [jnp.where(bit_unset, p, x) for x, p in zip(xs, partners)]
    dir_asc = (gi & k) == 0
    swap = _swap_pred(dir_asc, a[:num_keys], b[:num_keys])
    return tuple(jnp.where(swap, p, x) for x, p in zip(xs, partners))


def _run_group_tail_static(xs, num_keys, k: int, j_hi: int, gi):
    """Fully unrolled stages j = j_hi .. 1 of group k (k, j_hi static)."""
    j = j_hi
    while j >= _LANES:
        xs = _sublane_exchange_static(xs, num_keys, j, k, gi)
        j >>= 1
    while j >= 1:
        xs = _lane_exchange(xs, num_keys, j, jnp.int32(k), gi, True)
        j >>= 1
    return xs


def _run_group_tail(xs, num_keys, k, j_hi, gi):
    """Stages j = j_hi .. 1 of group k, local to a [R, 128] tile.

    k and j_hi are traced i32 scalars: the sublane stages (j >= 128)
    run in a while_loop with dynamic-roll exchanges, and the 7 lane
    stages are static with an enable mask — so the traced program size
    is O(1) in the tile size instead of O(log^2 v) unrolled stages
    (the unrolled form OOM-killed the Mosaic compiler at v = 2^19).
    """

    def sub_cond(st):
        return st[0] >= _LANES

    def sub_body(st):
        j, xs = st
        return j >> 1, _sublane_exchange(xs, num_keys, j, k, gi)

    _, xs = jax.lax.while_loop(sub_cond, sub_body, (j_hi, tuple(xs)))
    jj = _LANES // 2
    while jj >= 1:
        xs = _lane_exchange(xs, num_keys, jj, k, gi, jj <= j_hi)
        jj >>= 1
    return xs


def _unrolled() -> bool:
    """Fully static network (bigger compile, lower runtime overhead)."""
    return os.environ.get("STRINGSEARCH_TPU_PALLAS_UNROLL", "0") in ("1", "on")


def _local_sort_kernel(num_keys, v, *refs):
    """Grid pass 1: fully run stage groups k = 2 .. v in VMEM."""
    c = len(refs) // 2
    ins, outs = refs[:c], refs[c:]
    xs = tuple(r[:] for r in ins)
    block_start = pl.program_id(0) * v
    gi = _global_idx(xs[0].shape, block_start)

    if _unrolled():
        k = 2
        while k <= v:
            xs = _run_group_tail_static(xs, num_keys, k, k // 2, gi)
            k <<= 1
    else:
        def group(s, xs):
            k = jnp.int32(2) << s
            return _run_group_tail(xs, num_keys, k, k >> 1, gi)

        xs = jax.lax.fori_loop(0, max(v.bit_length() - 1, 1), group, xs)
    for o, x in zip(outs, xs):
        o[:] = x


def _make_cross(num_keys, c, v, k, j, fuse_tail):
    """One cross-block stage (distance j >= v) + optional local tail.

    Each grid cell g loads its own tile and its partner tile (g ^ j/v),
    computes the shared swap predicate, keeps its own side, and — when
    `fuse_tail` (j == v: the group's last cross stage) — runs the whole
    local tail j/2..1 before writing. Reads are duplicated across the
    pair; writes are exclusive per cell.
    """

    def kernel(*refs):
        mine = refs[:c]
        theirs = refs[c : 2 * c]
        outs = refs[2 * c :]
        g = pl.program_id(0)
        block_start = g * v
        xs = [r[:] for r in mine]
        ps = [r[:] for r in theirs]
        # low side of the exchange = tile with (start & j) == 0
        low = (block_start & j) == 0
        dir_asc = (block_start & k) == 0  # k > j >= v: constant per pair
        a = [jnp.where(low, x, p) for x, p in zip(xs, ps)]
        b = [jnp.where(low, p, x) for x, p in zip(xs, ps)]
        swap = _swap_pred(dir_asc, a[:num_keys], b[:num_keys])
        xs = tuple(jnp.where(swap, p, x) for x, p in zip(xs, ps))
        if fuse_tail:
            gi = _global_idx(xs[0].shape, block_start)
            if _unrolled():
                xs = _run_group_tail_static(xs, num_keys, k, v // 2, gi)
            else:
                xs = _run_group_tail(
                    xs, num_keys, jnp.int32(k), jnp.int32(v // 2), gi
                )
        for o, x in zip(outs, xs):
            o[:] = x

    return kernel


def _pallas_sort_padded(operands, num_keys: int, interpret: bool = False):
    """Sort power-of-two-length uint32 operand tuple. Core network."""
    n = operands[0].shape[0]
    c = len(operands)
    v = min(_tile_elems(c), n)
    nblocks = n // v
    shape2d = (v // _LANES, _LANES)

    def reshaped(x):
        return x.reshape(n // _LANES, _LANES)

    ops2d = tuple(reshaped(x) for x in operands)

    # index_map returns BLOCK indices (units of the block shape)
    block = pl.BlockSpec(shape2d, lambda g: (g, 0), memory_space=pltpu.VMEM)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((n // _LANES, _LANES), jnp.uint32)
        for _ in range(c)
    )

    cparams = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    ops2d = pl.pallas_call(
        functools.partial(_local_sort_kernel, num_keys, v),
        grid=(nblocks,),
        in_specs=[block] * c,
        out_specs=tuple([block] * c),
        out_shape=out_shapes,
        compiler_params=cparams,
        interpret=interpret,
    )(*ops2d)

    k = 2 * v
    while k <= n:
        j = k // 2
        while j >= v:
            jb = j // v
            partner = pl.BlockSpec(
                shape2d,
                lambda g, jb=jb: (g ^ jb, 0),
                memory_space=pltpu.VMEM,
            )
            fuse = j == v
            ops2d = pl.pallas_call(
                _make_cross(num_keys, c, v, k, j, fuse),
                grid=(nblocks,),
                in_specs=[block] * c + [partner] * c,
                out_specs=tuple([block] * c),
                out_shape=out_shapes,
                compiler_params=cparams,
                interpret=interpret,
            )(*ops2d, *ops2d)
            j //= 2
        k *= 2

    return tuple(x.reshape(n) for x in ops2d)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def pallas_sort(operands, num_keys: int = 1, interpret: bool = False):
    """Sort 1-D 32-bit operands by their first `num_keys` (ascending).

    Drop-in for `jax.lax.sort(operands, num_keys=...)` EXCEPT not stable
    — ties in the key set come back in arbitrary order. int32 keys are
    handled order-preservingly; payload operands are bitcast. Length is
    padded internally to the next power of two (max-key pads sort last
    and are sliced off).
    """
    operands = tuple(operands)
    n = operands[0].shape[0]
    c = len(operands)
    signed = [op.dtype == jnp.int32 for op in operands]
    as_u32 = []
    for i, op in enumerate(operands):
        if op.dtype not in (jnp.int32, jnp.uint32):
            raise TypeError(f"pallas_sort supports 32-bit operands, got {op.dtype}")
        u = jax.lax.bitcast_convert_type(op, jnp.uint32)
        if signed[i] and i < num_keys:
            u = u ^ jnp.uint32(0x80000000)
        as_u32.append(u)

    npad = _next_pow2(max(n, _LANES))
    if npad != n:
        pads = []
        for i, u in enumerate(as_u32):
            fill = jnp.uint32(0xFFFFFFFF) if i < num_keys else jnp.uint32(0)
            pads.append(
                jnp.concatenate([u, jnp.full((npad - n,), fill, jnp.uint32)])
            )
        as_u32 = pads

    out = _pallas_sort_padded(tuple(as_u32), num_keys, interpret=interpret)

    res = []
    for i, u in enumerate(out):
        u = u[:n]
        if signed[i] and i < num_keys:
            u = u ^ jnp.uint32(0x80000000)
        res.append(jax.lax.bitcast_convert_type(u, operands[i].dtype))
    return tuple(res)


def _pallas_mode() -> str:
    """"on" | "off" | "interpret" (tests).

    Default is OFF: measured on v5e (2026-08-20), the kernel is correct
    but slower than XLA's sort (kv 2^24: 137 ms vs 75 ms; 6-key: 449 ms
    vs 169 ms) — the stage loops are latency-bound. It stays opt-in
    (STRINGSEARCH_TPU_PALLAS=1, plus _UNROLL=1 for the static network)
    until a variant beats lax.sort; see harness/microbench.py.
    """
    env = os.environ.get("STRINGSEARCH_TPU_PALLAS", "off")
    if env in ("1", "on", "true"):
        return "on"
    if env == "interpret":
        return "interpret"
    return "off"


def device_sort(operands, num_keys: int = 1):
    """lax.sort-shaped sort that takes the Pallas network when it wins.

    Falls back to `jax.lax.sort` off-TPU, for tiny inputs (dispatch
    overhead dominates), for non-32-bit operands, and when disabled via
    STRINGSEARCH_TPU_PALLAS=0. NOT stable on the Pallas path — callers
    must not rely on tie order (the engines don't; see module doc).
    """
    operands = tuple(operands)
    mode = _pallas_mode()
    n = int(operands[0].shape[0])
    ok_dtypes = all(op.dtype in (jnp.int32, jnp.uint32) for op in operands)
    min_n = 1 << 10 if mode == "interpret" else _MIN_PALLAS_N
    if mode == "off" or not ok_dtypes or n < min_n:
        return jax.lax.sort(operands, num_keys=num_keys)
    return pallas_sort(operands, num_keys, interpret=(mode == "interpret"))
