"""Distributed bitonic merge-split sort (parallel/distsort.py) properties.

The regression this pins: with duplicate keys, the two partners of a
merge-split comparator must materialize the identical merged list, or
ties straddling the split are duplicated on one side and dropped on the
other — exactness of the value multiset is the test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from stringsearch_tpu.parallel.distsort import (
    exclusive_shard_offset,
    sharded_sort,
    shift_in_from_prev,
)


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return Mesh(np.array(devs[:8]), ("parts",))


def _run_sort(mesh, arrays, num_keys):
    f = jax.jit(
        jax.shard_map(
            lambda *ops: sharded_sort(ops, "parts", num_keys=num_keys),
            mesh=mesh,
            in_specs=tuple(P("parts") for _ in arrays),
            out_specs=tuple(P("parts") for _ in arrays),
            check_vma=False,
        )
    )
    return [np.asarray(x) for x in f(*map(jnp.asarray, arrays))]


@pytest.mark.parametrize("hi", [2, 7, 50, 1 << 20])
def test_sharded_sort_duplicate_keys(mesh8, hi):
    rng = np.random.default_rng(hi)
    n = 8 * 32
    keys = rng.integers(0, hi, n).astype(np.int32)
    vals = np.arange(n, dtype=np.int32)
    ks, vs = _run_sort(mesh8, (keys, vals), 1)
    assert np.all(np.diff(ks) >= 0)
    np.testing.assert_array_equal(np.sort(ks), np.sort(keys))
    # every value appears exactly once and rides with its key
    np.testing.assert_array_equal(np.sort(vs), vals)
    np.testing.assert_array_equal(keys[vs], ks)


def test_sharded_sort_two_keys_exact(mesh8):
    rng = np.random.default_rng(3)
    n = 8 * 16
    k1 = rng.integers(0, 6, n).astype(np.int32)
    k2 = rng.integers(0, 6, n).astype(np.int32)
    idx = np.arange(n, dtype=np.int32)
    s1, s2, si = _run_sort(mesh8, (k1, k2, idx), 3)  # idx as key -> unique
    order = np.lexsort((idx, k2, k1))
    np.testing.assert_array_equal(si, idx[order])
    np.testing.assert_array_equal(s1, k1[order])
    np.testing.assert_array_equal(s2, k2[order])


def test_exclusive_offset_and_shift(mesh8):
    n = 8 * 4
    x = np.arange(n, dtype=np.int32)

    def body(x):
        local = jnp.sum(x)
        off = exclusive_shard_offset(local, "parts")
        prev_last = shift_in_from_prev(x[-1:], "parts", -7)
        return jnp.full_like(x, off), jnp.broadcast_to(prev_last, x.shape)

    f = jax.jit(
        jax.shard_map(
            body, mesh=mesh8, in_specs=P("parts"),
            out_specs=(P("parts"), P("parts")), check_vma=False,
        )
    )
    offs, prevs = map(np.asarray, f(jnp.asarray(x)))
    chunks = x.reshape(8, 4)
    want_offs = np.concatenate([[0], np.cumsum(chunks.sum(1))[:-1]])
    np.testing.assert_array_equal(offs.reshape(8, 4)[:, 0], want_offs)
    want_prev = np.concatenate([[-7], chunks[:-1, -1]])
    np.testing.assert_array_equal(prevs.reshape(8, 4)[:, 0], want_prev)


def test_comm_model_matches_build():
    """The comm model's round count must match the actual build, and the
    volume arithmetic must be consistent with the stage count."""
    import jax

    from stringsearch_tpu.harness.corpus import enwik_like
    from stringsearch_tpu.parallel.comm_model import (
        global_build_comm,
        merge_split_stages,
        redistribute_bytes_per_device,
        sharded_sort_bytes_per_device,
    )
    from stringsearch_tpu.parallel.global_sa import build_global
    from stringsearch_tpu.parallel.mesh import make_mesh

    devs = jax.devices("cpu")
    if len(devs) < 4:
        import pytest

        pytest.skip("needs 4 virtual CPU devices")
    mesh = make_mesh(4, batch_axis=1, devices=devs)
    g = build_global(enwik_like(4000, seed=2), mesh)
    rep = g.comm_report()
    assert rep.rounds == g.rounds_run
    assert rep.p == 4 and rep.chunk_elems == g.chunk_len
    # volume arithmetic: one interval-routed (fan+1)-op round sort
    # (P=4 > 2 takes the a2a route) + one 2-op redistribute + (fan-1)
    # shift ppermutes of ONE chunk hop each in the typical h < L round
    s = merge_split_stages(4)
    assert s == 3
    from stringsearch_tpu.parallel.comm_model import (
        rank_interval_sort_bytes_per_device,
    )

    per_round = (
        (g.fan - 1) * g.chunk_len * 4
        + rank_interval_sort_bytes_per_device(4, g.chunk_len, g.fan + 1)
        + redistribute_bytes_per_device(4, g.chunk_len, 1)
    )
    assert rep.per_round_bytes == per_round
    # total = init + rounds * per_round + saturated-round extra hops
    assert rep.total_bytes >= rep.initial_bytes + rep.rounds * per_round
    # schedule-bound default must not underestimate the actual rounds
    bound = global_build_comm(g.n, 4, depth=g.depth, fan=g.fan)
    assert bound.rounds >= rep.rounds
    # projections are finite and sane
    assert 0 < rep.projected_efficiency(0.1, 45.0) < 1


@pytest.mark.parametrize("skewed", [False, True])
def test_redistribute_permutation_matches_sort(skewed):
    """The all_to_all redistribute must equal the merge-split sort result
    on both the fast path (uniform permutation) and the fallback
    (adversarially skewed: whole shards map to one destination, which
    overflows the per-pair capacity and trips the psum'd fallback)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from stringsearch_tpu.parallel.distsort import (
        redistribute_permutation,
        sharded_sort,
    )

    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    p, L = 4, 64
    n = p * L
    rng = np.random.default_rng(3 if skewed else 4)
    if skewed:
        # identity-ish permutation: every element stays on its own shard
        # -> one (src == dst) pair holds L > cap elements -> fallback
        perm = np.arange(n)
        perm[:L] = np.roll(perm[:L], 7)
    else:
        perm = rng.permutation(n)
    gidx = jnp.asarray(perm, jnp.int32)
    vals = jnp.asarray(rng.integers(0, 1 << 30, n), jnp.int32)
    mesh = Mesh(np.array(devs[:p]), ("parts",))

    def run_fast(g, v):
        return redistribute_permutation(g, (v,), "parts")

    def run_sort(g, v):
        return sharded_sort((g, v), "parts", num_keys=1)[1:]

    kw = dict(mesh=mesh, in_specs=(P("parts"), P("parts")),
              out_specs=(P("parts"),), check_vma=False)
    got = jax.jit(jax.shard_map(run_fast, **kw))(gidx, vals)[0]
    want = jax.jit(jax.shard_map(run_sort, **kw))(gidx, vals)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
