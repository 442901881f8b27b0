"""Distributed gather (parallel/gather.py) on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stringsearch_tpu.parallel.gather import sharded_gather, sharded_gather_windows


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return Mesh(np.array(devs[:8]), ("parts",))


def _run(mesh, fn, *args, specs):
    return jax.jit(
        jax.shard_map(fn, mesh=mesh, in_specs=specs,
                      out_specs=P("parts"), check_vma=False)
    )(*args)


def test_gather_random(mesh8):
    rng = np.random.default_rng(3)
    n, m_per = 8 * 40, 8 * 16
    values = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, n, m_per).astype(np.int32))
    values = jax.device_put(values, NamedSharding(mesh8, P("parts")))
    idx_sh = jax.device_put(idx, NamedSharding(mesh8, P("parts")))
    out = _run(mesh8, lambda v, i: sharded_gather(v, i, "parts"),
               values, idx_sh, specs=(P("parts"), P("parts")))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(values)[np.asarray(idx)])


def test_gather_skewed_all_one_owner(mesh8):
    """Worst case: every request targets one shard — capacity must hold."""
    n, m_per = 8 * 32, 8 * 8
    values = jnp.arange(n, dtype=jnp.int32) * 7
    idx = jnp.full((m_per,), 5, jnp.int32)  # all hit shard 0
    values = jax.device_put(values, NamedSharding(mesh8, P("parts")))
    idx_sh = jax.device_put(idx, NamedSharding(mesh8, P("parts")))
    out = _run(mesh8, lambda v, i: sharded_gather(v, i, "parts"),
               values, idx_sh, specs=(P("parts"), P("parts")))
    np.testing.assert_array_equal(np.asarray(out), np.full((m_per,), 35))


def test_gather_windows_cross_boundary(mesh8):
    rng = np.random.default_rng(4)
    n = 8 * 64
    values = jnp.asarray(rng.integers(0, 256, n).astype(np.int32))
    starts = jnp.asarray([0, 62, 63, 64, 200, n - 3], dtype=jnp.int32)
    starts = jnp.tile(starts, 8)[: 8 * 6]  # 6 per shard
    values_sh = jax.device_put(values, NamedSharding(mesh8, P("parts")))
    starts_sh = jax.device_put(starts, NamedSharding(mesh8, P("parts")))
    w = 5
    out = jax.jit(
        jax.shard_map(
            lambda v, s: sharded_gather_windows(v, s, w, "parts"),
            mesh=mesh8, in_specs=(P("parts"), P("parts")),
            out_specs=P("parts"), check_vma=False)
    )(values_sh, starts_sh)
    host = np.asarray(values)
    got = np.asarray(out)
    for b, s in enumerate(np.asarray(starts)):
        want = host[np.minimum(np.arange(s, s + w), n - 1)]
        np.testing.assert_array_equal(got[b], want, err_msg=f"start={s}")
