"""Pallas bitonic sort: correctness vs lax.sort (interpret mode on CPU).

The kernel itself targets TPU; interpret mode executes the same grid /
BlockSpec / kernel logic through the Pallas interpreter, so index-map
mistakes, direction-mask mistakes, and comparator mistakes all surface
here without a chip.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stringsearch_tpu.ops.bitonic import pallas_sort

# tiny tiles: exercises the cross-block kernels at test sizes and keeps
# interpret-mode graphs small enough for CPU XLA to compile quickly
os.environ.setdefault("STRINGSEARCH_TPU_PALLAS_TILE", "256")


def _ref_sorted(ops, num_keys):
    return jax.lax.sort(tuple(ops), num_keys=num_keys)


def _check(ops, num_keys):
    got = pallas_sort(tuple(ops), num_keys=num_keys, interpret=True)
    want = _ref_sorted(ops, num_keys)
    # keys must match exactly
    for i in range(num_keys):
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(want[i]))
    # payloads: compare as multisets within each tied key block (the
    # pallas network is not stable). With unique keys, exact equality.
    keys = np.stack([np.asarray(want[i]).astype(np.int64) for i in range(num_keys)])
    unique = np.unique(keys, axis=1).shape[1] == keys.shape[1]
    for i in range(num_keys, len(ops)):
        if unique:
            np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(want[i]))
        else:
            np.testing.assert_array_equal(
                np.sort(np.asarray(got[i])), np.sort(np.asarray(want[i]))
            )


@pytest.mark.parametrize("n", [1 << 10, (1 << 11) + 37])
def test_kv_random(n):
    k = jax.random.randint(jax.random.PRNGKey(0), (n,), -(1 << 30), 1 << 30,
                           jnp.int32)
    v = jnp.arange(n, dtype=jnp.int32)
    _check((k, v), 1)


def test_unsigned_keys():
    n = 1 << 11
    k = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, 1 << 16,
                           jnp.int32).astype(jnp.uint32) << 16
    v = jnp.arange(n, dtype=jnp.int32)
    _check((k, v), 1)


def test_multikey_with_payload():
    n = 1 << 11
    k1 = jax.random.randint(jax.random.PRNGKey(2), (n,), 0, 8, jnp.int32)
    k2 = jax.random.randint(jax.random.PRNGKey(3), (n,), -5, 5, jnp.int32)
    j = jnp.arange(n, dtype=jnp.int32)
    # include j as final key: unique tuples -> exact parity incl. payload
    _check((k1, k2, j), 3)


def test_six_keys():
    n = 1 << 11
    ks = [
        jax.random.randint(jax.random.PRNGKey(10 + i), (n,), 0, 4, jnp.int32)
        for i in range(5)
    ]
    j = jnp.arange(n, dtype=jnp.int32)
    _check(tuple(ks) + (j,), 6)


def test_all_equal_keys():
    n = 1 << 11
    k = jnp.zeros((n,), jnp.int32)
    v = jnp.arange(n, dtype=jnp.int32)
    _check((k, v), 1)


def test_descending_and_sentinels():
    n = 1 << 11
    k = jnp.concatenate([
        jnp.full((n // 2,), np.iinfo(np.int32).max, jnp.int32),
        -jnp.arange(n // 2, dtype=jnp.int32),
    ])
    v = jnp.arange(n, dtype=jnp.int32)
    _check((k, v), 1)


def test_engine_parity_interpret(monkeypatch):
    """Whole doubling build with every sort on the Pallas path."""
    monkeypatch.setenv("STRINGSEARCH_TPU_PALLAS", "interpret")
    import stringsearch_tpu as st
    from tests.conftest import naive_suffix_array

    rng = np.random.default_rng(5)
    data = bytes(rng.integers(0, 4, 1 << 10, dtype=np.uint8).tobytes())
    sa = st.build_suffix_array(data, engine="doubling")
    np.testing.assert_array_equal(np.asarray(sa.sa), naive_suffix_array(data))
