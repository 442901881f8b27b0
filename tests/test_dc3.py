"""DC3 engine tests — complete where the reference's dc3 is knowingly
incomplete (ref: crates/dc3/README.md:4, disabled assertion at
crates/dc3/src/lib.rs:216-217). Includes the three-way engine crosscheck."""

import numpy as np

import stringsearch_tpu as st
from stringsearch_tpu import oracle
from stringsearch_tpu.engines import dc3
from tests.conftest import naive_suffix_array


def test_dc3_parity_small(corpus):
    for name, data in corpus.items():
        if len(data) > 1024:
            continue
        got = np.asarray(dc3.sort(data).sa)
        assert np.array_equal(got, naive_suffix_array(data)), name


def test_dc3_mod3_boundaries():
    # all three n % 3 residues around a recursion-heavy input
    rng = np.random.default_rng(8)
    for n in (99, 100, 101, 102, 103):
        data = bytes(rng.integers(0, 3, n, dtype=np.uint8))
        got = np.asarray(dc3.sort(data).sa)
        assert np.array_equal(got, naive_suffix_array(data)), n


def test_three_way_crosscheck():
    """doubling vs dc3 vs C++ oracle — three independent algorithms, one
    unique answer (the in-framework analog of divsuftest crosscheck)."""
    rng = np.random.default_rng(55)
    for n, alpha in [(500, 2), (1000, 256), (2000, 4)]:
        data = bytes(rng.integers(0, alpha, n, dtype=np.uint8))
        a = np.asarray(st.build_suffix_array(data, engine="doubling").sa)
        b = np.asarray(dc3.sort(data).sa)
        c = oracle.build(data)
        assert np.array_equal(a, b), (n, alpha)
        assert np.array_equal(b, c), (n, alpha)


def test_dc3_engine_registry():
    sa = st.build_suffix_array(b"banana", engine="dc3")
    assert np.asarray(sa.sa).tolist() == [5, 3, 1, 0, 4, 2]
    sa.verify()


def test_dc3_deep_recursion():
    # fibonacci-like strings force deep DC3 recursion (few distinct names)
    a, b = b"a", b"ab"
    for _ in range(12):
        a, b = b, b + a
    data = b[:800]
    got = np.asarray(dc3.sort(data).sa)
    assert np.array_equal(got, naive_suffix_array(data))
