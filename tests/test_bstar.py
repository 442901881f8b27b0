"""Tests for the B*-reduction engine (engines/bstar.py).

Layered like the reference's differential strategy: phase-level checks
against a tiny independent model (the classification scan of
ref crates/divsufsort/src/divsufsort.rs:64-121 written in numpy),
full-build conformance against brute force and the C++ oracle, and the
committed corpus replay.

Shapes are deliberately reused across cases (the fused build is one jit
compile per shape; distinct shapes are the expensive part of this file).
"""

import numpy as np
import pytest

FIXED_N = 311  # one compile for all random cases


def _np_classify(t: np.ndarray):
    """Reference model of A/B/B* classification (right-to-left scan,
    ref: crates/divsufsort/src/divsufsort.rs:64-121)."""
    n = len(t)
    tb = np.zeros(n, bool)
    for i in range(n - 2, -1, -1):
        tb[i] = t[i] < t[i + 1] or (t[i] == t[i + 1] and tb[i + 1])
    bs = np.zeros(n, bool)
    if n > 1:
        bs[:-1] = tb[:-1] & ~tb[1:]
    return tb, bs


def _rand_cases(seed=7, count=12):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(count):
        k = int(rng.integers(1, 6))
        out.append(rng.integers(0, 1 << (2 * k), FIXED_N)
                   .astype(np.uint8).tobytes())
    return out


SPECIALS = [
    b"aacb", b"abracadabra", b"mississippi", b"aaaaaaaa", b"abcabcabc",
    b"zyxwv", b"abababab", b"aabaabaab", b"\x00\x00\x01\x00",
    b"\xff\xfe\xff\xff\xff", bytes(range(250)) + bytes([0]),
    b"a" * 60 + b"b" + b"a" * 50 + b"b",
]


@pytest.mark.parametrize("case", SPECIALS + _rand_cases(count=4))
def test_classify_matches_reference_model(case):
    import jax.numpy as jnp

    from stringsearch_tpu.engines import bstar as B

    t = np.frombuffer(case, np.uint8)
    seg_end, type_b, bs = B._classify(jnp.asarray(t))
    tb_ref, bs_ref = _np_classify(t)
    assert np.array_equal(np.asarray(type_b), tb_ref)
    assert np.array_equal(np.asarray(bs), bs_ref)


def test_reduced_bstar_order_brute_force():
    """Sorted B* from the reduced problem == brute-force suffix order
    restricted to B* positions (the sort_typeBstar contract,
    ref: crates/divsufsort/src/divsufsort.rs:45-354)."""
    import jax.numpy as jnp

    from stringsearch_tpu.engines import bstar as B

    for case in SPECIALS[:6] + _rand_cases(seed=3, count=4):
        t = np.frombuffer(case, np.uint8)
        if len(t) < 3:
            continue
        _, _, bs = B._classify(jnp.asarray(t))
        p, m = B._extract_bstar(jnp.asarray(np.asarray(bs)))
        m_i = int(m)
        pos = np.asarray(p)[:m_i]
        red = B._name_and_rank(jnp.asarray(t), p, m)
        sa_red, _ = B._redsolve(red, jnp.int32, 6, (4, 32, 256), 4)
        cap = int(p.shape[0])
        got = [int(pos[k]) for k in np.asarray(sa_red)[cap - m_i:]]
        ref = sorted(pos.tolist(), key=lambda i: t[i:].tobytes())
        assert got == ref, case


@pytest.mark.parametrize("case", SPECIALS + _rand_cases(count=12))
def test_full_build_brute_force(case):
    from stringsearch_tpu.engines import bstar as B

    t = np.frombuffer(case, np.uint8)
    sa = B.sort(t)
    ref = sorted(range(len(t)), key=lambda i: t[i:].tobytes())
    assert [int(x) for x in np.asarray(sa.sa)] == ref, case


def test_short_inputs_delegate():
    from stringsearch_tpu.engines import bstar as B

    for case in (b"", b"a", b"ab", b"ba", b"aa"):
        sa = B.sort(case)
        ref = sorted(range(len(case)), key=lambda i: case[i:])
        assert [int(x) for x in np.asarray(sa.sa)] == ref


def test_oracle_conformance_enwik():
    """Byte-exact vs the trusted C++ oracle on realistic text."""
    from stringsearch_tpu import oracle
    from stringsearch_tpu.engines import bstar as B
    from stringsearch_tpu.harness.corpus import enwik_like

    data = enwik_like(1 << 13)
    want = oracle.build(data)
    sa = B.sort(data)
    sa.verify()
    assert np.array_equal(np.asarray(sa.sa), want)
