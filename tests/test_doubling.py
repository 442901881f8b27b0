"""Doubling-engine conformance: parity vs naive oracle + verify property.

Mirrors the reference's test strategy of fuzz-derived regression inputs,
each sorted and then *verified* (ref: crates/divsufsort/src/lib.rs:31-92,
the sort helper verifies at lib.rs:88-91) — property checking, not golden
files.
"""

import numpy as np
import pytest

import stringsearch_tpu as st
from tests.conftest import naive_suffix_array


def test_regression_corpus_parity(corpus):
    for name, data in corpus.items():
        sa = st.build_suffix_array(data, engine="doubling")
        got = np.asarray(sa.sa)
        if len(data) <= 2048:
            want = naive_suffix_array(data)
            assert np.array_equal(got, want), f"corpus case {name!r} mismatch"
        sa.verify()


def test_random_fuzz_parity():
    rng = np.random.default_rng(42)
    for trial in range(30):
        n = int(rng.integers(1, 300))
        alpha = int(rng.choice([1, 2, 4, 16, 256]))
        data = bytes(rng.integers(0, alpha, n, dtype=np.uint8))
        sa = st.build_suffix_array(data)
        want = naive_suffix_array(data)
        assert np.array_equal(np.asarray(sa.sa), want), (trial, n, alpha)
        sa.verify()


@pytest.mark.parametrize("extract", ["sort", "topk"])
@pytest.mark.parametrize("adaptive", [False, True])
def test_extract_variants_parity(corpus, extract, adaptive):
    """Both extract implementations and both cascade-entry modes must be
    byte-identical: extraction order is pinned by (stable sort == top_k's
    ascending-index tie-break), and the adaptive switch only skips
    no-op extract/shrink passes. The pin holds only on the default
    stable lax.sort path — under STRINGSEARCH_TPU_PALLAS=1 the unstable
    device_sort may permute tied-group members (immaterial downstream)."""
    import os

    if os.environ.get("STRINGSEARCH_TPU_PALLAS"):
        pytest.skip("extract-variant byte-parity is pinned to the stable "
                    "lax.sort path; the Pallas device_sort is unstable")
    from stringsearch_tpu.engines.doubling import build_with_isa

    rng = np.random.default_rng(7)
    cases = [data for data in corpus.values() if 3 <= len(data) <= 1500]
    cases += [bytes(rng.integers(0, a, 700, dtype=np.uint8))
              for a in (2, 4, 256)]
    for data in cases:
        arr = np.frombuffer(data, dtype=np.uint8)
        # shallow depth + tight levels force the compaction machinery on
        sa, isa = build_with_isa(arr, depth=4, levels=(2, 8, 64), fan=2,
                                 extract=extract, adaptive=adaptive)
        want = naive_suffix_array(data)
        assert np.array_equal(np.asarray(sa), want), (extract, adaptive,
                                                      data[:40])
        # the returned isa must be the exact inverse permutation
        assert np.array_equal(np.asarray(isa)[np.asarray(sa)],
                              np.arange(len(data))), (extract, adaptive)


def test_short_inputs():
    for data, want in [
        (b"", []),
        (b"x", [0]),
        (b"ab", [0, 1]),
        (b"ba", [1, 0]),
        (b"aa", [1, 0]),
    ]:
        sa = st.build_suffix_array(data)
        assert np.asarray(sa.sa).tolist() == want, data
        sa.verify()


def test_sort_in_place_api():
    from stringsearch_tpu.engines.doubling import sort_in_place

    data = b"banana"
    out = np.zeros(len(data), dtype=np.int32)
    sort_in_place(data, out)
    assert out.tolist() == [5, 3, 1, 0, 4, 2]


def test_length_guard(monkeypatch):
    # the i32 index path must refuse n >= 2^31 BEFORE allocating device
    # state (ref guard: crates/divsufsort/src/lib.rs:10-13); stub the text
    # coercion so the guard runs without a 2 GB allocation
    from stringsearch_tpu.engines import doubling

    class FakeText:
        shape = (1 << 31,)

    monkeypatch.setattr(doubling, "as_text_array", lambda t: FakeText())
    with pytest.raises(ValueError, match="2\\^31"):
        doubling.sort(b"irrelevant")


def test_rejects_wrong_dtype():
    with pytest.raises(TypeError):
        st.build_suffix_array(np.zeros(0, dtype=np.int16))


def test_build_sa_equals_build_with_isa():
    """The ISA-free lazy-invert path must produce the identical SA on
    both exit routes: resolved-in-full-rounds (text-like) and the
    compacted tail (adversarial small alphabet)."""
    from stringsearch_tpu.engines.doubling import build_sa, build_with_isa

    rng = np.random.default_rng(77)
    cases = [
        bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),  # resolves early
        bytes(rng.integers(0, 2, 3000, dtype=np.uint8)),    # compact tail
        b"ab" * 1500,
    ]
    for data in cases:
        arr = np.frombuffer(data, dtype=np.uint8)
        sa_only = build_sa(arr, depth=4, fan=2, levels=(2, 16))
        sa, isa = build_with_isa(arr, depth=4, fan=2, levels=(2, 16))
        assert np.array_equal(np.asarray(sa_only), np.asarray(sa))
        assert np.array_equal(np.asarray(isa)[np.asarray(sa)],
                              np.arange(len(data)))
