"""Verification oracle tests (ref: crates/sacabase/src/lib.rs:127-149 verify,
c-sources/utils.c:160-241 sufcheck)."""

import numpy as np
import pytest

import stringsearch_tpu as st
from stringsearch_tpu.core.types import NotSorted
from stringsearch_tpu.core.verify import is_valid, verify
from tests.conftest import naive_suffix_array


def test_accepts_correct_sa():
    data = b"mississippi"
    verify(data, naive_suffix_array(data))


def test_rejects_swapped_entries():
    data = b"mississippi"
    sa = naive_suffix_array(data)
    sa[3], sa[4] = sa[4], sa[3]
    with pytest.raises(NotSorted):
        verify(data, sa)


def test_rejects_non_permutation():
    data = b"abcabc"
    sa = naive_suffix_array(data)
    sa[0] = sa[1]
    with pytest.raises(NotSorted):
        verify(data, sa)


def test_rejects_identity_on_unsorted_text():
    data = b"zyxw"
    with pytest.raises(NotSorted):
        verify(data, np.arange(4, dtype=np.int32))


def test_rejects_subtle_rank_violation():
    # equal first chars, wrong recursive order: "aa" -> correct [1,0]
    with pytest.raises(NotSorted):
        verify(b"aa", np.asarray([0, 1], np.int32))


def test_is_valid_jit_scalar():
    data = b"banana"
    sa = naive_suffix_array(data)
    from stringsearch_tpu.core.types import as_text_array
    import jax.numpy as jnp

    assert bool(is_valid(as_text_array(data), jnp.asarray(sa)))
    bad = sa.copy()
    bad[[0, 1]] = bad[[1, 0]]
    assert not bool(is_valid(as_text_array(data), jnp.asarray(bad)))


def test_empty_ok():
    verify(b"", np.zeros(0, np.int32))


def test_exhaustive_small_permutations():
    # every wrong permutation of a 5-char text must be rejected
    import itertools

    data = b"abab" + b"a"
    want = naive_suffix_array(data).tolist()
    for perm in itertools.permutations(range(5)):
        p = list(perm)
        if p == want:
            verify(data, np.asarray(p, np.int32))
        else:
            with pytest.raises(NotSorted):
                verify(data, np.asarray(p, np.int32))
