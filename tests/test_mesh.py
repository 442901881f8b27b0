"""Multi-device mesh path tests on the 8-way virtual CPU mesh
(sharded sacapart equivalent + driver entry contract)."""

import jax
import numpy as np
import pytest

import stringsearch_tpu as st
from stringsearch_tpu.parallel.mesh import ShardedSuffixArray, make_mesh


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return make_mesh(8, batch_axis=2, devices=devs)


def test_sharded_matches_full(mesh8):
    text = b"it is time, gentlemen; time to go home, time to sleep, time flies"
    idx = ShardedSuffixArray(text, mesh8)
    assert idx.num_partitions() == 4
    full = st.build_suffix_array(text)
    needles = [b"time to", b"gentle", b"sleep, time flies away", b"zzz", b"t"]
    got = [m.len for m in idx.longest_substring_match_batch(needles)]
    want = [full.longest_substring_match(nd).len for nd in needles]
    assert got == want
    for nd, m in zip(needles, idx.longest_substring_match_batch(needles)):
        assert text[m.start : m.start + m.len] == nd[: m.len]


def test_sharded_random(mesh8):
    rng = np.random.default_rng(21)
    text = bytes(rng.integers(0, 16, 777, dtype=np.uint8))
    idx = ShardedSuffixArray(text, mesh8)
    full = st.build_suffix_array(text)
    needles = [
        bytes(rng.integers(0, 16, int(rng.integers(1, 20)), dtype=np.uint8))
        for _ in range(11)  # odd count exercises batch padding
    ]
    got = idx.longest_substring_match_batch(needles)
    want = full.longest_substring_match_batch(needles)
    for nd, g, w in zip(needles, got, want):
        assert g.len == w.len, nd
        assert text[g.start : g.start + g.len] == nd[: g.len]


def test_graft_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    sa, isa = jax.jit(fn)(*args)
    assert sa.shape == args[0].shape
    g.dryrun_multichip(8)
    g.dryrun_multichip(4)
