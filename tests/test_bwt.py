"""BWT layer tests: TPU forward/inverse, oracle cross-check, round-trips
(ref capabilities: c-sources/divsufsort.c divbwt/construct_BWT,
utils.c bw_transform/inverse_bw_transform)."""

import numpy as np

from stringsearch_tpu import oracle
from stringsearch_tpu.transforms import bwt, divbwt, unbwt


def test_bwt_matches_oracle(corpus):
    for name, data in corpus.items():
        if not data:
            continue
        u_t, pidx_t = divbwt(data)
        u_c, pidx_c = oracle.bwt(data)
        assert u_t == u_c, f"bwt mismatch on {name!r}"
        assert pidx_t == pidx_c, f"pidx mismatch on {name!r}"


def test_roundtrip_tpu_both_ways(corpus):
    for name, data in corpus.items():
        u, pidx = divbwt(data)
        assert unbwt(u, pidx) == data, f"tpu roundtrip failed on {name!r}"


def test_cross_roundtrip():
    """TPU forward + oracle inverse and vice versa — conventions must agree."""
    rng = np.random.default_rng(2)
    data = bytes(rng.integers(0, 256, 3000, dtype=np.uint8))
    u_t, pidx_t = divbwt(data)
    assert oracle.unbwt(u_t, pidx_t) == data
    u_c, pidx_c = oracle.bwt(data)
    assert unbwt(u_c, pidx_c) == data


def test_banana():
    u, pidx = divbwt(b"banana")
    assert u == b"annbaa" and pidx == 3


def test_empty_and_single():
    assert divbwt(b"") == (b"", 0)
    assert unbwt(b"", 0) == b""
    u, pidx = divbwt(b"z")
    assert unbwt(u, pidx) == b"z"
