"""Replay the committed regression corpus through every engine.

The reference commits its fuzz-found crashers under
crates/divsufsort/src/testdata/ and replays each as a unit test that
sorts AND verifies (ref: crates/divsufsort/src/lib.rs:31-92). Here
tests/corpus/ holds (a) inputs that exposed real bugs during this
framework's development — the all-zero texts that stalled the raw-byte
marker protocol, trailing-zero pads, run/period patterns — and (b)
anything the fuzz campaign (harness/fuzz.py) finds, committed under the
same crash-<sha1> naming the reference uses. Every file is replayed
through both device engines and compared byte-exact to the C++ oracle.
"""

import os

import numpy as np
import pytest

CORPUS_DIR = os.path.join(os.path.dirname(__file__), "corpus")
CASES = sorted(os.listdir(CORPUS_DIR))


def _load(name: str) -> bytes:
    with open(os.path.join(CORPUS_DIR, name), "rb") as f:
        return f.read()


@pytest.mark.parametrize("name", CASES)
@pytest.mark.parametrize("engine", ["doubling", "dc3", "bstar"])
def test_corpus_replay(name, engine):
    from stringsearch_tpu import oracle
    from stringsearch_tpu.engines import get_engine

    data = _load(name)
    want = oracle.build(data)
    assert oracle.sufcheck(data, want) == 0
    sa = get_engine(engine)(data)
    sa.verify()
    assert np.array_equal(np.asarray(sa.sa), want), f"{engine} vs oracle on {name}"


@pytest.mark.parametrize("name", [c for c in CASES if 64 <= len(_load(c))])
def test_corpus_replay_global(name, cpu_devices):
    """The distributed global engine replays the corpus too (8-dev mesh)."""
    import jax
    from jax.sharding import Mesh

    from stringsearch_tpu import oracle
    from stringsearch_tpu.parallel.global_sa import build_global

    data = _load(name)
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("parts",))
    got = np.asarray(build_global(data, mesh).suffix_array())
    assert np.array_equal(got, oracle.build(data)), f"global vs oracle on {name}"
