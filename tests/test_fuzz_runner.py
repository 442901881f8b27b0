"""Differential fuzz runner smoke test (ref: cargo-fuzz target,
crates/divsufsort/fuzz/fuzz_targets/fuzz_target_1.rs)."""

import numpy as np

from stringsearch_tpu.harness import fuzz


def test_fuzz_runner_clean(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = fuzz.main(["--iters", "8", "--max-len", "300", "--seed", "42"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "0 failures" in out


def test_mutation_strategies_cover_patterns():
    rng = np.random.default_rng(1)
    seen = set()
    for _ in range(60):
        data = fuzz._mutate(rng, 256)
        assert 1 <= len(data) <= 256
        seen.add(len(set(data)) <= 4)  # low-alphabet strategies appear
    assert True in seen and False in seen
