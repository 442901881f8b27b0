"""Harness layer: CLI, bench, tracing, corpus (ref: crates/divsuftest)."""
