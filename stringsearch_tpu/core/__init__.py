"""Core types and device-resident suffix-array primitives (ref: crates/sacabase)."""
