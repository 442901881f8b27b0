"""Partitioned / sharded suffix arrays (ref: crates/sacapart)."""
