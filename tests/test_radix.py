"""Radix-partition probe kernels: correctness via Pallas interpret mode.

The kernels target TPU (the round-5 decision experiment on the last
unmeasured primitive — see ops/radix.py); interpret mode executes the
same grid / BlockSpec / kernel logic on CPU, so histogram, rank, local
ordering, and DMA-placement mistakes all surface without a chip. The
on-hardware numbers live in BENCH_DETAIL.json (radix_partition_probe).
"""

import numpy as np

from stringsearch_tpu.ops import radix


def test_block_histograms():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 32, 8 * 1024, dtype=np.uint32)
    assert radix.check_histogram(keys, tile=1024, interpret=True)


def test_block_histograms_low_byte():
    rng = np.random.default_rng(8)
    keys = rng.integers(0, 1 << 32, 8 * 1024, dtype=np.uint32)
    assert radix.check_histogram(keys, tile=1024, shift=0,
                                 interpret=True)


def test_local_group_random():
    rng = np.random.default_rng(9)
    keys = rng.integers(0, 1 << 32, 8 * 1024, dtype=np.uint32)
    pay = rng.integers(0, 1 << 31, 8 * 1024, dtype=np.int32)
    assert radix.check_local_group(keys, pay, tile=1024, interpret=True)


def test_local_group_skewed_bins():
    # all mass in two bins: exercises empty-bin local_base runs
    rng = np.random.default_rng(10)
    top = rng.choice(np.asarray([3, 250], np.uint32), 8 * 1024)
    keys = (top << np.uint32(24)) | rng.integers(
        0, 1 << 24, 8 * 1024, dtype=np.uint32)
    pay = np.arange(8 * 1024, dtype=np.int32)
    assert radix.check_local_group(keys, pay, tile=1024, interpret=True)


def test_granule_flush_layouts():
    assert radix.check_granule_flush(2048, 128, 1024, interpret=True)
    assert radix.check_granule_flush(1024, 1024, 1024, interpret=True)
