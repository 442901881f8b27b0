"""Partition-semantics tests (ref: crates/sacapart/src/lib.rs:100-166).

The reference pins two behaviors:
- `worse_test` (:106-126): a match crossing a partition boundary may degrade
  — but our full-text repair recovers it, so we pin the *stronger* behavior.
- `equivalent_test` (:129-165): partitioned results equal full-index results
  across 1/2/3 partitions.
"""

import numpy as np

import stringsearch_tpu as st


def test_boundary_match_repaired():
    # ref worse_test: text "I am at the. tor house" split in 2 at 'tor';
    # the reference degrades to "to" — our repair recovers the full "tor".
    text = b"I am at the. tor house"
    p = st.PartitionedSuffixArray(text, 2)
    m = p.longest_substring_match(b"tor")
    assert m.len == 3
    assert m.as_bytes() == b"tor"


def test_equivalent_across_partition_counts():
    text = b"it is time, gentlemen; time to go home, time to sleep, time flies"
    full = st.build_suffix_array(text)
    needles = [b"time to", b"gentle", b"sleep, time flies away", b"zzz", b"t"]
    want = [full.longest_substring_match(nd).len for nd in needles]
    for parts in (1, 2, 3, 4, 7):
        p = st.PartitionedSuffixArray(text, parts)
        got = [p.longest_substring_match(nd).len for nd in needles]
        assert got == want, (parts, got, want)
        for nd in needles:
            m = p.longest_substring_match(nd)
            assert text[m.start : m.start + m.len] == nd[: m.len]


def test_non_divisible_lengths_and_padding():
    rng = np.random.default_rng(11)
    text = bytes(rng.integers(0, 8, 101, dtype=np.uint8))
    full = st.build_suffix_array(text)
    for parts in (2, 3, 4):
        p = st.PartitionedSuffixArray(text, parts)
        for _ in range(10):
            start = int(rng.integers(0, 95))
            ln = int(rng.integers(1, 7))
            needle = text[start : start + ln]
            m = p.longest_substring_match(needle)
            f = full.longest_substring_match(needle)
            assert m.len == f.len == len(needle), (parts, needle)
            assert text[m.start : m.start + m.len] == needle


def test_padding_never_matches_fake_bytes():
    # needle of zero bytes must not match inside the padded tail
    text = b"abcdefg"  # 7 bytes, 2 partitions -> pad 1 zero
    p = st.PartitionedSuffixArray(text, 2)
    m = p.longest_substring_match(b"\x00\x00")
    assert m.len == 0


def test_num_partitions_accessor():
    p = st.PartitionedSuffixArray(b"hello world", 3)
    assert p.num_partitions() == 3


def test_batched_queries():
    text = b"abcabcabd" * 30
    p = st.PartitionedSuffixArray(text, 4)
    needles = [b"abcabd", b"bd" * 3, b"xyz"]
    ms = p.longest_substring_match_batch(needles)
    assert ms[0].len == 6
    assert ms[2].len == 0


def test_zero_needle_pad_suffix_regression():
    """Fuzz-found (r3): with a padded last chunk, the all-zero pad
    suffixes occupy the first SA slots and hijacked the binary-search
    candidate for zero-leading needles, and pad zeros inflated
    chunk-space match lengths near the chunk end — both losing real
    in-partition matches. Replays the committed crasher and pins the
    invariant: any needle with an in-partition optimal occurrence gets
    the full-index match length."""
    import os

    from stringsearch_tpu import PartitionedSuffixArray, build_suffix_array
    from stringsearch_tpu.harness.fuzz import _check_partitioned

    path = os.path.join(
        os.path.dirname(__file__), "corpus",
        "crash-5dda27cbb7c0dab35e49099e851dbc00edc1a4fe",
    )
    with open(path, "rb") as f:
        data = f.read()
    assert _check_partitioned(data) is None
    full = build_suffix_array(data)
    part = PartitionedSuffixArray(data, 2)
    for nd in (b"\x00", b"\x00\x00", b"\x00\x00\x00"):
        got = part.longest_substring_match(nd)
        want = full.longest_substring_match(nd)
        assert got.len == want.len, nd
        assert data[got.start : got.start + got.len] == nd[: got.len]


def test_partitioned_sa_search_counts():
    """In-partition counts: equal to the brute-force per-partition count,
    <= the full-text count, equal when no occurrence crosses a boundary."""
    rng = np.random.default_rng(77)
    text = bytes(rng.integers(0, 4, 600, dtype=np.uint8))
    for nparts in (1, 2, 3, 4):
        p = st.PartitionedSuffixArray(text, nparts)
        psize = p.partition_size
        needles = [text[i : i + k] for i, k in
                   [(5, 2), (100, 3), (0, 1), (250, 6), (590, 10)]]
        needles += [b"\x05\x06", b"\x00", b"\x03\x03\x03"]
        got = p.sa_search_batch(needles)
        for nd, (count, first) in zip(needles, got):
            want_pos = []
            s = text.find(nd)
            while s != -1:
                if s // psize == (s + len(nd) - 1) // psize:
                    want_pos.append(s)
                s = text.find(nd, s + 1)
            assert count == len(want_pos), (nparts, nd, count, len(want_pos))
            if want_pos:
                assert first == min(want_pos), (nparts, nd, first)
            else:
                assert first == -1


def test_partitioned_sa_search_pad_duplicates_not_counted():
    """The last partition's pad slots duplicate its smallest real
    suffix; those duplicates must not inflate counts."""
    text = b"aaaa aaaa aa"  # 12 bytes -> parts of 5/5/2 with 3 pad slots
    p = st.PartitionedSuffixArray(text, 3)
    count, first = p.sa_search(b"a")
    assert count == text.count(b"a")
    assert first == 0
    count, first = p.sa_search(b"aa")
    want = sum(
        1 for s in range(len(text) - 1)
        if text[s : s + 2] == b"aa"
        and s // p.partition_size == (s + 1) // p.partition_size
    )
    assert count == want


def test_partitioned_simplesearch_matches_full_text():
    rng = np.random.default_rng(3)
    text = bytes(rng.integers(0, 256, 500, dtype=np.uint8))
    p = st.PartitionedSuffixArray(text, 4)
    for c in (0, 65, 255, text[0]):
        count, first = p.sa_simplesearch(c)
        assert count == text.count(bytes([c]))
        if count:
            assert first == text.find(bytes([c]))
        else:
            assert first == -1
