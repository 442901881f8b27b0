"""Query-path tests: LCS semantics + sa_search counting
(ref: crates/sacabase/src/lib.rs:39-99, c-sources/utils.c:244-325)."""

import numpy as np

import stringsearch_tpu as st


def naive_lcs_len(text: bytes, needle: bytes) -> int:
    """Longest prefix of needle occurring anywhere in text."""
    best = 0
    for k in range(len(needle), 0, -1):
        if needle[:k] in text:
            best = k
            break
    return best


def naive_count(text: bytes, needle: bytes) -> int:
    if not needle:
        return len(text)
    count = start = 0
    while True:
        i = text.find(needle, start)
        if i < 0:
            return count
        count += 1
        start = i + 1


TEXT = b"the quick brown fox jumps over the lazy dog; the quicker brown foxes"


def test_lcs_exact_semantics():
    sa = st.build_suffix_array(TEXT)
    for needle in [
        b"quick brown foxhound",
        b"the",
        b"zebra",
        b"dog; the quickest",
        b"e",
        b"\xff\xff",
        b"fox jumps over the lazy dog; the quicker brown foxes tail",
    ]:
        m = sa.longest_substring_match(needle)
        want = naive_lcs_len(TEXT, needle)
        assert m.len == want, (needle, m, want)
        assert m.as_bytes() == needle[: m.len]
        # the match must actually occur at the reported position
        assert TEXT[m.start : m.start + m.len] == needle[: m.len]


def test_lcs_randomized():
    rng = np.random.default_rng(3)
    text = bytes(rng.integers(0, 8, 400, dtype=np.uint8))
    sa = st.build_suffix_array(text)
    needles = [bytes(rng.integers(0, 8, int(rng.integers(1, 30)), dtype=np.uint8)) for _ in range(40)]
    matches = sa.longest_substring_match_batch(needles)
    for needle, m in zip(needles, matches):
        assert m.len == naive_lcs_len(text, needle), needle
        assert text[m.start : m.start + m.len] == needle[: m.len]


def test_sa_search_counts():
    sa = st.build_suffix_array(TEXT)
    for needle in [b"the", b"quick", b"fox", b"zebra", b"e", b" brown fox"]:
        cnt, left = sa.search(needle)
        assert cnt == naive_count(TEXT, needle), needle
        if cnt > 0:
            # every SA entry in [left, left+cnt) is a real occurrence
            host_sa = np.asarray(sa.sa)
            for k in range(cnt):
                pos = int(host_sa[left + k])
                assert TEXT[pos : pos + len(needle)] == needle


def test_sa_search_randomized():
    rng = np.random.default_rng(5)
    text = bytes(rng.integers(0, 4, 600, dtype=np.uint8))
    sa = st.build_suffix_array(text)
    from stringsearch_tpu.core.search import sa_search_batch

    needles = [bytes(rng.integers(0, 4, int(rng.integers(1, 9)), dtype=np.uint8)) for _ in range(50)]
    for needle, (cnt, _left) in zip(needles, sa_search_batch(sa, needles)):
        assert cnt == naive_count(text, needle), needle


def test_needle_longer_than_text():
    text = b"abc"
    sa = st.build_suffix_array(text)
    m = sa.longest_substring_match(b"abcdefgh")
    assert m.len == 3 and m.start == 0


def test_common_prefix_len_long_match():
    # match longer than the default window must still be exact
    text = b"x" * 5000 + b"y" + b"x" * 5000
    lcp = st.common_prefix_len(text, 0, 5001)
    assert int(lcp) == 5000  # suffix at 5001 is pure x's and ends first
    lcp2 = st.common_prefix_len(text, 0, 1)
    assert int(lcp2) == 4999  # 'y' breaks the run one byte earlier


def test_sa_simplesearch_matches_oracle():
    from stringsearch_tpu import oracle
    from stringsearch_tpu.core.search import sa_simplesearch

    rng = np.random.default_rng(31)
    text = bytes(rng.integers(0, 5, 300, dtype=np.uint8))
    idx = st.build_suffix_array(text)
    c_sa = oracle.build(text)
    for c in range(7):
        t_cnt, t_left = sa_simplesearch(idx, c)
        c_cnt, c_left = oracle.simplesearch(text, c, c_sa)
        assert t_cnt == c_cnt == text.count(bytes([c])), c
        if t_cnt:
            assert t_left == c_left
