"""Unit tests for the FST core: builder invariants, reader traversal,
bounds — re-expressing the reference's fst_unittest semantics
(/root/reference/src/main/fst/fst/fst_core/test/fst_unittest.cpp) plus
the FIXTURES.md F4/F6 assertions."""

from __future__ import annotations

import random

import pytest

from orchid_fst_ray.fst import (
    Bound, Fst, FstBuilder, PrefixAutomaton, StrAutomaton, build_fst,
)

# README example dictionary (reference README.md:35-45) — map semantics
# with output redistribution (fst.cpp:146-159, 506, 517).
KV = sorted([
    ("", 10000), ("中国", 100), ("中国人", 50), ("中国人民", 40),
    ("中国心", 10), ("北七", 3), ("北七家", 10), ("北京", 5), ("北平", 2),
])


def test_map_roundtrip_values():
    fst = build_fst([k for k, _ in KV], [v for _, v in KV])
    for k, v in KV:
        assert fst.get(k) == v
    assert fst.get("中") is None
    assert fst.get("北京人") is None
    assert list(fst.items()) == KV  # lexicographic streaming order


def test_empty_key_roundtrip():
    # reference fst.cpp:471-485 (m_emptyOutput)
    fst = build_fst(["", "a"], [42, 1])
    assert fst.get("") == 42
    assert list(fst.items())[0] == ("", 42)


def test_duplicate_key_last_wins():
    # reference fst.cpp:180-189
    b = FstBuilder()
    b.insert("ab", 5)
    b.insert("abc", 7)
    b.insert("abc", 9)
    f = b.finish()
    assert f.get("ab") == 5
    assert f.get("abc") == 9


def test_unsorted_insert_rejected():
    # reference fst.cpp:164-167 ("not larger than last key")
    b = FstBuilder()
    b.insert("b", 1)
    with pytest.raises(ValueError):
        b.insert("a", 1)


def test_set_mode_no_output():
    f = build_fst(["a", "b", "c"], has_output=False)
    assert not f.has_output
    assert f.get("b") == 0
    assert "d" not in f


def test_minimality_shared_suffixes():
    # FIXTURES.md F6: {mon,tues,thurs}+day share the "day" suffix —
    # frozen-node dedup (fst.cpp:105-115) must merge those subtrees.
    f = build_fst(sorted(["monday", "thursday", "tuesday"]), has_output=False)
    # a trie would need 20 non-root nodes; suffix sharing saves "day" twice
    # (minimal DAWG for these 3 words has 17 non-root states)
    assert f.n_nodes <= 18
    assert sorted(f.keys()) == ["monday", "thursday", "tuesday"]


def test_minimality_vs_random_subsets(ref_words):
    # node count must be independent of which minimal builder produced it:
    # building twice gives identical arrays
    words = sorted(random.Random(7).sample(sorted(set(ref_words)), 2000))
    f1 = build_fst(words, has_output=False)
    f2 = build_fst(words, has_output=False)
    assert f1.n_nodes == f2.n_nodes
    assert f1.to_bytes() == f2.to_bytes()
    assert list(f1.keys()) == words


def test_serialization_roundtrip():
    fst = build_fst([k for k, _ in KV], [v for _, v in KV])
    f2 = Fst.from_bytes(fst.to_bytes())
    assert list(f2.items()) == KV
    assert f2.has_output and f2.n_keys == len(KV)


def test_prefix_query():
    # reference fst.cpp:559-561 / automaton.cpp:185-213
    kv = KV
    fst = build_fst([k for k, _ in kv], [v for _, v in kv])
    got = list(fst.search(PrefixAutomaton("中国")))
    assert got == [("中国", 100), ("中国人", 50), ("中国人民", 40), ("中国心", 10)]
    got = list(fst.search(PrefixAutomaton("北")))
    assert [k for k, _ in got] == ["北七", "北七家", "北京", "北平"]
    assert list(fst.search(PrefixAutomaton(""))) == kv


def test_exact_match_automaton():
    fst = build_fst([k for k, _ in KV], [v for _, v in KV])
    assert list(fst.search(StrAutomaton("北京"))) == [("北京", 5)]
    assert list(fst.search(StrAutomaton("北海"))) == []


@pytest.mark.parametrize("lo,lo_inc,hi,hi_inc,expect", [
    ("北七", True, "北京", True, ["北七", "北七家", "北京"]),
    ("北七", False, "北京", True, ["北七家", "北京"]),
    ("北七", True, "北京", False, ["北七", "北七家"]),
    (None, True, "中国人", True, ["", "中国", "中国人"]),
    ("北平", True, None, True, ["北平"]),
    (None, True, None, True, [k for k, _ in KV]),
])
def test_range_query_bounds(lo, lo_inc, hi, hi_inc, expect):
    # reference fst.h:329-388 (FstIterBound), fst.cpp:428-468 (SeekMin)
    fst = build_fst([k for k, _ in KV], [v for _, v in KV])
    got = [k for k, _ in fst.search(
        min_bound=Bound(lo, lo_inc) if lo is not None else None,
        max_bound=Bound(hi, hi_inc) if hi is not None else None)]
    assert got == expect


def test_range_randomized(ref_words):
    rnd = random.Random(13)
    words = sorted(set(rnd.sample(sorted(set(ref_words)), 1000)))
    fst = build_fst(words, has_output=False)
    for _ in range(25):
        lo = rnd.choice(words + ["a", "zz", ""])
        hi = rnd.choice(words + ["m", "zzz"])
        lo_inc, hi_inc = rnd.random() < .5, rnd.random() < .5
        got = [k for k, _ in fst.search(min_bound=Bound(lo, lo_inc),
                                        max_bound=Bound(hi, hi_inc))]
        want = [w for w in words
                if (w > lo or (lo_inc and w == lo))
                and (w < hi or (hi_inc and w == hi))]
        assert got == want, (lo, lo_inc, hi, hi_inc)


def test_registry_budget_still_correct():
    # capped dedup registry → approximately-minimal but correct FST
    # (reference's LRU node-cache trade-off, fst.h:73-79)
    words = sorted({f"key{i:04d}x{i % 7}" for i in range(500)})
    full = build_fst(words, has_output=False)
    b = FstBuilder(has_output=False, max_registry_size=16)
    b.insert_many(words)
    capped = b.finish()
    assert list(capped.keys()) == words
    assert capped.n_nodes >= full.n_nodes


def test_fst_roundtrip_property():
    """Hypothesis property: ANY sorted unique key/value set round-trips
    through build → serialize → deserialize → items() exactly
    (re-expressing the reference's randomized cache/build test style)."""
    from hypothesis import given, settings, strategies as st

    keys_vals = st.dictionaries(
        st.text(min_size=0, max_size=12), st.integers(0, 2**63),
        min_size=0, max_size=60)

    @settings(max_examples=60, deadline=None)
    @given(keys_vals)
    def prop(d):
        items = sorted(d.items())
        fst = build_fst([k for k, _ in items], [v for _, v in items])
        rt = Fst.from_bytes(fst.to_bytes())
        assert list(rt.items()) == items
        for k, v in items:
            assert rt.get(k) == v

    prop()
