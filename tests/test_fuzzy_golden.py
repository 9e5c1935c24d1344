"""The reference's golden fuzzy tests, re-expressed at the FST-core layer:
build a set FST from the 82,157-word dictionary and assert the exact
golden result lists IN ORDER (reference fst_unittest.cpp:100-173
``testFstFuzzy`` → 214 hits; :176-254
``testDamerauLevenshteinFstFuzzy`` → 220 hits)."""

from __future__ import annotations

from orchid_fst_ray.fst import (
    DamerauLevenshteinAutomaton, FstBuilder, LevenshteinAutomaton,
)


def _build(ref_words):
    b = FstBuilder(has_output=False)
    b.insert_many(sorted(set(ref_words)))
    return b.finish()


def test_golden_levenshtein_214(ref_words, golden_lev):
    fst = _build(ref_words)
    got = [k for k, _ in fst.search(LevenshteinAutomaton("hair", 2))]
    assert len(got) == 214
    assert got == golden_lev  # content AND lexicographic order


def test_golden_damerau_220(ref_words, golden_dl):
    fst = _build(ref_words)
    got = [k for k, _ in fst.search(DamerauLevenshteinAutomaton("hair", 2))]
    assert len(got) == 220
    assert got == golden_dl
