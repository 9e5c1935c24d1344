"""Automata unit tests: combinators, order automata, Levenshtein/DL DFAs
vs brute-force DP (reference automaton.h/automaton.cpp semantics)."""

from __future__ import annotations

import random

from orchid_fst_ray.fst import (
    AlwaysAutomaton, DamerauLevenshteinAutomaton, GreaterThanAutomaton,
    IntersectAutomaton, LessThanAutomaton, LevenshteinAutomaton,
    NotAutomaton, PrefixAutomaton, StartsWithAutomaton, StrAutomaton,
    UnionAutomaton, build_fst, damerau_levenshtein_osa, fuzzy_automaton,
    levenshtein,
)

WORDS = sorted({
    "", "a", "ab", "abc", "abd", "b", "ba", "bab", "bc", "ca", "cab",
    "hair", "hairs", "chair", "chairs", "hai", "har", "hire", "hare",
    "ahir", "hiar", "hira", "airh", "中国", "中图", "国中",
})


def run(aut, words=WORDS):
    fst = build_fst(words, has_output=False)
    return [k for k, _ in fst.search(aut)]


def test_always():
    assert run(AlwaysAutomaton()) == WORDS


def test_not():
    got = run(NotAutomaton(StrAutomaton("ab")))
    assert got == [w for w in WORDS if w != "ab"]


def test_union_intersect():
    a = PrefixAutomaton("ha")
    b = LevenshteinAutomaton("hair", 1)
    got_u = run(UnionAutomaton(a, b))
    got_i = run(IntersectAutomaton(a, b))
    brute_a = {w for w in WORDS if w.startswith("ha")}
    brute_b = {w for w in WORDS if levenshtein(w, "hair") <= 1}
    assert got_u == sorted(brute_a | brute_b)
    assert got_i == sorted(brute_a & brute_b)


def test_greater_less():
    for bound in ["ab", "b", "", "hair"]:
        for inc in (True, False):
            got = run(GreaterThanAutomaton(bound, inc))
            assert got == [w for w in WORDS if w > bound or (inc and w == bound)]
            got = run(LessThanAutomaton(bound, inc))
            assert got == [w for w in WORDS if w < bound or (inc and w == bound)]


def test_starts_with():
    # strings having a prefix matched by the inner automaton
    inner = StrAutomaton("ha")
    got = run(StartsWithAutomaton(inner))
    assert got == [w for w in WORDS if w.startswith("ha")]
    # StartsWith(Lev("hair",1)): any word whose some prefix is within d=1
    got = run(StartsWithAutomaton(LevenshteinAutomaton("hair", 1)))
    brute = [w for w in WORDS
             if any(levenshtein(w[:i], "hair") <= 1 for i in range(len(w) + 1))]
    assert got == brute


def test_fuzzy_prefix_len():
    # reference fst.cpp:530-553: fuzzy with required common prefix =
    # Intersect(Prefix(query[:p]), LevDFA)
    aut = fuzzy_automaton("hair", 2, same_prefix_len=2)
    got = run(aut)
    brute = [w for w in WORDS
             if w.startswith("ha") and levenshtein(w, "hair") <= 2]
    assert got == brute


def _rand_word(rnd, alpha="abch中"):
    return "".join(rnd.choice(alpha) for _ in range(rnd.randrange(0, 7)))


def test_lev_dfa_vs_brute_randomized():
    rnd = random.Random(42)
    for trial in range(30):
        q = _rand_word(rnd)
        d = rnd.randrange(0, 3)
        aut = LevenshteinAutomaton(q, d)
        words = sorted({_rand_word(rnd) for _ in range(200)})
        got = run(aut, words)
        brute = [w for w in words if levenshtein(w, q) <= d]
        assert got == brute, (q, d)


def test_dl_dfa_vs_brute_randomized():
    rnd = random.Random(43)
    for trial in range(30):
        q = _rand_word(rnd)
        d = rnd.randrange(0, 3)
        aut = DamerauLevenshteinAutomaton(q, d)
        words = sorted({_rand_word(rnd) for _ in range(200)})
        got = run(aut, words)
        brute = [w for w in words if damerau_levenshtein_osa(w, q) <= d]
        assert got == brute, (q, d)


def test_dl_transpositions():
    aut = DamerauLevenshteinAutomaton("hair", 1)
    got = run(aut)
    assert "hiar" in got and "ahir" in got  # adjacent swaps cost 1
    lev = run(LevenshteinAutomaton("hair", 1))
    assert "hiar" not in lev and "ahir" not in lev  # cost 2 without transposition


def test_utf8_character_distance_not_bytes():
    # reference automaton.cpp:242-243: distance in characters; 中→国 is one
    # substitution even though it's 3 UTF-8 bytes.
    got = run(LevenshteinAutomaton("中国", 1))
    assert "中图" in got and "中国" in got


def test_banded_states_exhaustive_small_alphabet():
    """Banded DFA states == brute force over an exhaustive 3-letter
    dictionary for d in 0..3, both Levenshtein and OSA (covers d=0
    1-cell bands, empty query/keys, transposition-heavy strings)."""
    import itertools
    from orchid_fst_ray.fst import build_fst, fuzzy_automaton
    from orchid_fst_ray.fst.levenshtein import (
        damerau_levenshtein_osa, levenshtein)
    words = sorted({"".join(p) for p in itertools.product("abc", repeat=4)}
                   | {"", "a", "ab", "abcabc", "ca"})
    fst = build_fst(words, has_output=False)
    for d in (0, 1, 2, 3):
        for q in ["", "a", "abca", "cbab", "abcabcabc", "zzzz"]:
            got = {k for k, _ in fst.search(fuzzy_automaton(q, d))}
            exp = {w for w in words if levenshtein(q, w) <= d}
            assert got == exp, (d, q)
            gotd = {k for k, _ in fst.search(
                fuzzy_automaton(q, d, damerau=True))}
            expd = {w for w in words
                    if damerau_levenshtein_osa(q, w) <= d}
            assert gotd == expd, ("dl", d, q)


def test_step_cache_cross_query_differential():
    """The banded-step result is served from a PROCESS-GLOBAL cache
    keyed by (d, boundary codes, band, characteristic bits) — shared
    across every query in the worker (levenshtein.py `_STEP_CACHE_*`).
    A key collision between two different queries would silently
    corrupt accepts, so stress exactly that: thousands of short random
    queries interleaved in one process, each string checked against
    the brute DP. (The `rem == -1` interior-sentinel collision fixed in
    round 3 is the class of bug this pins.)"""
    rnd = random.Random(1234)
    alpha = "abc"
    for trial in range(1500):
        d = rnd.randint(1, 3)
        q = "".join(rnd.choice(alpha) for _ in range(rnd.randint(0, 6)))
        s = "".join(rnd.choice(alpha + "d")
                    for _ in range(rnd.randint(0, 8)))
        for aut, dist in (
            (LevenshteinAutomaton(q, d), levenshtein(q, s)),
            (DamerauLevenshteinAutomaton(q, d),
             damerau_levenshtein_osa(q, s)),
        ):
            st = aut.start()
            for ch in s:
                if st is None:
                    break
                st = aut.accept(st, ch)
            got = st is not None and aut.is_match(st)
            assert got == (dist <= d), (type(aut).__name__, q, s, d, dist)
