"""Core FST library: builder, reader, automata (pure Python/numpy, no Ray).

Reimplements the query semantics of Orchid-FST
(/root/reference/src/main/fst/fst/fst_core/) on a codepoint alphabet;
see module docstrings for file:line citations.
"""

from orchid_fst_ray.fst.builder import FstBuilder, build_fst
from orchid_fst_ray.fst.fst import Bound, Fst
from orchid_fst_ray.fst.automata import (
    AlwaysAutomaton, IntersectAutomaton, NotAutomaton, PrefixAutomaton,
    GreaterThanAutomaton, LessThanAutomaton, StartsWithAutomaton,
    StrAutomaton, UnionAutomaton,
)
from orchid_fst_ray.fst.levenshtein import (
    DamerauLevenshteinAutomaton, LevenshteinAutomaton,
    damerau_levenshtein_osa, levenshtein,
)
from orchid_fst_ray.fst.reference_format import (
    dump_reference_bytes, iter_reference_items,
)


def fuzzy_automaton(query: str, d: int, same_prefix_len: int = 0,
                    damerau: bool = False):
    """The reference's fuzzy query automaton (fst.cpp:530-553): a
    Levenshtein or Damerau-Levenshtein DFA, optionally intersected with a
    required common prefix of the first ``same_prefix_len`` characters."""
    aut = (DamerauLevenshteinAutomaton(query, d) if damerau
           else LevenshteinAutomaton(query, d))
    if same_prefix_len > 0:
        return IntersectAutomaton(PrefixAutomaton(query[:same_prefix_len]), aut)
    return aut


__all__ = [
    "FstBuilder", "build_fst", "Fst", "Bound", "fuzzy_automaton",
    "AlwaysAutomaton", "StrAutomaton", "PrefixAutomaton",
    "GreaterThanAutomaton", "LessThanAutomaton", "IntersectAutomaton",
    "UnionAutomaton", "NotAutomaton", "StartsWithAutomaton",
    "LevenshteinAutomaton", "DamerauLevenshteinAutomaton",
    "levenshtein", "damerau_levenshtein_osa",
    "dump_reference_bytes", "iter_reference_items",
]
