"""Levenshtein and Damerau-Levenshtein automata over UTF-8 characters.

Reimplements the semantics of Orchid-FST's fuzzy automata (reference:
/root/reference/src/main/fst/fst/fst_core/automaton.h:486-618,
automaton.cpp:216-524): a DFA built by powerset construction over the
query's characters plus one "any other character" class
(automaton.cpp:303-320), states being edit-distance vectors clamped at
``d+1``; the Damerau variant additionally tracks the previous row and
previous character class to recognize adjacent transpositions
(automaton.cpp:342-390,427-431 ``prevEdits``/``prevStr``/
``IsPossibleTransposition`` — i.e. optimal-string-alignment
recurrence ``d[i][j] = min(..., d[i-2][j-2]+1)`` when the last two
characters are swapped).

Edit distance is measured in whole characters, never bytes
(automaton.cpp:242-243) — automatic here since we operate on Python
``str`` code points.

Implementation: lazily memoized DFA. State identity is the clamped
vector tuple (plus previous row + previous class for Damerau), so the
state space is finite; transitions are cached per (state, char_class)
— equivalent to the reference's up-front ``buildDfa``
(automaton.cpp:261-326) but paying only for reachable states.
"""

from __future__ import annotations

__all__ = ["LevenshteinAutomaton", "DamerauLevenshteinAutomaton",
           "levenshtein", "damerau_levenshtein_osa"]


class LevenshteinAutomaton:
    """DFA accepting strings within edit distance ``d`` of ``query``."""

    OTHER = -1  # char class for characters not in the query

    def __init__(self, query: str, d: int) -> None:
        self.query = query
        self.d = d
        self.n = len(query)
        # char class per query position + lookup table
        classes: dict[str, int] = {}
        for ch in query:
            if ch not in classes:
                classes[ch] = len(classes)
        self._class_of = classes
        self._qclass = tuple(classes[ch] for ch in query)
        self._cap = d + 1
        start = tuple(min(j, self._cap) for j in range(self.n + 1))
        self._start = start
        # transition cache: (state, char_class) -> state or None (dead)
        self._trans: dict[tuple, tuple | None] = {}

    # -- automaton protocol -------------------------------------------------

    def start(self):
        return self._start if min(self._start) <= self.d else None

    def is_match(self, state) -> bool:
        return state is not None and state[self.n] <= self.d

    def can_match(self, state) -> bool:
        return state is not None

    def accept(self, state, ch: str):
        if state is None:
            return None
        cls = self._class_of.get(ch, self.OTHER)
        key = (state, cls)
        cached = self._trans.get(key, _MISSING)
        if cached is not _MISSING:
            return cached
        nxt = self._step(state, cls)
        self._trans[key] = nxt
        return nxt

    # -- core DP step -------------------------------------------------------

    def _step(self, row: tuple, cls: int) -> tuple | None:
        cap = self._cap
        qc = self._qclass
        new = [min(row[0] + 1, cap)]
        prev_new = new[0]
        for j in range(1, self.n + 1):
            cost = 0 if qc[j - 1] == cls else 1
            v = row[j - 1] + cost
            if row[j] + 1 < v:
                v = row[j] + 1
            if prev_new + 1 < v:
                v = prev_new + 1
            if v > cap:
                v = cap
            new.append(v)
            prev_new = v
        t = tuple(new)
        if min(t) > self.d:
            return None  # dead state: no continuation can match
        return t


_MISSING = object()


class DamerauLevenshteinAutomaton(LevenshteinAutomaton):
    """DFA for Damerau-Levenshtein (adjacent-transposition / OSA) distance.

    State: ``(cur_row, prev_row, prev_class)`` — the reference's
    ``m_curEdits/m_prevEdits/m_prevStr`` triple (automaton.h:561-579).
    """

    def start(self):
        s = self._start
        if min(s) > self.d:
            return None
        return (s, None, None)

    def is_match(self, state) -> bool:
        return state is not None and state[0][self.n] <= self.d

    def accept(self, state, ch: str):
        if state is None:
            return None
        cls = self._class_of.get(ch, self.OTHER)
        key = (state, cls)
        cached = self._trans.get(key, _MISSING)
        if cached is not _MISSING:
            return cached
        row, prev_row, prev_cls = state
        cap = self._cap
        qc = self._qclass
        new = [min(row[0] + 1, cap)]
        prev_new = new[0]
        for j in range(1, self.n + 1):
            cost = 0 if qc[j - 1] == cls else 1
            v = row[j - 1] + cost
            if row[j] + 1 < v:
                v = row[j] + 1
            if prev_new + 1 < v:
                v = prev_new + 1
            # transposition: input ...prev,ch matches query ...ch,prev
            # (OSA term d[i-2][j-2] + 1)
            if (prev_row is not None and j >= 2 and cls != self.OTHER
                    and cls == qc[j - 2] and prev_cls == qc[j - 1]):
                t = prev_row[j - 2] + 1
                if t < v:
                    v = t
            if v > cap:
                v = cap
            new.append(v)
            prev_new = v
        t = tuple(new)
        # dead only if no continuation (incl. future transpositions) can match;
        # a conservative and correct test is min over the current row.
        nxt = None if min(t) > self.d else (t, row, cls)
        self._trans[key] = nxt
        return nxt


# ---------------------------------------------------------------- plain DPs
# Brute-force references used by tests and by the pairwise scorer fallback.

def levenshtein(a: str, b: str, limit: int | None = None) -> int:
    """Plain Levenshtein distance (optionally early-exit above ``limit``)."""
    if a == b:
        return 0
    n, m = len(a), len(b)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        ca = a[i - 1]
        best = i
        for j in range(1, m + 1):
            cost = 0 if ca == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            cur[j] = v
            if v < best:
                best = v
        if limit is not None and best > limit:
            return limit + 1
        prev = cur
    return prev[m]


def damerau_levenshtein_osa(a: str, b: str) -> int:
    """Optimal-string-alignment distance (adjacent transpositions count 1)."""
    n, m = len(a), len(b)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            v = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                v = min(v, d[i - 2][j - 2] + 1)
            d[i][j] = v
    return d[n][m]
