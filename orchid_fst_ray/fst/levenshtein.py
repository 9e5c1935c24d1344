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

Implementation: lazily memoized DFA over BANDED edit rows. Because
``row[j] >= |i - j|``, after ``i`` input characters every cell outside
the diagonal band ``[i-d, i+d]`` is clamped at ``d+1`` — so a state is
``(i, 2d+1 band values)`` instead of a full ``len(query)+1`` row,
making each transition O(d) rather than O(|query|) (the reference pays
the full row in its up-front ``buildDfa``; the semantics are
identical, validated against the full-row reference kernels and the
reference's golden suites)."""

from __future__ import annotations

__all__ = ["LevenshteinAutomaton", "DamerauLevenshteinAutomaton",
           "levenshtein", "damerau_levenshtein_osa"]

_MISSING = object()


class LevenshteinAutomaton:
    """DFA accepting strings within edit distance ``d`` of ``query``.

    States are INTERNED to small ints: the DFA is discovered lazily
    (state tuples live in ``_states``), every transition memoizes into
    a per-state ``{char_class: next_id}`` dict, and ``is_match``
    becomes a list lookup — an arc visit in the FST×DFA product DFS
    costs two dict gets instead of hashing an O(d) band tuple.
    ``accept_cp`` is the codepoint fast path the FST traversal uses
    (no ``chr``/str round-trip per arc)."""

    OTHER = -1  # char class for characters not in the query

    def __init__(self, query: str, d: int) -> None:
        self.query = query
        self.d = d
        self.n = len(query)
        classes: dict[str, int] = {}
        for ch in query:
            if ch not in classes:
                classes[ch] = len(classes)
        self._class_of = classes
        self._class_of_cp = {ord(ch): c for ch, c in classes.items()}
        self._qclass = tuple(classes[ch] for ch in query)
        self._cap = d + 1
        self._width = 2 * d + 1
        cap, n = self._cap, self.n
        band0 = tuple(min(j, cap) if 0 <= j <= n else cap
                      for j in range(-d, d + 1))
        self._start_state = (0, band0)
        # interned DFA: state id -> tuple / match flag / transitions.
        # _trans memoizes per char CLASS (the DP is a function of the
        # class); _trans_cp additionally memoizes per raw CODEPOINT so
        # the hot path is a single dict get per arc visit.
        self._states: list[tuple] = [self._start_state]
        self._ids: dict[tuple, int] = {self._start_state: 0}
        self._match: list[bool] = [self._tuple_match(self._start_state)]
        self._trans: list[dict] = [{}]
        self._trans_cp: list[dict] = [{}]

    def _tuple_match(self, state: tuple) -> bool:
        i, band = state[0], state[1]
        k = self.n - i + self.d
        return 0 <= k < self._width and band[k] <= self.d

    def _intern(self, tup: tuple | None) -> int | None:
        if tup is None:
            return None
        sid = self._ids.get(tup)
        if sid is None:
            sid = len(self._states)
            self._ids[tup] = sid
            self._states.append(tup)
            self._match.append(self._tuple_match(tup))
            self._trans.append({})
            self._trans_cp.append({})
        return sid

    # -- automaton protocol -------------------------------------------------

    def start(self):
        return 0 if min(self._start_state[1]) <= self.d else None

    def is_match(self, state) -> bool:
        return state is not None and self._match[state]

    def can_match(self, state) -> bool:
        return state is not None

    def accept(self, state, ch: str):
        if state is None:
            return None
        return self.accept_cp(state, ord(ch))

    def accept_cp(self, state: int | None, cp: int):
        """Codepoint fast path. CONTRACT (relied on by Fst.search):
        for automatons providing accept_cp, ``can_match(s)`` is
        exactly ``s is not None``."""
        if state is None:
            return None
        tc = self._trans_cp[state]
        cached = tc.get(cp, _MISSING)
        if cached is not _MISSING:
            return cached
        cls = self._class_of_cp.get(cp, -1)
        t = self._trans[state]
        nxt = t.get(cls, _MISSING)
        if nxt is _MISSING:
            nxt = self._intern(self._step(self._states[state], cls))
            t[cls] = nxt
        tc[cp] = nxt
        return nxt

    # -- core banded DP step ------------------------------------------------

    def _step(self, state, cls):
        i, band = state
        d, cap, n, qc = self.d, self._cap, self.n, self._qclass
        width = self._width
        i2 = i + 1
        new = []
        prev_new = cap
        base = i2 - d              # j of new[0]
        for k in range(width):
            j = base + k
            if j < 0 or j > n:
                v = cap
            elif j == 0:
                v = i2 if i2 < cap else cap
            else:
                # row_i[j-1] == band[k]; row_i[j] == band[k+1]
                cost = 0 if qc[j - 1] == cls else 1
                v = band[k] + cost
                up = (band[k + 1] if k + 1 < width else cap) + 1
                if up < v:
                    v = up
                left = prev_new + 1
                if left < v:
                    v = left
                if v > cap:
                    v = cap
            new.append(v)
            prev_new = v
        t = tuple(new)
        if min(t) > self.d:
            return None  # dead state: no continuation can match
        return (i2, t)


class DamerauLevenshteinAutomaton(LevenshteinAutomaton):
    """DFA for Damerau-Levenshtein (adjacent-transposition / OSA)
    distance. State: ``(i, band, prev_band, prev_class)`` — the
    reference's ``m_curEdits/m_prevEdits/m_prevStr`` triple
    (automaton.h:561-579), banded."""

    def __init__(self, query: str, d: int) -> None:
        super().__init__(query, d)
        # re-seed the interner with the DL state shape
        dl_start = (self._start_state[0], self._start_state[1],
                    None, None)
        self._states = [dl_start]
        self._ids = {dl_start: 0}
        self._match = [self._tuple_match(dl_start)]
        self._trans = [{}]
        self._trans_cp = [{}]

    def _step(self, state, cls):
        i, band, prev_band, prev_cls = state
        d, cap, n, qc = self.d, self._cap, self.n, self._qclass
        width = self._width
        i2 = i + 1
        new = []
        prev_new = cap
        base = i2 - d
        for k in range(width):
            j = base + k
            if j < 0 or j > n:
                v = cap
            elif j == 0:
                v = i2 if i2 < cap else cap
            else:
                cost = 0 if qc[j - 1] == cls else 1
                v = band[k] + cost
                up = (band[k + 1] if k + 1 < width else cap) + 1
                if up < v:
                    v = up
                left = prev_new + 1
                if left < v:
                    v = left
                # transposition: input ...prev,ch matches query
                # ...ch,prev (OSA term d[i-1][j-2] + 1); row_{i-1}[j-2]
                # sits at index k of the previous band
                if (prev_band is not None and j >= 2 and cls != -1
                        and cls == qc[j - 2] and prev_cls == qc[j - 1]):
                    tr = prev_band[k] + 1
                    if tr < v:
                        v = tr
                if v > cap:
                    v = cap
            new.append(v)
            prev_new = v
        t = tuple(new)
        return None if min(t) > self.d else (i2, t, band, cls)


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
