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
           "levenshtein", "damerau_levenshtein_osa", "banded_edit_leq"]

_MISSING = object()

# Process-global banded-step caches (the practical core of the
# Schulz-Mihov "universal" Levenshtein automaton): the banded DP step
# is QUERY-INDEPENDENT once the query's influence is reduced to (a)
# the characteristic bit-vector of "does the input char equal the
# query char at band position k" and (b) two small boundary codes
# (distance from the key start / end when within d of either). Keyed
# that way, one process-wide dict serves every probe of every query —
# fresh per-probe automatons skip the O(width) cell loop almost
# entirely after warm-up, which is the dominant cost when each of
# millions of self-join probes builds its own DFA.
_STEP_CACHE_LEV: dict = {}
_STEP_CACHE_DL: dict = {}
_STEP_CACHE_MAX = 4_000_000   # bound worker-lifetime growth


def _shift_mask(mask: int, shift: int, wmask: int) -> int:
    return ((mask >> shift) if shift >= 0 else (mask << -shift)) & wmask


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
        # per-class position bitmask: bit p set iff query[p] is class c
        masks = [0] * len(classes)
        for p, c in enumerate(self._qclass):
            masks[c] |= 1 << p
        self._mask_of_cls = masks
        self._wmask = (1 << (2 * d + 1)) - 1
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
        """One DFA transition. The new band is a pure function of
        (d, boundary codes, band, characteristic bits) — looked up in
        the process-global cache, falling back to the cell loop."""
        i, band = state
        d, n = self.d, self.n
        i2 = i + 1
        left = i2 if i2 <= d else -1          # j <= 0 cells in window
        rem = n - i2
        # interior code is d (NOT -1: rem itself can be -1 when the
        # input has run past the query's end)
        right = rem if rem < d else d         # j > n cells in window
        mask = self._mask_of_cls[cls] if cls >= 0 else 0
        bits = _shift_mask(mask, i2 - d - 1, self._wmask)
        key = (d, left, right, band, bits)
        nb = _STEP_CACHE_LEV.get(key, _MISSING)
        if nb is _MISSING:
            nb = self._step_cells(i2, band, cls)
            if len(_STEP_CACHE_LEV) < _STEP_CACHE_MAX:
                _STEP_CACHE_LEV[key] = nb
        return None if nb is None else (i2, nb)

    def _step_cells(self, i2: int, band, cls):
        """Ground-truth banded DP cell loop → new band tuple or None
        (dead)."""
        d, cap, n, qc = self.d, self._cap, self.n, self._qclass
        width = self._width
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
        return t


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
        """DL transition via the global cache: the transposition term
        adds the previous band and a second characteristic vector
        (input ...prev,ch matching query ...ch,prev) to the key."""
        i, band, prev_band, prev_cls = state
        d, n = self.d, self.n
        i2 = i + 1
        left = i2 if i2 <= d else -1
        rem = n - i2
        right = rem if rem < d else d   # d = interior (rem can be -1)
        maskc = self._mask_of_cls[cls] if cls >= 0 else 0
        bits = _shift_mask(maskc, i2 - d - 1, self._wmask)
        maskp = (self._mask_of_cls[prev_cls]
                 if prev_cls is not None and prev_cls >= 0 else 0)
        # tr bit k ⇔ cls == qc[j-2] AND prev_cls == qc[j-1], j = i2-d+k
        tr_bits = (_shift_mask(maskc, i2 - d - 2, self._wmask)
                   & _shift_mask(maskp, i2 - d - 1, self._wmask))
        key = (d, left, right, band,
               prev_band, bits, tr_bits)
        nb = _STEP_CACHE_DL.get(key, _MISSING)
        if nb is _MISSING:
            nb = self._step_cells_dl(i2, band, prev_band, prev_cls, cls)
            if len(_STEP_CACHE_DL) < _STEP_CACHE_MAX:
                _STEP_CACHE_DL[key] = nb
        return None if nb is None else (i2, nb, band, cls)

    def _step_cells_dl(self, i2, band, prev_band, prev_cls, cls):
        d, cap, n, qc = self.d, self._cap, self.n, self._qclass
        width = self._width
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
        return None if min(t) > self.d else t


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


def banded_edit_leq(A: "np.ndarray", lena: "np.ndarray",
                    B: "np.ndarray", lenb: "np.ndarray",
                    d: int, damerau: bool) -> "np.ndarray":
    """Vectorized pairwise "edit distance ≤ d" over MANY string pairs
    at once: ``A``/``B`` are (n, W) uint32 codepoint matrices
    (0-padded), ``lena``/``lenb`` the true lengths; returns a bool
    mask. Distance semantics are exactly the automata above —
    Levenshtein, or optimal-string-alignment when ``damerau``
    (reference automaton.cpp:342-390) — via the same banded Ukkonen
    recurrence (``row[j] ≥ |i-j|``, so cells outside ``[i-d, i+d]``
    clamp at d+1). One python-level loop over rows × (2d+1) band
    columns, every op an O(n) numpy kernel: the small-blocking-group
    candidates path batches hundreds of groups' pairs through ONE call
    instead of paying the per-level kernel cost per group.

    Callers must pre-filter ``|lena - lenb| ≤ d`` (the result cell
    lies outside the band otherwise)."""
    import numpy as np
    n = len(lena)
    INF = np.int16(d + 1)
    width = 2 * d + 1
    out = np.zeros(n, bool)
    if n == 0:
        return out
    res = np.full(n, INF, np.int16)
    # row 0: D[0][j] = j for j in [0, d]
    W = np.full((n, width), INF, np.int16)
    for k in range(d, width):
        j = k - d
        W[:, k] = j
        W[lenb < j, k] = INF
    sel0 = lena == 0
    res[sel0] = np.minimum(lenb[sel0], int(INF)).astype(np.int16)
    Wpp = None                       # row i-2 (transpositions)
    maxWA = A.shape[1]
    maxWB = B.shape[1]
    Lmax = int(lena.max())
    zeros = np.zeros(n, np.uint32)
    for i in range(1, Lmax + 1):
        Wnew = np.full((n, width), INF, np.int16)
        ai = A[:, i - 1] if i - 1 < maxWA else zeros
        ai_prev = (A[:, i - 2] if (damerau and i >= 2
                                   and i - 2 < maxWA) else None)
        for k in range(width):
            j = i - d + k
            if j < 0 or j > int(lenb.max()):
                continue
            if j == 0:
                # D[i][0] = i (reachable only while i ≤ d)
                Wnew[:, k] = min(i, int(INF))
                continue
            cand = np.full(n, INF, np.int16)
            if j - 1 < maxWB:
                bj = B[:, j - 1]
                np.minimum(cand, W[:, k] + (ai != bj), out=cand)
            if k + 1 < width:
                np.minimum(cand, W[:, k + 1] + 1, out=cand)
            if (damerau and ai_prev is not None and j >= 2
                    and j - 2 < maxWB and Wpp is not None):
                tr = (ai == B[:, j - 2]) & (ai_prev == B[:, j - 1])
                np.minimum(cand, np.where(tr, Wpp[:, k] + 1, INF),
                           out=cand)
            Wnew[:, k] = cand
        for k in range(1, width):    # insertion scan along the band
            np.minimum(Wnew[:, k], Wnew[:, k - 1] + 1, out=Wnew[:, k])
        for k in range(width):       # cells beyond B's end are dead
            j = i - d + k
            if j >= 0:
                Wnew[lenb < j, k] = INF
        np.minimum(Wnew, INF, out=Wnew)
        Wpp = W
        W = Wnew
        sel = np.flatnonzero(lena == i)
        if len(sel):
            kk = lenb[sel] - i + d
            res[sel] = W[sel, kk]
    return res <= d
