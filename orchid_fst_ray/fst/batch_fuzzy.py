"""Level-synchronous BATCHED fuzzy search: many queries × one FST in
numpy, one frontier per depth instead of one Python DFS per query.

The per-query product DFS (``Fst.search`` × ``LevenshteinAutomaton``)
costs ~2 µs of interpreter time per arc visit; a blocking-key group
with thousands of keys pays tens of millions of such visits in the ER
candidates stage.  This module runs the SAME banded-DFA recurrence
(levenshtein.py `_step_cells` / `_step_cells_dl`, reference
automaton.h:453-579 semantics) but advances ALL queries through the
FST together, one level at a time:

- the frontier is a struct-of-arrays ``(node, query, band_id, total)``
  (+ ``prev_band_id, prev_cp`` for Damerau/OSA);
- arc expansion is CSR slicing (`np.repeat` + offset arithmetic);
- the characteristic bit-vectors ("does query[p] == input char" over
  the 2d+1 band window) are vectorized gathers against a padded
  query-char matrix;
- band transitions are served from a process-global interned table
  keyed by a PACKED int64 of (band_id[, prev_band_id], boundary
  codes, characteristic bits) — the same query-independent
  Schulz-Mihov-style factoring as the scalar step cache, but looked
  up once per *unique* key per level (`np.unique`) instead of once
  per arc visit.

Semantics are pinned to the scalar path by differential tests
(tests/test_batch_fuzzy.py): for every query the set of matched
(key, value) pairs equals ``fst.search(fuzzy_automaton(q, d, 0,
damerau))``.  Used by the ER candidates stage and the sharded
dictionary search for ``same_prefix_len == 0`` fuzzy probes; other
query kinds keep the scalar DFS.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["batch_fuzzy_matches", "batch_self_join_pairs",
           "MAX_BATCH_D"]

# ------------------------------------------------------------------
# Global band interner + step tables, one space per (d, damerau).
# Band tuples are interned to dense ids; transitions are keyed by a
# packed int64 and give the next band id (-1 = dead).  Bounded like
# the scalar caches.

_MAX_TABLE = 4_000_000
_MAX_BANDS = 1 << 20          # prev_band_id pack width for the DL key
# widest distance the 7-bit characteristic-window packing supports
# (width = 2d+1 <= 7); callers fall back to the scalar DFS above it
MAX_BATCH_D = 3


class _BandSpace:
    __slots__ = ("d", "width", "cap", "ids", "bands", "_le_buf",
                 "step_lev", "step_dl")

    def __init__(self, d: int) -> None:
        self.d = d
        self.width = 2 * d + 1
        self.cap = d + 1
        self.ids: dict[tuple, int] = {}
        self.bands: list[tuple] = []
        # _le_buf[i] = bitmask over k of (band[k] <= d): the match test
        # "band[rem+d] <= d" becomes a shift+and against this array
        # (amortized-growth numpy buffer — a per-level list→array
        # conversion was the original hot spot)
        self._le_buf = np.zeros(1024, np.int64)
        self.step_lev: dict[int, int] = {}
        self.step_dl: dict[int, int] = {}

    def le_mask(self) -> np.ndarray:
        return self._le_buf          # valid through len(self.bands)

    def intern(self, band: tuple) -> int:
        bid = self.ids.get(band)
        if bid is None:
            bid = len(self.bands)
            if bid >= _MAX_BANDS:
                raise RuntimeError(
                    f"band interner overflow at d={self.d}; "
                    f"raise _MAX_BANDS / repack the step key")
            self.ids[band] = bid
            self.bands.append(band)
            m = 0
            for k, v in enumerate(band):
                if v <= self.d:
                    m |= 1 << k
            if bid >= len(self._le_buf):
                nb = np.zeros(len(self._le_buf) * 2, np.int64)
                nb[:len(self._le_buf)] = self._le_buf
                self._le_buf = nb
            self._le_buf[bid] = m
        return bid


_SPACES: dict[int, _BandSpace] = {}


def _space(d: int) -> _BandSpace:
    sp = _SPACES.get(d)
    if sp is None:
        sp = _SPACES[d] = _BandSpace(d)
    return sp


def _cell_step(d: int, left: int, right: int, band: tuple,
               prev_band: tuple | None, bits: int, tr_bits: int):
    """Query-independent banded DP step → new band tuple or None.

    Exactly `_step_cells` / `_step_cells_dl` with the query's
    influence pre-reduced: ``bits`` bit k = (query[j-1] == ch),
    ``tr_bits`` bit k = (query[j-2] == ch and query[j-1] == prev),
    ``left`` = i2 if i2 <= d else -1 (locates the j <= 0 cells),
    ``right`` = min(rem, d) with rem = len(query) - i2 (locates the
    j > n cells; the floor is rem >= -d-1 for any live predecessor).
    """
    cap = d + 1
    width = 2 * d + 1
    new = []
    prev_new = cap
    # k of the j == 0 cell (only exists while i2 <= d)
    k0 = d - left if left >= 0 else -1
    # cells with j > n: k > right + d (never triggers once right == d)
    k_hi = right + d if right < d else width
    for k in range(width):
        if (left >= 0 and k < k0) or k > k_hi:
            v = cap          # j < 0 or j > n
        elif k == k0:
            v = left if left < cap else cap   # j == 0 → min(i2, cap)
        else:
            cost = 0 if (bits >> k) & 1 else 1
            v = band[k] + cost
            up = (band[k + 1] if k + 1 < width else cap) + 1
            if up < v:
                v = up
            lf = prev_new + 1
            if lf < v:
                v = lf
            if prev_band is not None and (tr_bits >> k) & 1:
                tr = prev_band[k] + 1
                if tr < v:
                    v = tr
            if v > cap:
                v = cap
        new.append(v)
        prev_new = v
    t = tuple(new)
    return None if min(t) > d else t


def _start_band(d: int, n: int) -> tuple:
    cap = d + 1
    return tuple(min(j, cap) if 0 <= j <= n else cap
                 for j in range(-d, d + 1))


def batch_fuzzy_matches(fst, queries, d: int, damerau: bool = False,
                        return_keys: bool = False):
    """All fuzzy matches of every query against ``fst``.

    Returns ``(qidx, value)`` int64 arrays: row t means dictionary
    entry with output-value ``value[t]`` is within (Damerau-)
    Levenshtein distance ``d`` of ``queries[qidx[t]]``.  Equivalent to
    ``fst.search(fuzzy_automaton(q, d, 0, damerau))`` per query (the
    FST must have outputs; values are whatever the FST maps keys to).

    ``return_keys=True`` additionally returns the matched KEY STRINGS
    (third element, a list aligned with the arrays): the traversal
    records a per-level (parent row, arc char) history and matched
    keys are rebuilt by walking it backwards — cost O(matches x
    depth), the same string assembly the scalar DFS pays per yield.
    The dictionary search paths need this (their result schema carries
    the key column); the ER self-join skips it.

    ``d`` must be <= MAX_BATCH_D (3): the packed step key reserves 7
    bits for the characteristic window (width = 2d+1). Callers route
    bigger distances to the scalar DFS (before this guard, d=4 batched
    silently returned wrong results — the bits field overflowed into
    the transposition field).
    """
    if d > MAX_BATCH_D:
        raise ValueError(
            f"batch_fuzzy_matches supports d <= {MAX_BATCH_D} "
            f"(got {d}): the packed step key holds a 7-bit window; "
            f"use the scalar Fst.search(fuzzy_automaton(...)) path")
    sp = _space(d)
    width = sp.width
    starts = fst.starts.astype(np.int64, copy=False)
    arc_label = fst.arc_label.astype(np.int64, copy=False)
    arc_out = fst.arc_out.astype(np.int64, copy=False)
    arc_dest = fst.arc_dest.astype(np.int64, copy=False)
    final = fst.final
    final_out = fst.final_out.astype(np.int64, copy=False)

    K = len(queries)
    if K == 0 or len(final) == 0:
        z = np.empty(0, np.int64)
        return (z, z.copy(), []) if return_keys else (z, z.copy())
    qlen = np.fromiter((len(q) for q in queries), np.int64, K)
    maxlen = int(qlen.max()) if K else 0
    # padded query-char matrix; pad = -2 so neither arc labels (>= 0)
    # nor the "no previous char" sentinel (-1) ever match padding
    qstride = max(maxlen, 1)
    qchar = np.full((K, qstride), -2, np.int64)
    for qi, q in enumerate(queries):
        if q:
            qchar[qi, :len(q)] = np.frombuffer(
                q.encode("utf-32-le"), np.uint32).astype(np.int64)
    qflat = qchar.ravel()

    out_q: list[np.ndarray] = []
    out_v: list[np.ndarray] = []
    # per-level (parent rows, arc chars) + per-emit (level, rows)
    hist: list[tuple] = [()]           # index 0 unused (root level)
    emits: list[tuple] = []

    # start states (band0 varies only for queries shorter than d)
    bid0 = np.empty(K, np.int64)
    for n in np.unique(qlen):
        bid0[qlen == n] = sp.intern(_start_band(d, int(n)))
    root = fst.root
    # empty-key match at depth 0: k = qlen + d within window and
    # band0[k] <= d  ⇔  qlen <= d
    if final[root]:
        m0 = qlen <= d
        if m0.any():
            out_q.append(np.flatnonzero(m0).astype(np.int64))
            out_v.append(np.full(int(m0.sum()), int(final_out[root]),
                                 np.int64))
            emits.append((0, None))    # depth-0 match: key is ""

    node = np.full(K, root, np.int64)
    qidx = np.arange(K, dtype=np.int64)
    band = bid0
    total = np.zeros(K, np.int64)
    if damerau:
        prev_band = np.full(K, -1, np.int64)   # -1 = no previous band
        prev_cp = np.full(K, -1, np.int64)

    step_tab = sp.step_dl if damerau else sp.step_lev
    i2 = 0
    while len(node):
        i2 += 1
        # ---- expand arcs (CSR)
        cnt = starts[node + 1] - starts[node]
        nz = cnt > 0
        if not nz.all():
            if return_keys and nz.any():
                # frontier rows must stay stable per level — the
                # (parent, char) history indexes them; zero-arc rows
                # contribute nothing to np.repeat anyway
                pass
            else:
                node, qidx, band, total, cnt = (
                    node[nz], qidx[nz], band[nz], total[nz], cnt[nz])
                if damerau:
                    prev_band, prev_cp = prev_band[nz], prev_cp[nz]
        if not len(node) or not nz.any():
            break
        rep = np.repeat(np.arange(len(node)), cnt)
        off = np.arange(len(rep)) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        ai = starts[node][rep] + off
        cp = arc_label[ai]
        qr = qidx[rep]
        # ---- characteristic bits over the band window: flat-raveled
        # 1D gathers (measurably faster than row fancy-indexing or a
        # 2D window gather), one gather + one ==cp compare per window
        # column, SHARED between the Levenshtein bits and the Damerau
        # transposition test (tr bit k = (query[p-1] == ch) — the
        # k-1 compare — AND (query[p] == prev char))
        base_p = i2 - d - 1          # query position of window slot 0
        fb = qr * qstride
        cols: list = [None] * (width + 1)
        eqs: list = [None] * (width + 1)
        for k in range(width + 1):   # window slots -1 .. width-1
            p = base_p - 1 + k
            if 0 <= p < maxlen:
                c = qflat[fb + p]
                cols[k] = c
                eqs[k] = c == cp
        # accumulate in uint8 (bool views shift in place; width <= 7
        # keeps every bit inside a byte) — one widening astype per
        # level instead of one per window column
        bits8 = np.zeros(len(rep), np.uint8)
        for k in range(width):
            if eqs[k + 1] is not None:
                bits8 |= eqs[k + 1].view(np.uint8) << np.uint8(k)
        bits = bits8.astype(np.int64)
        if damerau:
            pcp = prev_cp[rep]
            tr8 = np.zeros(len(rep), np.uint8)
            for k in range(width):
                if eqs[k] is not None and cols[k + 1] is not None:
                    tr8 |= ((eqs[k] & (cols[k + 1] == pcp))
                            .view(np.uint8) << np.uint8(k))
            tr = tr8.astype(np.int64)
        # ---- packed step key
        rem = qlen[qr] - i2
        right = np.minimum(rem, d)
        left = i2 if i2 <= d else -1
        # low bits: bits(7) | tr(7) | right+d+1(3);  left is a per-level
        # scalar and selects the table entry via the same packed word
        key = (bits | ((right + d + 1) << 14)
               | (np.int64(left + 1) << 17))
        if damerau:
            key |= tr << 7
            key |= (prev_band[rep] + 1) << 20
            key |= band[rep] << 40
        else:
            key |= band[rep] << 20
        # size-adaptive dedup: hash-based factorize beats np.unique's
        # argsort on BIG frontiers (the table lookup needs dedup, not
        # sorted order), but factorize carries ~45µs of fixed pandas
        # overhead per call — on the small per-level frontiers of tiny
        # blocking groups (thousands of levels per Ray block) that
        # overhead alone dominated the probe stage
        if len(key) < 4096:
            uk, inv = np.unique(key, return_inverse=True)
        else:
            inv, uk = pd.factorize(key)
        res = np.empty(len(uk), np.int64)
        for ui in range(len(uk)):
            kk = int(uk[ui])
            nb = step_tab.get(kk, None)
            if nb is None:
                u_bits = kk & 0x7F
                u_tr = (kk >> 7) & 0x7F
                u_right = ((kk >> 14) & 0x7) - d - 1
                u_left = ((kk >> 17) & 0x7) - 1
                if damerau:
                    u_pb = ((kk >> 20) & (_MAX_BANDS - 1)) - 1
                    u_band = kk >> 40
                    pband = sp.bands[u_pb] if u_pb >= 0 else None
                else:
                    u_band = kk >> 20
                    pband = None
                t = _cell_step(d, u_left, u_right, sp.bands[u_band],
                               pband, u_bits, u_tr)
                nb = -1 if t is None else sp.intern(t)
                if len(step_tab) < _MAX_TABLE:
                    step_tab[kk] = nb
            res[ui] = nb
        nb_arr = res[inv]
        alive = nb_arr >= 0
        if not alive.any():
            break
        rep, ai, cp, qr, bits = (rep[alive], ai[alive], cp[alive],
                                 qr[alive], bits[alive])
        nb_arr, rem = nb_arr[alive], rem[alive]
        dest = arc_dest[ai]
        tot = total[rep] + arc_out[ai]
        # ---- emit matches: final node, window hit, band[rem+d] <= d
        le = sp.le_mask()
        win = (rem >= -d) & (rem <= d)
        hit = final[dest] & win
        if hit.any():
            kk = np.where(win, rem + d, 0)
            hit &= ((le[nb_arr] >> kk) & 1).astype(bool)
            if hit.any():
                out_q.append(qr[hit])
                out_v.append(tot[hit] + final_out[dest[hit]])
                if return_keys:
                    emits.append((i2, np.flatnonzero(hit)))
        # ---- next frontier; DL carries the band we stepped FROM and
        # the char just consumed (rep indexes the OLD frontier arrays)
        if return_keys:
            hist.append((rep, cp))
        if damerau:
            prev_band = band[rep]
            prev_cp = cp
        node, qidx, band, total = dest, qr, nb_arr, tot
    if not out_q:
        z = np.empty(0, np.int64)
        return (z, z.copy(), []) if return_keys else (z, z.copy())
    if not return_keys:
        return np.concatenate(out_q), np.concatenate(out_v)
    # rebuild matched key strings by walking the (parent, char)
    # history backwards from each emit level
    keys_out: list[str] = []
    for (lev, rows), qa in zip(emits, out_q):
        if lev == 0:
            keys_out.extend([""] * len(qa))
            continue
        cols = [None] * lev
        r = rows
        for lv in range(lev, 0, -1):
            par, ch = hist[lv]
            cols[lv - 1] = ch[r]
            r = par[r]
        mat = np.stack(cols, axis=1)
        keys_out.extend("".join(map(chr, row)) for row in mat.tolist())
    return np.concatenate(out_q), np.concatenate(out_v), keys_out


def batch_fuzzy_matches_chunked(fst, queries, d: int,
                                damerau: bool = False,
                                query_chunk: int = 256):
    """:func:`batch_fuzzy_matches` in ``query_chunk``-sized slices.

    EVERY multi-query probe call must chunk: the level-synchronous
    frontier is superlinear in live queries on near-duplicate-heavy
    key sets (the per-level step-table dedup stops collapsing states
    once a chunk's queries span too much of the key space) — a 3.3k-
    query frontier measured 41 s where 13 × 256-query chunks cost
    ~3 s. 256 is the measured sweet spot (512+ regresses even with
    hash-based dedup)."""
    if len(queries) <= query_chunk:
        return batch_fuzzy_matches(fst, queries, d, damerau)
    qs, vs = [], []
    for i in range(0, len(queries), query_chunk):
        a, b = batch_fuzzy_matches(fst, queries[i:i + query_chunk],
                                   d, damerau)
        qs.append(a + i)
        vs.append(b)
    return np.concatenate(qs), np.concatenate(vs)


def batch_self_join_pairs(fst, keys, d: int, damerau: bool = False,
                          max_pairs_per_key: int | None = None,
                          query_chunk: int = 256):
    """Fuzzy SELF-join of a sorted distinct key list against its own
    FST (values must be ``range(len(keys))``): ``(I, J)`` index pairs
    with ``J > I``, each I capped at its ``max_pairs_per_key``
    nearest-by-key-order matches — byte-for-byte the pair set the
    per-key probe loop produces (``fst.search`` yields matches in
    ascending key order, so "first N in search order" == "N smallest
    J").

    Queries run in ``query_chunk``-sized slices: near-duplicate-heavy
    blocks keep every query alive across most of the FST, and one
    all-queries frontier goes superlinear (argsort/unique on tens of
    millions of rows); ~256-query chunks are faster even on friendly
    blocks and bound the worst case (measured: 3810 near-dup keys
    26.6 s unchunked → 2.2 s chunked; 40 normal blocks 3.3 → 1.4 s).
    """
    qi, mv = batch_fuzzy_matches_chunked(fst, keys, d, damerau,
                                         query_chunk=query_chunk)
    m = mv > qi
    qi, mv = qi[m], mv[m]
    if max_pairs_per_key is not None and len(qi):
        order = np.lexsort((mv, qi))
        qi, mv = qi[order], mv[order]
        bnd = np.concatenate(
            ([0], np.flatnonzero(np.diff(qi)) + 1, [len(qi)]))
        rank = np.arange(len(qi)) - np.repeat(bnd[:-1], np.diff(bnd))
        keep = rank < max_pairs_per_key
        qi, mv = qi[keep], mv[keep]
    return qi, mv
