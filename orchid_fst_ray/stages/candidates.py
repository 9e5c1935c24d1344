"""Blocking + fuzzy candidate-pair generation (the ER core).

Per SURVEY.md §7: documents are shuffled once on the blocking key
(normalized host), and inside each block a minimal-acyclic FST is built
over the distinct ``doc_key`` strings; every distinct key is then probed
against the block FST through a Levenshtein (or Damerau-Levenshtein)
automaton — the reference's fuzzy query (fst.cpp:530-553) acting as the
candidate generator of a similarity self-join. Results are canonical
``(url_a < url_b)`` pairs.

Scale/skew notes:
- the block shuffle is the pipeline's SHUFFLE #1; the group task holds
  only its block's distinct keys (FST memory ~ O(distinct keys)).
- probing is self-join-symmetric: key i only collects matches with
  index > i (DFS yields sorted keys, so we drop hits ≤ self), so each
  candidate pair is generated exactly once — no global pair-dedup
  shuffle needed for single-key blocking.
- per-key fan-out is bounded by ``max_pairs_per_key``;
- giant blocks (hot hosts) take the mega-block path
  (:func:`generate_hot_candidates`): the block FST is built once,
  replicated via ray.put, and the probe side is partitioned across an
  actor pool — build once, probe in parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from orchid_fst_ray.fst import fuzzy_automaton
from orchid_fst_ray.fst.builder import build_probe_trie
from orchid_fst_ray.fst.batch_fuzzy import (MAX_BATCH_D,
                                            batch_fuzzy_matches_chunked,
                                            batch_self_join_pairs)

__all__ = ["BlockCandidates", "generate_candidates",
           "generate_hot_candidates", "generate_url_candidates",
           "dedupe_pairs"]


def _run_triangle_indices(bounds: np.ndarray) -> tuple[np.ndarray,
                                                       np.ndarray]:
    """All (i < j) index pairs WITHIN each run of ``bounds``
    (``[0, b1, ..., n]``), fully vectorized: returns global (a_idx,
    b_idx) arrays ordered by (run, j, i) — the same order the classic
    nested ``for i < j`` loop over each run emits."""
    sizes = (bounds[1:] - bounds[:-1]).astype(np.int64)
    starts = bounds[:-1].astype(np.int64)
    n = int(bounds[-1])
    # per-element local position within its run = how many earlier
    # elements it pairs with as the b-side
    local = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
    b_idx = np.repeat(np.arange(n, dtype=np.int64), local)
    seg_starts = np.concatenate(([0], np.cumsum(local)[:-1]))
    total = int(local.sum())
    within = np.arange(total, dtype=np.int64) - np.repeat(seg_starts,
                                                          local)
    a_idx = np.repeat(np.repeat(starts, sizes), local) + within
    return a_idx, b_idx


def _expand_cross(counts: np.ndarray, offsets: np.ndarray,
                  I: np.ndarray, J: np.ndarray) -> tuple[np.ndarray,
                                                         np.ndarray,
                                                         np.ndarray]:
    """Cross-product expansion over a CSR id layout: for each match
    pair (I[p], J[p]) of key indices, emit every (a-id, b-id) index
    combination — ``counts[k]`` ids per key ``k`` starting at
    ``offsets[k]``. Returns global (ia_idx, ib_idx, pair_idx) arrays
    ordered by (pair, a, b), matching the nested loop's emit order."""
    ci = counts[I]
    cj = counts[J]
    sizes = ci * cj
    total = int(sizes.sum())
    pid = np.repeat(np.arange(len(I), dtype=np.int64), sizes)
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    l = np.arange(total, dtype=np.int64) - starts[pid]
    ia_idx = offsets[I][pid] + l // cj[pid]
    ib_idx = offsets[J][pid] + l % cj[pid]
    return ia_idx, ib_idx, pid


# a blocking group at or below this many distinct keys goes through
# the batched pairwise banded-DP (O(pairs) but one kernel invocation
# for ALL small groups of a block); above it, automaton pruning on the
# per-group trie wins
_SMALL_HOST_KEYS = 128

_ARROW_POOL_CLAMPED = False


def _clamp_arrow_pool() -> None:
    """Pin this worker's Arrow CPU pool to 1 thread, once per process.

    Our map_batches callables reserve ONE Ray CPU but lean on Arrow
    kernels (sort_indices, take) that fan onto the worker's
    process-global thread pool — sized by whatever task first touched
    it, often the full machine. With a full pipeline running, 32
    concurrent 1-CPU tasks x pool threads thrash: the identical task
    graph measured 248 CPU-seconds at 32-way concurrency vs 111 at
    8-way, while the same kernels scale cleanly in plain processes.
    One task, one core — intra-task parallelism is the scheduler's
    job, not the kernel's."""
    global _ARROW_POOL_CLAMPED
    if not _ARROW_POOL_CLAMPED:
        pa.set_cpu_count(1)
        _ARROW_POOL_CLAMPED = True


def _small_host_pairs(keys: np.ndarray, hseg: np.ndarray,
                      small: np.ndarray, d: int, damerau: bool,
                      cap: int | None,
                      pair_chunk: int = 1 << 19) -> tuple[np.ndarray,
                                                          np.ndarray]:
    """Fuzzy self-join pairs for ALL small host segments of a block in
    one vectorized pass: triangle-candidate pairs within each segment,
    a |len diff| ≤ d prefilter (edit distance ≥ length difference),
    then :func:`banded_edit_leq` over the survivors — pair-for-pair
    identical to per-host trie probes (both collect every match, then
    cap the ``cap`` smallest matched keys per query)."""
    from orchid_fst_ray.fst.levenshtein import banded_edit_leq

    sel = np.flatnonzero(small)
    sizes = (hseg[1:] - hseg[:-1])[sel]
    starts = hseg[:-1][sel]
    tot = int(sizes.sum())
    segs = np.concatenate(([0], np.cumsum(sizes))).astype(np.int64)
    local = (np.arange(tot, dtype=np.int64)
             - np.repeat(segs[:-1], sizes))
    gidx = np.repeat(starts, sizes) + local     # compact → global rank
    a_c, b_c = _run_triangle_indices(segs)
    if not len(a_c):
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    # codepoint matrix over the small-host keys only (numpy <U storage
    # IS the 0-padded uint32 matrix)
    ku = np.asarray(keys[gidx], dtype=str)
    if ku.dtype.itemsize == 0:      # all-empty-key corner: no view
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    codes = ku.view(np.uint32).reshape(tot, -1)
    lens = (codes != 0).sum(axis=1).astype(np.int64)
    keep = np.abs(lens[a_c] - lens[b_c]) <= d
    a_c, b_c = a_c[keep], b_c[keep]
    if not len(a_c):    # every candidate pair length-prefiltered away
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    ok_parts = []
    for s in range(0, len(a_c), pair_chunk):
        ac = a_c[s:s + pair_chunk]
        bc = b_c[s:s + pair_chunk]
        ok_parts.append(banded_edit_leq(
            codes[ac], lens[ac], codes[bc], lens[bc], d, damerau))
    ok = np.concatenate(ok_parts)
    I = gidx[a_c[ok]]
    J = gidx[b_c[ok]]
    if cap is not None and len(I):
        o = np.lexsort((J, I))
        I, J = I[o], J[o]
        bnd = np.concatenate(
            ([0], np.flatnonzero(np.diff(I)) + 1, [len(I)]))
        rank = np.arange(len(I)) - np.repeat(bnd[:-1], np.diff(bnd))
        m = rank < cap
        I, J = I[m], J[m]
    return I, J


class BlockCandidates:
    """Whole-block callable: a (host-sorted) Arrow block holding ANY
    number of blocking-key groups in, candidate pairs out. One Arrow
    C++ sort per block co-locates (host, key, id); exact-duplicate and
    same-norm-url pairs are then triangle-expanded across ALL groups
    at once, and only the fuzzy trie build + probe remains per host.
    Round 3 ran this per group via ``groupby().map_groups`` — at 25k
    hosts/1M pages the per-group Arrow slicing and sort machinery (not
    the probes) dominated the stage."""

    def __init__(self, d: int = 2, damerau: bool = False,
                 same_prefix_len: int = 0,
                 key_col: str = "doc_key", id_col: str = "url",
                 block_col: str = "host",
                 max_pairs_per_key: int = 64,
                 url_col: str | None = None) -> None:
        self.d = d
        self.damerau = damerau
        self.same_prefix_len = same_prefix_len
        self.key_col = key_col
        self.id_col = id_col
        self.block_col = block_col
        self.max_pairs_per_key = max_pairs_per_key
        self.url_col = url_col

    def _fuzzy_group(self, keys: np.ndarray) -> tuple[np.ndarray,
                                                      np.ndarray]:
        """(I, J) matched distinct-key index pairs for ONE host's
        sorted distinct keys (build-probe-discard trie; the batched
        level-synchronous prober when the query shape allows it)."""
        fst = build_probe_trie(keys)
        if self.same_prefix_len == 0 and self.d <= MAX_BATCH_D:
            # pair-for-pair identical to the scalar loop below, ~4x
            # faster (fst/batch_fuzzy.py)
            return batch_self_join_pairs(
                fst, list(keys), self.d, self.damerau,
                self.max_pairs_per_key)
        I: list[int] = []
        J: list[int] = []
        for idx, k in enumerate(keys):
            aut = fuzzy_automaton(k, self.d, self.same_prefix_len,
                                  self.damerau)
            budget = self.max_pairs_per_key
            for mk, midx in fst.search(aut):
                if midx <= idx:
                    continue  # symmetric: each pair once
                I.append(idx)
                J.append(midx)
                budget -= 1
                if budget <= 0:
                    break
        return np.asarray(I, np.int64), np.asarray(J, np.int64)

    def __call__(self, g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        _clamp_arrow_pool()
        key_col, id_col = self.key_col, self.id_col
        n = g.num_rows
        if n == 0:
            return _PAIR_SCHEMA_EMPTY()
        # CSR over distinct (host, key): rows sorted by
        # (host, key, id); each host's sorted distinct keys double as
        # its FST build order
        order = pc.sort_indices(g, sort_keys=[
            (self.block_col, "ascending"), (key_col, "ascending"),
            (id_col, "ascending")])
        bf = g[self.block_col].take(order).to_numpy(zero_copy_only=False)
        kf = g[key_col].take(order).to_numpy(zero_copy_only=False)
        idf = g[id_col].take(order).to_numpy(zero_copy_only=False)
        change = np.flatnonzero((bf[1:] != bf[:-1])
                                | (kf[1:] != kf[:-1])) + 1
        bounds = np.concatenate(([0], change, [n])).astype(np.int64)
        keys = kf[bounds[:-1]]
        khost = bf[bounds[:-1]]
        counts = bounds[1:] - bounds[:-1]
        offsets = bounds[:-1]

        a_parts: list[np.ndarray] = []
        b_parts: list[np.ndarray] = []
        ka_parts: list[np.ndarray] = []
        kb_parts: list[np.ndarray] = []
        blk_parts: list[np.ndarray] = []
        src_parts: list[str] = []

        # fuzzy self-join per host segment of the distinct-key array.
        # SMALL hosts (≤ _SMALL_HOST_KEYS distinct keys) batch across
        # the whole block through one vectorized banded-DP pass over
        # all their candidate pairs — per-host trie probes pay ~1.3 ms
        # of fixed per-level kernel cost each, which dominated the
        # stage at ~25k tiny hosts per million pages. Big hosts keep
        # the trie + level-synchronous prober (the DP is O(pairs) and
        # loses to automaton pruning as nk grows). A whole-block trie
        # was tried and is 5x WORSE: the automaton explores every
        # host's keys for every query.
        I_arr = np.zeros(0, np.int64)
        J_arr = np.zeros(0, np.int64)
        hseg = np.concatenate(
            ([0], np.flatnonzero(khost[1:] != khost[:-1]) + 1,
             [len(keys)])).astype(np.int64)
        batched_ok = (self.same_prefix_len == 0
                      and self.d <= MAX_BATCH_D)
        hsizes = hseg[1:] - hseg[:-1]
        small = batched_ok & (hsizes <= _SMALL_HOST_KEYS) & (hsizes > 1)
        I_all: list[np.ndarray] = []
        J_all: list[np.ndarray] = []
        if small.any():
            Ii, Jj = _small_host_pairs(
                keys, hseg, small, self.d, self.damerau,
                self.max_pairs_per_key)
            if len(Ii):
                I_all.append(Ii)
                J_all.append(Jj)
        for si in np.flatnonzero(~small & (hsizes > 1)):
            hs, he = int(hseg[si]), int(hseg[si + 1])
            Ii, Jj = self._fuzzy_group(keys[hs:he])
            if len(Ii):
                I_all.append(Ii + hs)   # host-local → global ranks
                J_all.append(Jj + hs)
        if I_all:
            I_arr = np.concatenate(I_all)
            J_arr = np.concatenate(J_all)
        if len(I_arr):
            ia_idx, ib_idx, pid = _expand_cross(
                counts, offsets, I_arr, J_arr)
            A, B = idf[ia_idx], idf[ib_idx]
            KA = keys[I_arr[pid]]
            KB = keys[J_arr[pid]]
            swap = A > B
            a_parts.append(np.where(swap, B, A))
            b_parts.append(np.where(swap, A, B))
            ka_parts.append(np.where(swap, KB, KA))
            kb_parts.append(np.where(swap, KA, KB))
            blk_parts.append(khost[I_arr[pid]])
            src_parts.append("fuzzy")
        # exact-duplicate doc_keys: all (i < j) id pairs within each
        # (host, key) run — one triangle expansion across every group
        # in the block (ids are sorted within each run by the CSR sort)
        if (counts > 1).any():
            a_idx, b_idx = _run_triangle_indices(bounds)
            a_parts.append(idf[a_idx])
            b_parts.append(idf[b_idx])
            ka_parts.append(kf[a_idx])
            kb_parts.append(kf[a_idx])
            blk_parts.append(bf[a_idx])
            src_parts.append("fuzzy")
        # same-normalized-url pairs fold into the same block pass: a
        # norm_url contains its host, so an equal-url run never spans
        # hosts and one whole-block sort covers every group — saves a
        # whole extra sort over the docs table
        if self.url_col is not None:
            uorder = pc.sort_indices(
                g, sort_keys=[(self.url_col, "ascending"),
                              (id_col, "ascending"),
                              (key_col, "ascending")])
            uf = g[self.url_col].take(uorder).to_numpy(
                zero_copy_only=False)
            uidf = g[id_col].take(uorder).to_numpy(zero_copy_only=False)
            ukf = g[key_col].take(uorder).to_numpy(zero_copy_only=False)
            ubf = g[self.block_col].take(uorder).to_numpy(
                zero_copy_only=False)
            uchange = np.flatnonzero(uf[1:] != uf[:-1]) + 1
            ubounds = np.concatenate(([0], uchange, [n])).astype(np.int64)
            if ((ubounds[1:] - ubounds[:-1]) > 1).any():
                ua_idx, ub_idx = _run_triangle_indices(ubounds)
                a_parts.append(uidf[ua_idx])
                b_parts.append(uidf[ub_idx])
                ka_parts.append(ukf[ua_idx])
                kb_parts.append(ukf[ub_idx])
                blk_parts.append(ubf[ua_idx])
                src_parts.append("url")

        if not a_parts:
            return _PAIR_SCHEMA_EMPTY()
        src = np.concatenate([
            np.full(len(p), s, dtype=object)
            for p, s in zip(a_parts, src_parts)])
        # return Arrow (not pandas) so unions with the hot/url paths
        # keep a homogeneous block type for downstream shuffles
        return pa.table({
            "url_a": pa.array(np.concatenate(a_parts), pa.string()),
            "url_b": pa.array(np.concatenate(b_parts), pa.string()),
            "key_a": pa.array(np.concatenate(ka_parts), pa.string()),
            "key_b": pa.array(np.concatenate(kb_parts), pa.string()),
            "block_key": pa.array(np.concatenate(blk_parts), pa.string()),
            "source": pa.array(src, pa.string()),
        })


class SliceCandidates:
    """Medium-hot-host callable: the host's rows are REPLICATED into K
    slices upstream (one (host, slice) group per task after the sort),
    each task builds the full-host probe trie (the vectorized builder
    makes a 32k-key build ~0.3 s — cheap to duplicate) and probes only
    the distinct keys whose rank ``% K == slice``. Pair-for-pair equal
    to the serial whole-host probe: the per-query match budget is
    query-local, query q emits only matches > q, and each query
    belongs to exactly one slice — so each pair is produced exactly
    once across slices with the exact serial budget semantics.

    This is the middle tier between the normal in-block path (probe
    cost is superlinear in host keys, so one task per big host
    straggles) and the broadcast-sharded actor pool (whose per-batch
    host-interleaved probes cost ~4x the serial CPU in per-invocation
    prober overhead, measured at 1M pages). Replication is the price:
    K copies of the host's slim rows cross the shuffle, K =
    ceil(rows / slice_rows), so the data amplification is
    rows²/slice_rows — fine up to ``mega_block_rows``, past which the
    ref-only broadcast path takes over."""

    def __init__(self, d: int = 2, damerau: bool = False,
                 same_prefix_len: int = 0,
                 key_col: str = "doc_key", id_col: str = "url",
                 block_col: str = "host",
                 max_pairs_per_key: int = 64,
                 url_col: str | None = None) -> None:
        self.d = d
        self.damerau = damerau
        self.same_prefix_len = same_prefix_len
        self.key_col = key_col
        self.id_col = id_col
        self.block_col = block_col
        self.max_pairs_per_key = max_pairs_per_key
        self.url_col = url_col

    def _slice_pairs(self, keys: np.ndarray, s: int,
                     k_total: int, fst) -> tuple[np.ndarray, np.ndarray]:
        """(I, J) matched distinct-key index pairs for THIS slice's
        queries against the whole host's sorted distinct keys. Slices
        are CONTIGUOUS rank ranges: a strided (every-Kth-rank) slice
        measured 2.7x the cost of a contiguous one — the prober's
        per-level step-table dedup collapses states across adjacent
        (prefix-sharing) queries but not across spread-out ones."""
        L = len(keys)
        lo, hi = (s * L) // k_total, ((s + 1) * L) // k_total
        q_ranks = np.arange(lo, hi, dtype=np.int64)
        if self.same_prefix_len == 0 and self.d <= MAX_BATCH_D:
            qi, mv = batch_fuzzy_matches_chunked(
                fst, [keys[r] for r in q_ranks], self.d, self.damerau)
            I, J = q_ranks[qi], mv
            keep = J > I
            I, J = I[keep], J[keep]
            if len(I):
                # per-query budget: the cap smallest matched ranks ==
                # first-cap-in-search-order on the sorted-key trie
                o = np.lexsort((J, I))
                I, J = I[o], J[o]
                run_start = np.zeros(len(I), np.int64)
                new = np.flatnonzero(I[1:] != I[:-1]) + 1
                run_start[new] = new
                np.maximum.accumulate(run_start, out=run_start)
                rank = np.arange(len(I), dtype=np.int64) - run_start
                keep = rank < self.max_pairs_per_key
                I, J = I[keep], J[keep]
            return I, J
        Il: list[int] = []
        Jl: list[int] = []
        for q in q_ranks:
            aut = fuzzy_automaton(keys[q], self.d,
                                  self.same_prefix_len, self.damerau)
            budget = self.max_pairs_per_key
            for mk, midx in fst.search(aut):
                if midx <= q:
                    continue
                Il.append(q)
                Jl.append(midx)
                budget -= 1
                if budget <= 0:
                    break
        return np.asarray(Il, np.int64), np.asarray(Jl, np.int64)

    def __call__(self, g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        _clamp_arrow_pool()
        key_col, id_col = self.key_col, self.id_col
        n = g.num_rows
        if n == 0:
            return _PAIR_SCHEMA_EMPTY()
        order = pc.sort_indices(g, sort_keys=[
            (self.block_col, "ascending"), ("_slice", "ascending"),
            (key_col, "ascending"), (id_col, "ascending")])
        bf = g[self.block_col].take(order).to_numpy(zero_copy_only=False)
        sf = g["_slice"].take(order).to_numpy(zero_copy_only=False)
        kt = g["_k"].take(order).to_numpy(zero_copy_only=False)
        kf = g[key_col].take(order).to_numpy(zero_copy_only=False)
        idf = g[id_col].take(order).to_numpy(zero_copy_only=False)
        uf = (g[self.url_col].take(order).to_numpy(zero_copy_only=False)
              if self.url_col is not None else None)
        seg = np.concatenate(
            ([0], np.flatnonzero((bf[1:] != bf[:-1])
                                 | (sf[1:] != sf[:-1])) + 1,
             [n])).astype(np.int64)
        parts: list[pa.Table] = []
        # every slice of a host carries ALL the host's rows, so the
        # distinct-key array — and therefore the probe trie — is
        # identical across a host's slice segments: build it once per
        # host and reuse it for every slice that landed in this block
        # (the [host, _slice] sort makes a host's slices contiguous)
        last_blk = None
        last_fst = None
        for si in range(len(seg) - 1):
            lo, hi = int(seg[si]), int(seg[si + 1])
            blk = bf[lo]
            s = int(sf[lo])
            k_total = int(kt[lo])
            krows = kf[lo:hi]
            irows = idf[lo:hi]
            change = np.flatnonzero(krows[1:] != krows[:-1]) + 1
            bounds = np.concatenate(([0], change,
                                     [hi - lo])).astype(np.int64)
            keys = krows[bounds[:-1]]
            counts = bounds[1:] - bounds[:-1]
            offsets = bounds[:-1]
            if blk != last_blk:
                last_blk, last_fst = blk, build_probe_trie(keys)
            I, J = self._slice_pairs(keys, s, k_total, last_fst)
            if len(I):
                ia_idx, ib_idx, pid = _expand_cross(counts, offsets,
                                                    I, J)
                A, B = irows[ia_idx], irows[ib_idx]
                KA, KB = keys[I[pid]], keys[J[pid]]
                swap = A > B
                parts.append(_pairs_table(
                    np.where(swap, B, A), np.where(swap, A, B),
                    np.where(swap, KB, KA), np.where(swap, KA, KB),
                    blk))
            if s == 0:
                # whole-host work emitted exactly once, from slice 0
                # (every slice holds all host rows): dup-key id pairs
                # and same-normalized-url pairs
                if (counts > 1).any():
                    a_idx, b_idx = _run_triangle_indices(bounds)
                    parts.append(_pairs_table(
                        irows[a_idx], irows[b_idx], krows[a_idx],
                        krows[a_idx], blk))
                if uf is not None:
                    useg = uf[lo:hi]
                    uord = np.lexsort((irows, useg))
                    us, ui = useg[uord], irows[uord]
                    uk = krows[uord]
                    ub = np.concatenate(
                        ([0], np.flatnonzero(us[1:] != us[:-1]) + 1,
                         [hi - lo])).astype(np.int64)
                    if ((ub[1:] - ub[:-1]) > 1).any():
                        ua, ubx = _run_triangle_indices(ub)
                        parts.append(_pairs_table(
                            ui[ua], ui[ubx], uk[ua], uk[ubx], blk,
                            source="url"))
        if not parts:
            return _PAIR_SCHEMA_EMPTY()
        return pa.concat_tables(parts)


def generate_candidates(docs_ds, d: int = 2, damerau: bool = False,
                        key_col: str = "doc_key", id_col: str = "url",
                        block_col: str = "host",
                        max_pairs_per_key: int = 64,
                        hot_block_rows: int | None = 4096,
                        num_partitions: int = 16,
                        url_col: str | None = None,
                        same_prefix_len: int = 0,
                        slice_rows: int = 4096,
                        mega_block_rows: int = 65536,
                        pre_projected: bool = False):
    """docs(url, doc_key, host, ...) → candidate pairs
    (url_a, url_b, key_a, key_b, block_key). One shuffle on the block
    key for normal blocks; blocks above ``hot_block_rows`` take the
    mega-block path (:func:`generate_hot_candidates`): FST built once
    per hot block, broadcast via ``ray.put``, probed by an actor pool —
    so a hot host parallelizes across the cluster instead of
    serializing in one giant group task (SURVEY.md §4.2 skew handling).

    ``hot_block_rows`` marks the point where a host is too big for ONE
    group task. Probe cost is SUPERLINEAR in host keys on
    near-dup-dense blocks (measured: 6k rows ≈ 1.5 s but 18k ≈ 9 s),
    so the threshold bounds the normal path's straggler task at ~1 s
    and everything above it takes the parallel sharded-FST path —
    whose fixed wall (build barrier + actor ramp) is now small enough
    (ref-only blobs, Arrow-IPC decode, fine-grained probe stream)
    that routing a handful of hosts through it beats one multi-second
    serial probe at every fixture size measured (250k/500k/1M).

    ``url_col``: also emit exact same-normalized-url pairs
    (``source='url'``) within the same block pass.
    """
    cols = [id_col, key_col, block_col] + ([url_col] if url_col else [])
    if pre_projected:
        # caller guarantees docs_ds is ALREADY the materialized narrow
        # projection (run_er shares one slim materialize between this
        # stage and the clustering seeds) — skip the redundant
        # projection pass
        slim = docs_ds
    else:
        slim = docs_ds.select_columns(cols)
        if hot_block_rows is not None:
            # the hot-block split consumes ``slim`` up to three times
            # (size pass + normal + hot branch); pin the slim PROJECTION
            # (ids/keys only — no document payload) in the object store
            # so the upstream pipeline doesn't re-execute per consumer
            # (spillable blocks, never driver memory)
            slim = slim.materialize()
    inst = BlockCandidates(d=d, damerau=damerau, key_col=key_col,
                           id_col=id_col, block_col=block_col,
                           max_pairs_per_key=max_pairs_per_key,
                           url_col=url_col,
                           same_prefix_len=same_prefix_len)

    def block_candidates(g):
        return inst(g)

    hot_blocks: list = []
    if hot_block_rows is not None:
        # partial-count combiner instead of a groupby barrier: each
        # block contributes per-host counts ABOVE hot_block_rows /
        # n_blocks, and the driver sums the survivors. Rows reaching
        # the driver stay bounded by N·B/hot_block_rows instead of
        # one row per distinct host. The summed count can miss up to
        # cutoff rows per block, so detection is guaranteed for any
        # host ≥ 2× the threshold and best-effort in (1×, 2×) — the
        # threshold is a serial-work bound, and the normal path
        # absorbs a ≤ 2× host at ≤ ~2× the target task wall. The full
        # groupby shuffle this replaces was a serial-prefix barrier
        # ahead of every candidates run.
        cutoff = max(1, hot_block_rows // max(1, slim.num_blocks()))

        def _partial_counts(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            agg = pa.TableGroupBy(
                t.select([block_col]), block_col).aggregate(
                    [([], "count_all")])
            agg = agg.rename_columns([block_col, "n"])
            return agg.filter(pc.greater(agg["n"], cutoff))

        hot_sizes: dict = {}
        for part in (slim.select_columns([block_col])
                     .map_batches(_partial_counts, batch_size=None,
                                  batch_format="pyarrow")
                     .take_all()):
            blk, nn = part[block_col], int(part["n"])
            hot_sizes[blk] = hot_sizes.get(blk, 0) + nn
        hot_sizes = {blk: nn for blk, nn in hot_sizes.items()
                     if nn > hot_block_rows}
        hot_blocks = sorted(hot_sizes)

    # one range-partition sort co-locates each host; every block then
    # processes ALL its (whole) hosts in one vectorized call — the
    # per-group ``map_groups`` machinery dominated wall time at 25k
    # mostly-tiny hosts. Ray's sort never splits equal keys across
    # partitions (the invariant _equal_value_pairs/dedupe_pairs
    # already rely on), and hot hosts (> hot_block_rows) are routed
    # away below, so a normal block always holds its hosts whole.
    #
    # Sort fan-out: the sort's reducer count equals its input block
    # count, and probe work per block is SKEWED (pair density, not
    # rows), so inheriting the upstream block count (often ≈ #input
    # files) leaves the probe stage with a handful of multi-second
    # straggler tasks — measured at 500k pages the stage burned 75 s
    # of CPU across 16 tasks with a 12 s max while 32 CPUs idled.
    # 2 tasks per CPU bounds the straggler tail at roughly the
    # largest sub-threshold host's probe cost.
    def _sort_fanout(ds) -> int:
        import ray
        n_cpu = int(ray.cluster_resources().get("CPU", 8))
        return max(num_partitions, 2 * n_cpu)

    if not hot_blocks:
        return (slim.repartition(_sort_fanout(slim))
                .sort(block_col)
                .map_batches(block_candidates, batch_size=None,
                             batch_format="pyarrow"))

    # three tiers by host size: normal in-block (≤ hot_block_rows),
    # slice-replicated (≤ mega_block_rows — K copies of the host's
    # slim rows, one full-host trie + one query slice per task), and
    # the ref-only broadcast-shard actor pool for true mega hosts
    # (replication would amplify data by rows/slice_rows there).
    mid_sizes = {blk: nn for blk, nn in hot_sizes.items()
                 if nn <= mega_block_rows}
    mega_sizes = {blk: nn for blk, nn in hot_sizes.items()
                  if nn > mega_block_rows}

    def split_in(names: set, keep: bool):
        vals = pa.array(sorted(names))

        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            mask = pc.is_in(t[block_col].cast(pa.string()),
                            value_set=vals)
            return t.filter(mask if keep else pc.invert(mask))
        return fn

    normal = (slim.map_batches(split_in(set(hot_blocks), False),
                               batch_format="pyarrow")
              .repartition(_sort_fanout(slim))
              .sort(block_col)
              .map_batches(block_candidates, batch_size=None,
                           batch_format="pyarrow"))
    streams = [normal]

    if mid_sizes:
        k_of = {blk: max(2, -(-nn // slice_rows))
                for blk, nn in mid_sizes.items()}

        def replicate(t: pa.Table) -> pa.Table:
            blocks = t[block_col].to_numpy(zero_copy_only=False)
            ks = np.array([k_of[b] for b in blocks], np.int64)
            rep = np.repeat(np.arange(len(blocks), dtype=np.int64), ks)
            starts = np.concatenate(([0], np.cumsum(ks)[:-1]))
            slices = (np.arange(len(rep), dtype=np.int64)
                      - np.repeat(starts, ks))
            out = t.take(pa.array(rep))
            out = out.append_column(
                "_slice", pa.array(slices, pa.int32()))
            return out.append_column(
                "_k", pa.array(ks[rep].astype(np.int32), pa.int32()))

        slice_inst = SliceCandidates(
            d=d, damerau=damerau, key_col=key_col, id_col=id_col,
            block_col=block_col, max_pairs_per_key=max_pairs_per_key,
            url_col=url_col, same_prefix_len=same_prefix_len)

        def slice_candidates(g):
            return slice_inst(g)

        streams.append(
            slim.map_batches(split_in(set(mid_sizes), True),
                             batch_format="pyarrow")
            .map_batches(replicate, batch_format="pyarrow")
            .repartition(_sort_fanout(slim))
            .sort([block_col, "_slice"])
            .map_batches(slice_candidates, batch_size=None,
                         batch_format="pyarrow"))

    if mega_sizes:
        streams.append(generate_hot_candidates(
            slim.map_batches(split_in(set(mega_sizes), True),
                             batch_format="pyarrow"),
            d=d, damerau=damerau, key_col=key_col, id_col=id_col,
            block_col=block_col, max_pairs_per_key=max_pairs_per_key,
            url_col=url_col, same_prefix_len=same_prefix_len,
            block_sizes=mega_sizes))
    return streams[0] if len(streams) == 1 else streams[0].union(
        *streams[1:])


def _pack_blocks(sizes: dict, cap: int) -> list[list]:
    """Greedy first-fit-decreasing bin pack of hot blocks into groups
    whose blob-byte totals stay ≤ ``cap``. A single block larger than
    ``cap`` gets its own group: all shards of one block must be
    co-resident in a probe actor (the across-shard match budget merges
    there), so a block is the indivisible packing unit."""
    groups: list[list] = []
    totals: list[int] = []
    for blk in sorted(sizes, key=lambda b: (-sizes[b], b)):
        for gi in range(len(groups)):
            if totals[gi] + sizes[blk] <= cap:
                groups[gi].append(blk)
                totals[gi] += sizes[blk]
                break
        else:
            groups.append([blk])
            totals.append(sizes[blk])
    return groups


def generate_hot_candidates(hot_docs, d: int = 2, damerau: bool = False,
                            key_col: str = "doc_key", id_col: str = "url",
                            block_col: str = "host",
                            max_pairs_per_key: int = 64,
                            probe_concurrency=None,
                            url_col: str | None = None,
                            same_prefix_len: int = 0,
                            shard_rows: int = 32768,
                            broadcast_max_bytes: int = 256 * 2 ** 20,
                            block_sizes: dict | None = None):
    """Mega-block fuzzy candidates: per hot block build SHARDED FSTs
    over its distinct keys — shard = stable hash(key) mod
    ceil(rows / shard_rows), so one mega-host never serializes its
    whole index build into a single task (build work per task is
    bounded by ``shard_rows`` no matter how hot the block gets).

    Blob movement is ref-only past the build tasks: each build task
    ``ray.put``\\ s its own shard blob into the object store and returns
    just ``(block, nbytes, ObjectRef)`` through the Dataset, so the
    driver materializes O(#shards) rows of refs — never the blobs
    themselves. If the total index exceeds ``broadcast_max_bytes`` the
    hot blocks are bin-packed into groups each ≤ the gate and probed
    group-by-group (probe stream filtered per group), bounding every
    probe actor's resident index at the gate no matter how many hot
    hosts the corpus has; below the gate it is a single pass, with the
    blobs flowing object-store → actor directly (the pre-round-4 path
    pulled every blob through the driver heap first). Shard blobs are
    owned by the build workers (in-task ``ray.put``); the stage is
    short-lived and ER checkpointing covers worker loss.

    Probing: (block, key) rows go through a parallel actor pool
    (per-batch deduped; cross-batch repeats collapse in the downstream
    pair dedup). A probe runs against every shard of its block and
    merges; url pairs expand IN the actors from the key→ids maps that
    ride with the FSTs (ids per key ~1-3, so the maps are the same
    order of size as the blobs; this replaces two whole sort-merge
    joins and their sorts). A probe emits only matches ``mk > k`` —
    each key pair exactly once, mirroring BlockCandidates' symmetric
    self-join; the max-pairs budget takes the ``max_pairs_per_key``
    smallest matched keys across shards (== first-N-in-search-order on
    an unsharded FST). Same-key expansion and same-norm-url pairs are
    vectorized (CSR cross-product / triangle kernels — no per-row
    Python emit loops).
    """
    import ray
    from orchid_fst_ray.functions.blocks import compact_nonempty

    if probe_concurrency is None:
        # start MOST of the pool immediately: autoscaling from a
        # 2-actor floor is too slow for a short probe stage (the pool
        # would run half the stage underparallelized)
        n_cpu = int(ray.cluster_resources().get("CPU", 8))
        probe_concurrency = (max(2, n_cpu // 2), max(4, n_cpu))

    docs_small = compact_nonempty(
        hot_docs.map_batches(lambda t: pa.table(
            {block_col: t[block_col].cast(pa.string()),
             key_col: t[key_col].cast(pa.string()),
             id_col: t[id_col].cast(pa.string())}
            | ({url_col: t[url_col].cast(pa.string())} if url_col else {})),
            batch_format="pyarrow"),
        schema=pa.schema([(block_col, pa.string()),
                          (key_col, pa.string()),
                          (id_col, pa.string())]
                         + ([(url_col, pa.string())] if url_col else [])))

    # shard assignment: same key → same shard (ids maps stay whole);
    # shard count scales with block size so FST-build work per task is
    # bounded by ~shard_rows however hot the block is. The caller's
    # hot-detection counts are reused when provided — recounting here
    # cost a whole extra groupby barrier per run.
    if block_sizes is None:
        from ray.data.aggregate import Count
        block_sizes = {
            r[block_col]: int(r["n"])
            for r in (docs_small.select_columns([block_col])
                      .groupby(block_col)
                      .aggregate(Count(alias_name="n")).take_all())}
    shard_counts = {blk: max(1, -(-int(nn) // shard_rows))
                    for blk, nn in block_sizes.items()}

    def add_shard(t: pa.Table) -> pa.Table:
        # Vectorized routing: any stable hash works here — shard
        # membership only affects task grouping, never the pairs
        # output (same key → same shard keeps the key→id maps whole;
        # test_shard_layout_invariance pins output identity across
        # layouts). Runs on the HOTTEST hosts, so per-row Python (the
        # old zlib.crc32 comprehension) multiplied by exactly the
        # largest row groups in the corpus.
        from orchid_fst_ray.functions.hashing import hash64
        h = hash64(t[key_col])
        benc = t[block_col].combine_chunks().dictionary_encode()
        mods = np.array([shard_counts.get(b, 1)
                         for b in benc.dictionary.to_pylist()],
                        dtype=np.uint64)
        codes = benc.indices.to_numpy(zero_copy_only=False)
        shard = (h % mods[codes]).astype(np.int32)
        return t.append_column("shard", pa.array(shard, pa.int32()))

    def build(g: pd.DataFrame) -> pd.DataFrame:
        # probe trie with value = key rank, so the batched prober can
        # return match indices without tracking path strings. The
        # vectorized trie builder (~20x less build time than the
        # minimal streaming builder; roundtrip-parity pinned in
        # test_batch_fuzzy) keeps per-task build cost bounded at the
        # shard_rows cap — fewer shards means each probe key walks
        # fewer FSTs, and probe work per hot block scales with
        # keys × shards.
        # The key→id rows ride along with the FST as an Arrow IPC
        # stream sorted by (key, id): ids per key ~1-3, so the table
        # is the same order of size as the blob, and expanding url
        # pairs IN the probe actors replaces two whole sort-merge
        # joins. IPC (not pickle-of-dicts) matters because EVERY pool
        # actor decodes every blob in __init__ — the dict roundtrip
        # was ~1 s of per-actor CPU × pool size at 6 hot hosts.
        # The blob goes STRAIGHT to the object store from this task;
        # only the (block, nbytes, ref) triple travels to the driver.
        import pyarrow.compute as pc
        t = pa.table({
            key_col: pa.array(g[key_col].tolist(), pa.large_string()),
            id_col: pa.array(g[id_col].tolist(), pa.large_string())})
        t = t.take(pc.sort_indices(
            t, sort_keys=[(key_col, "ascending"),
                          (id_col, "ascending")]))
        uniq = np.unique(np.asarray(g[key_col].tolist(), dtype=str))
        fst_bytes = build_probe_trie(uniq).to_bytes()
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        ids_bytes = sink.getvalue().to_pybytes()
        ref = ray.put((fst_bytes, ids_bytes))
        return pd.DataFrame({
            block_col: [g[block_col].iloc[0]],
            "nbytes": [len(fst_bytes) + len(ids_bytes)],
            "ref": [ref]})

    # O(#shards) tiny rows of (block, nbytes, ObjectRef) — the blobs
    # themselves never touch the driver heap
    ref_rows = (docs_small.select_columns([block_col, key_col, id_col])
                .map_batches(add_shard, batch_format="pyarrow")
                .groupby([block_col, "shard"])
                .map_groups(build, batch_format="pandas")
                .take_all())
    refs_by_block: dict[str, list] = {}
    sizes_by_block: dict[str, int] = {}
    for r in ref_rows:
        refs_by_block.setdefault(r[block_col], []).append(r["ref"])
        sizes_by_block[r[block_col]] = (
            sizes_by_block.get(r[block_col], 0) + int(r["nbytes"]))
    total_bytes = sum(sizes_by_block.values())
    if total_bytes <= broadcast_max_bytes:
        groups = [list(refs_by_block)] if refs_by_block else []
    else:
        groups = _pack_blocks(sizes_by_block, broadcast_max_bytes)

    class Probe:
        def __init__(self, refs_by_block, d, damerau, cap,
                     same_prefix_len=0):
            from orchid_fst_ray.fst import Fst
            _clamp_arrow_pool()
            # blk → [(fst, shard_keys, shard_key_gidx), ...]; the
            # merged key→id table becomes a CSR over the SORTED block
            # keys so the emit path is pure numpy gathers. Shard key
            # sets are disjoint (same key always hashes to the same
            # shard), so the merge is a plain union. Decode is
            # vectorized end-to-end (Arrow IPC → numpy unique /
            # lexsort): every pool actor pays it per blob in __init__,
            # so per-element Python here multiplied by pool size.
            flat = [(blk, r) for blk, refs in refs_by_block.items()
                    for r in refs]
            blobs = ray.get([r for _, r in flat]) if flat else []
            raw: dict[str, list] = {}
            for (blk, _), (fb, ib) in zip(flat, blobs):
                raw.setdefault(blk, []).append((fb, ib))
            self.shards: dict[str, list] = {}
            self.index: dict[str, tuple] = {}
            for blk, shard_blobs in raw.items():
                decoded = []
                shard_tables = []
                for fb, ib in shard_blobs:
                    shard_tables.append(
                        pa.ipc.open_stream(pa.BufferReader(ib))
                        .read_all())
                    decoded.append(Fst.from_bytes(fb))
                import pyarrow.compute as pc
                allt = pa.concat_tables(shard_tables)
                # shards are each (key, id)-sorted; the union needs
                # one global sort so the CSR runs are contiguous.
                # Arrow-native throughout: C++ sort + run-end
                # detection instead of np.lexsort/np.unique over
                # object arrays — every pool actor pays this decode
                # per blob in __init__, so per-element Python here
                # multiplied by pool size. UTF-8 byte order equals
                # codepoint order, so Arrow's sort ranks agree with
                # the numpy <U / object comparisons used downstream.
                allt = allt.take(pc.sort_indices(
                    allt, sort_keys=[(allt.schema.names[0], "ascending"),
                                     (allt.schema.names[1], "ascending")]))
                keys_col = allt.column(0).combine_chunks()
                flat_ids = allt.column(1).combine_chunks().to_numpy(
                    zero_copy_only=False)
                n_rows = len(keys_col)
                if n_rows:
                    neq = pc.not_equal(
                        keys_col.slice(1),
                        keys_col.slice(0, n_rows - 1)).to_numpy(
                            zero_copy_only=False)
                    bounds = np.concatenate(
                        ([0], np.flatnonzero(neq) + 1, [n_rows]))
                else:
                    bounds = np.zeros(1, np.int64)
                keys_sorted = keys_col.take(
                    pa.array(bounds[:-1], pa.int64())).to_numpy(
                        zero_copy_only=False)
                id_counts = np.diff(bounds).astype(np.int64)
                id_offsets = bounds[:-1].astype(np.int64)
                self.index[blk] = (keys_sorted, id_counts, id_offsets,
                                   flat_ids)
                shards = []
                for fst, st in zip(decoded, shard_tables):
                    skc = st.column(0).combine_chunks()
                    m = len(skc)
                    if m:
                        sneq = pc.not_equal(
                            skc.slice(1),
                            skc.slice(0, m - 1)).to_numpy(
                                zero_copy_only=False)
                        sb = np.concatenate(
                            ([0], np.flatnonzero(sneq) + 1))
                        sk = skc.take(
                            pa.array(sb, pa.int64())).to_numpy(
                                zero_copy_only=False)
                    else:
                        sk = np.zeros(0, dtype=object)
                    shards.append((fst, sk,
                                   np.searchsorted(keys_sorted, sk)
                                   if len(sk) else np.zeros(0, np.int64)))
                self.shards[blk] = shards
            self.d = d
            self.damerau = damerau
            self.cap = cap
            self.same_prefix_len = same_prefix_len

        def __call__(self, t: pa.Table) -> pa.Table:
            from orchid_fst_ray.fst import fuzzy_automaton
            parts: list[pa.Table] = []
            if t.num_rows == 0:
                return _PAIR_SCHEMA_EMPTY()
            # batch-local distinct probes (Arrow C++ hash aggregate),
            # grouped per block so the batched prober runs once per
            # (block, shard)
            distinct = t.select([block_col, key_col]).group_by(
                [block_col, key_col]).aggregate([])
            db = np.asarray(distinct[block_col].to_pylist(), object)
            dk = np.asarray(distinct[key_col].to_pylist(), object)
            order = np.argsort(db, kind="stable")
            db, dk = db[order], dk[order]
            starts = np.concatenate(
                ([0], np.flatnonzero(db[1:] != db[:-1]) + 1, [len(db)]))
            for s, e in zip(starts[:-1], starts[1:]):
                blk = db[s]
                pkeys = list(dk[s:e])
                keys_sorted, id_counts, id_offsets, flat_ids = \
                    self.index[blk]
                q_g = np.searchsorted(keys_sorted, np.array(pkeys))
                I_parts: list[np.ndarray] = []
                J_parts: list[np.ndarray] = []
                for fst, skeys, skeys_g in self.shards[blk]:
                    if (self.same_prefix_len == 0
                            and self.d <= MAX_BATCH_D):
                        # vectorized: all probe keys walk this shard's
                        # FST together (pair-for-pair equal to the
                        # scalar loop; chunked — unchunked frontiers
                        # go superlinear past ~256 queries)
                        qi, mv = batch_fuzzy_matches_chunked(
                            fst, pkeys, self.d, self.damerau)
                        gm = skeys_g[mv]
                        keep = gm > q_g[qi]
                        I_parts.append(q_g[qi][keep])
                        J_parts.append(gm[keep])
                    else:
                        qs: list[int] = []
                        ms: list[int] = []
                        for q, k in enumerate(pkeys):
                            aut = fuzzy_automaton(
                                k, self.d, self.same_prefix_len,
                                self.damerau)
                            budget = self.cap
                            for mk, midx in fst.search(aut):
                                if mk <= k:
                                    continue
                                qs.append(q)
                                ms.append(midx)
                                budget -= 1
                                if budget <= 0:
                                    break
                        I_parts.append(q_g[np.asarray(qs, np.int64)])
                        J_parts.append(
                            skeys_g[np.asarray(ms, np.int64)])
                I = np.concatenate(I_parts) if I_parts else \
                    np.zeros(0, np.int64)
                J = np.concatenate(J_parts) if J_parts else \
                    np.zeros(0, np.int64)
                if len(I):
                    # budget ACROSS shards: the cap smallest matched
                    # keys == first-cap-in-search-order on an
                    # unsharded FST (key order == sorted-gidx order)
                    o = np.lexsort((J, I))
                    I, J = I[o], J[o]
                    run_start = np.zeros(len(I), np.int64)
                    new = np.flatnonzero(I[1:] != I[:-1]) + 1
                    run_start[new] = new
                    np.maximum.accumulate(run_start, out=run_start)
                    rank = np.arange(len(I), dtype=np.int64) - run_start
                    keep = rank < self.cap
                    I, J = I[keep], J[keep]
                if len(I):
                    ia_idx, ib_idx, pid = _expand_cross(
                        id_counts, id_offsets, I, J)
                    A, B = flat_ids[ia_idx], flat_ids[ib_idx]
                    KA = keys_sorted[I[pid]]
                    KB = keys_sorted[J[pid]]
                    swap = A > B
                    parts.append(_pairs_table(
                        np.where(swap, B, A), np.where(swap, A, B),
                        np.where(swap, KB, KA), np.where(swap, KA, KB),
                        blk))
                # exact-duplicate keys: ids sharing a key (repeat
                # probes across batches collapse in dedupe_pairs);
                # ids are sorted within each key, so the triangle
                # kernel already emits canonical (a < b) pairs
                multi = q_g[id_counts[q_g] > 1]
                if len(multi):
                    sizes = id_counts[multi]
                    gstart = id_offsets[multi]
                    tot = int(sizes.sum())
                    seg = np.concatenate(
                        ([0], np.cumsum(sizes)[:-1])).astype(np.int64)
                    local = (np.arange(tot, dtype=np.int64)
                             - np.repeat(seg, sizes))
                    ids_run = flat_ids[np.repeat(gstart, sizes) + local]
                    rb = np.concatenate(([0], np.cumsum(sizes)))
                    a_idx, b_idx = _run_triangle_indices(
                        rb.astype(np.int64))
                    krep = np.repeat(keys_sorted[multi],
                                     (sizes * (sizes - 1)) // 2)
                    parts.append(_pairs_table(
                        ids_run[a_idx], ids_run[b_idx], krep, krep,
                        blk))
            if not parts:
                return _PAIR_SCHEMA_EMPTY()
            return pa.concat_tables(parts)

    # fine-grained probe tasks: the probe stream inherits the upstream
    # block count (often ≈ #input files), which at 16 blocks left the
    # pool half-idle behind 2-3 s straggler tasks; ~2 tasks per actor
    # slot keeps the pool packed while the actors ramp. Materialized
    # ONCE because every bin-packed group branch consumes it — lazy,
    # each branch re-runs the repartition shuffle, and N concurrent
    # AllToAlls + N actor pools deadlocked a small test cluster. The
    # pinned stream is 2 narrow columns over hot rows only (spillable
    # blocks, never driver memory).
    n_cpu_total = int(ray.cluster_resources().get("CPU", 8))
    probe_src = (docs_small.select_columns([block_col, key_col])
                 .repartition(2 * n_cpu_total).materialize())
    group_outs = []
    if isinstance(probe_concurrency, int):
        minc = maxc = probe_concurrency
    else:
        minc, maxc = probe_concurrency
    for gi, blocks in enumerate(groups):
        grp_refs = {b: refs_by_block[b] for b in blocks}
        src = probe_src
        if len(groups) > 1:
            blk_set = pa.array(sorted(blocks))

            def grp_filter(tbl: pa.Table, _s=blk_set) -> pa.Table:
                import pyarrow.compute as pc
                return tbl.filter(pc.is_in(tbl[block_col], value_set=_s))

            src = probe_src.map_batches(grp_filter,
                                        batch_format="pyarrow")
        group_outs.append(src.map_batches(
            Probe,
            fn_constructor_args=(grp_refs, d, damerau,
                                 max_pairs_per_key, same_prefix_len),
            # 1024 distinct keys per walk: each (block, shard) FST is
            # probed once per batch, so bigger batches amortize the
            # level-synchronous prober's per-level kernel cost (the
            # prober still chunks internally at 256 queries to bound
            # frontier blowup); 128 left the hot path walk-bound
            batch_format="pyarrow", batch_size=1024,
            concurrency=(max(1, minc // max(1, len(groups))), maxc),
            num_cpus=1))
    if not group_outs:
        fuzzy_out = probe_src.map_batches(
            lambda t: _PAIR_SCHEMA_EMPTY(), batch_format="pyarrow")
    elif len(group_outs) == 1:
        fuzzy_out = group_outs[0]
    else:
        fuzzy_out = group_outs[0].union(*group_outs[1:])

    # same-norm-url pairs (url ≠ key, so they need their own pass):
    # one range-partition sort + vectorized within-block pairing
    out = fuzzy_out
    if url_col is not None:
        out = out.union(_equal_value_pairs(
            docs_small, block_col, url_col, key_col, id_col, "url"))
    return out


def _pairs_table(a, b, ka, kb, blk, source: str = "fuzzy") -> pa.Table:
    n = len(a)
    return pa.table({
        "url_a": pa.array(a, pa.string()),
        "url_b": pa.array(b, pa.string()),
        "key_a": pa.array(ka, pa.string()),
        "key_b": pa.array(kb, pa.string()),
        "block_key": pa.array([str(blk)] * n, pa.string()),
        "source": pa.array([source] * n, pa.string()),
    })


def _PAIR_SCHEMA_EMPTY() -> pa.Table:
    return pa.table({c: pa.array([], pa.string()) for c in (
        "url_a", "url_b", "key_a", "key_b", "block_key", "source")})


def _run_pairs_table(t: pa.Table, run_cols: list[str], id_col: str,
                     key_col: str, blk_col: str, source: str,
                     dedup: bool) -> pa.Table:
    """All (i < j) row pairs within each equal-``run_cols`` run of the
    (sorted) block ``t``, fully vectorized: only multi-row runs are
    touched (Arrow C++ filter), rows are ordered within each run by
    (id, key) via an Arrow sort (UTF-8 byte order == code-point
    order), optionally deduped on (id, key), then expanded with the
    triangle-index kernel. ``blk_col`` supplies the emitted
    ``block_key`` (constant within a run)."""
    import pyarrow.compute as pc
    from orchid_fst_ray.functions.runs import run_bounds

    bounds = run_bounds(*[t[c] for c in run_cols])
    sizes = (bounds[1:] - bounds[:-1]).astype(np.int64)
    multi = sizes > 1
    if not multi.any():   # all-singleton block: no row materialization
        return _PAIR_SCHEMA_EMPTY()
    sub = t.filter(pa.array(np.repeat(multi, sizes)))
    sizes2 = sizes[multi]
    rid = np.repeat(np.arange(len(sizes2), dtype=np.int64), sizes2)
    st = sub.append_column("_rid", pa.array(rid))
    idx = pc.sort_indices(st, sort_keys=[
        ("_rid", "ascending"), (id_col, "ascending"),
        (key_col, "ascending")]).to_numpy()
    ids = np.asarray(sub[id_col].to_pylist(), dtype=object)[idx]
    keys = np.asarray(sub[key_col].to_pylist(), dtype=object)[idx]
    blks = np.asarray(sub[blk_col].to_pylist(), dtype=object)[idx]
    rid_s = rid[idx]
    if dedup:
        dup = np.zeros(len(ids), dtype=bool)
        dup[1:] = ((rid_s[1:] == rid_s[:-1]) & (ids[1:] == ids[:-1])
                   & (keys[1:] == keys[:-1]))
        kp = ~dup
        ids, keys, blks, rid_s = ids[kp], keys[kp], blks[kp], rid_s[kp]
    counts = np.bincount(rid_s, minlength=len(sizes2)).astype(np.int64)
    rb = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    a_idx, b_idx = _run_triangle_indices(rb)
    return pa.table({
        "url_a": pa.array(ids[a_idx], pa.string()),
        "url_b": pa.array(ids[b_idx], pa.string()),
        "key_a": pa.array(keys[a_idx], pa.string()),
        "key_b": pa.array(keys[b_idx], pa.string()),
        "block_key": pa.array(blks[a_idx], pa.string()),
        "source": pa.array([source] * len(a_idx), pa.string()),
    })


def _equal_value_pairs(docs_small, block_col: str, eq_col: str,
                       key_col: str, id_col: str, source: str):
    """All (url_a < url_b) pairs of rows sharing (block, eq_col) —
    sort co-locates equal values; each block pairs its runs in one
    vectorized pass (duplicate (id, key) rows collapse first)."""

    def block_pairs(t: pa.Table) -> pa.Table:
        return _run_pairs_table(t, [block_col, eq_col], id_col,
                                key_col, block_col, source, dedup=True)

    return (docs_small.sort([block_col, eq_col])
            .map_batches(block_pairs, batch_size=None,
                         batch_format="pyarrow"))


def generate_url_candidates(docs_ds, id_col: str = "url",
                            url_col: str = "norm_url",
                            key_col: str = "doc_key"):
    """Second blocking pass: docs sharing a *normalized url* are the same
    crawled resource — pair them regardless of text distance. Emits the
    same pair schema with score-bypass marker ``source='url'``.

    One range-partition sort co-locates each norm_url; every block then
    pairs ALL its (tiny) groups in one vectorized call — per-group
    ``map_groups`` tasks would dominate wall time at millions of
    mostly-singleton urls."""

    def block_pairs(t: pa.Table) -> pa.Table:
        return _run_pairs_table(t, [url_col], id_col, key_col,
                                url_col, "url", dedup=False)

    return (docs_ds
            .select_columns([id_col, key_col, url_col])
            .sort(url_col)
            .map_batches(block_pairs, batch_size=None,
                         batch_format="pyarrow"))


def dedupe_pairs(pairs_ds, num_partitions: int = 16):
    """SHUFFLE #2 (SURVEY.md §7.3): exact dedup of candidate pairs by
    the canonical ``(url_a, url_b)`` id — one sort on the FULL pair key
    (equal pairs co-locate in one block) + a per-block Arrow C++ hash
    aggregate, cheaper than a reducer-actor hash aggregate on mostly
    1-row groups. Multi-key blocking (host fuzzy + norm_url exact) can
    emit a pair once per key; ``key_a``/``key_b``/``block_key`` are
    functions of the pair so Min is a no-op choice; ``Max(source)``
    keeps url-exact priority ('url' > 'fuzzy', pairs from the norm-url
    block bypass the score threshold)."""

    def reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        agg = pa.TableGroupBy(t, ["url_a", "url_b"]).aggregate(
            [("key_a", "min"), ("key_b", "min"),
             ("block_key", "min"), ("source", "max")])
        return pa.table({
            "url_a": agg["url_a"], "url_b": agg["url_b"],
            "key_a": agg["key_a_min"], "key_b": agg["key_b_min"],
            "block_key": agg["block_key_min"],
            "source": agg["source_max"],
        })

    return pairs_ds.sort(["url_a", "url_b"]).map_batches(
        reduce, batch_size=None, batch_format="pyarrow")
