"""Corpus-analytics operators: distinct-count sketch, exact grouped
quantiles, inverted-index build.

All three follow the engine's combiner discipline — shrink every block
to its distinct keys / bounded summary BEFORE the one narrow shuffle —
and all three are exactly SQL-replayable (integer-only outputs; the
HLL sketch exposes its REGISTER TABLE, not the float estimate, so the
DuckDB oracle can recompute it value-for-value).

Reference parity note: the reference engine's counting surface is the
CLI word-count/sort path (reference ``large_file_sort_cmd.cpp:18-47``);
these operators are the distributed analytics a training-data curation
run needs on top of it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from orchid_fst_ray.functions.hashing import hash64_pairs, poly_hash64
from orchid_fst_ray.pipelines.textstats import _explode_tokens

__all__ = ["hll_token_registers", "hll_shingle_registers",
           "hll_estimate", "grouped_quantiles", "inverted_index",
           "heavy_hitters", "bit_length_u64", "length_extremes"]


def bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized ``int.bit_length`` over uint64 (0 → 0) — six halving
    steps, no float log2 (exact for all 64-bit values; a float log2
    misrounds near powers of two above 2**53)."""
    w = np.asarray(w, dtype=np.uint64)
    bl = np.zeros(w.shape, np.int64)
    v = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= np.uint64(1 << s)
        bl[m] += s
        v[m] >>= np.uint64(s)
    bl += (v > 0).astype(np.int64)
    return bl


def _register_rows(h: np.ndarray, p: int) -> pa.Table:
    """uint64 hashes → per-block (register, max_rank) partial: top-p
    bits index the register, the leftmost 1-bit of the remaining
    ``64-p`` bits is the rank (``64-p+1`` when all-zero), reduced to
    the block's per-register MAX (≤ 2**p rows out regardless of block
    size — the combiner that makes HLL the no-shuffle distinct)."""
    n_low = 64 - p
    reg = (h >> np.uint64(n_low)).astype(np.int64)
    w = h & np.uint64((1 << n_low) - 1)
    rank = np.where(w == 0, n_low + 1,
                    n_low - bit_length_u64(w) + 1).astype(np.int64)
    order = np.argsort(reg, kind="stable")
    reg_s, rank_s = reg[order], rank[order]
    starts = np.concatenate(([0], np.nonzero(np.diff(reg_s))[0] + 1))
    return pa.table({
        "register": pa.array(reg_s[starts], pa.int64()),
        "max_rank": pa.array(np.maximum.reduceat(rank_s, starts),
                             pa.int64())})


_EMPTY_REGS = pa.table({"register": pa.array([], pa.int64()),
                        "max_rank": pa.array([], pa.int64())})


def _register_table(ds, partial):
    from ray.data.aggregate import Max
    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("register")
           .aggregate(Max("max_rank", alias_name="max_rank")))
    return out.map_batches(lambda t: pa.table({
        "register": t["register"].cast(pa.int64()),
        "max_rank": t["max_rank"].cast(pa.int64()),
    }), batch_format="pyarrow").sort("register")


def hll_token_registers(ds, text_col: str = "text", p: int = 10):
    """HyperLogLog distinct-token sketch → the register table
    ``(register:int64, max_rank:int64)``, one row per NON-EMPTY
    register (``register = hash >> (64-p)``; ``rank`` = position of
    the leftmost 1-bit in the remaining ``64-p`` bits, ``64-p+1``
    when they are all zero).

    The 100 TB shape is the whole point of HLL: a block's contribution
    is its per-register MAX (at most ``2**p`` rows regardless of block
    size), duplicates collapse for free (same token → same (register,
    rank) → same max), and the single shuffle moves ≤ ``2**p`` rows
    per block into a ``2**p``-row groupby. No global distinct, no
    token ever crosses the wire.

    Exposing the register table rather than the float estimate keeps
    the operator exactly SQL-replayable (the oracle recomputes
    poly_hash64 in HUGEINT and the rank via ``bin()`` length);
    :func:`hll_estimate` turns the table into the cardinality
    estimate, accuracy-gated in pytest (±~3·1.04/sqrt(2**p))."""
    if not (4 <= p <= 16):
        raise ValueError(f"p={p} out of range [4, 16]")

    def partial(t: pa.Table) -> pa.Table:
        flat, _, _ = _explode_tokens(t[text_col])
        if len(flat) == 0:
            return _EMPTY_REGS
        # poly_hash64 alone is NOT register-grade: a polynomial's
        # high bits are near-equal for short/similar tokens ('a'…'z'
        # differ only in low bits → one register). The hash64_pairs
        # self-mix is the avalanche finalizer — and it stays exactly
        # SQL-replayable (the oracle's _sql_mix replays it).
        ph = poly_hash64(flat)
        return _register_rows(hash64_pairs(ph, ph), p)

    return _register_table(ds.select_columns([text_col]), partial)


def hll_shingle_registers(ds, text_col: str = "text", p: int = 10,
                          k: int = 3):
    """HyperLogLog sketch of the corpus's DISTINCT k-token shingles —
    the cardinality a near-dup / decontamination planner sizes its
    bucket tables by. Same register-table contract as
    :func:`hll_token_registers`; the shingle hashes are the engine's
    ``shingle_hashes_flat`` chain (WORD_RE tokens → poly_hash64 →
    hash64_pairs window chain, short-doc whole-text rule), i.e. the
    SAME hash space the MinHash pipeline dedups in, so the estimate
    directly predicts that pipeline's table sizes."""
    from orchid_fst_ray.pipelines.dedup import shingle_hashes_flat

    if not (4 <= p <= 16):
        raise ValueError(f"p={p} out of range [4, 16]")

    def partial(t: pa.Table) -> pa.Table:
        sh, _row, _n = shingle_hashes_flat(t[text_col], k=k)
        if len(sh) == 0:
            return _EMPTY_REGS
        return _register_rows(hash64_pairs(sh, sh), p)

    return _register_table(ds.select_columns([text_col]), partial)


def hll_estimate(registers: np.ndarray, max_ranks: np.ndarray,
                 p: int = 10) -> float:
    """Cardinality estimate from a register table (absent registers
    count as rank 0). Standard HLL: ``alpha_m * m**2 / sum(2**-M[j])``
    with linear counting below ``2.5 * m``."""
    m = 1 << p
    full = np.zeros(m, np.int64)
    full[np.asarray(registers, np.int64)] = np.asarray(max_ranks,
                                                       np.int64)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.power(2.0, -full.astype(np.float64)))
    zeros = int(np.sum(full == 0))
    if raw <= 2.5 * m and zeros > 0:
        return float(m * np.log(m / zeros))
    return float(raw)


def grouped_quantiles(ds, group_col: str, value_col: str,
                      quantiles=((1, 4), (1, 2), (3, 4), (9, 10),
                                 (99, 100))):
    """EXACT per-group quantiles of an integer column →
    ``(group, q:string, value:int64)`` with the nearest-rank
    definition: the ``ceil(q*n)``-th smallest value (1-indexed).

    Quantiles are RATIONAL pairs ``(num, den)`` and the rank is
    ``(num*n + den - 1) // den`` — integer ceil on both the engine and
    the oracle side, because float ``ceil(0.9 * n)`` misrounds when
    ``q*n`` is mathematically integral (0.9*10 → 9.000000000000002).

    The 100 TB shape: per-block value-count partials (a block shrinks
    to its distinct (group, value) pairs) → one groupby over the
    bounded (group, value) key space → the cumulative pick runs on the
    tiny distinct-value table in a single final block. Declared bound:
    distinct (group, value) pairs fit one worker's heap — true for any
    bounded-cardinality integer measure (token counts, sizes, scores);
    for unbounded floats use a histogram sketch instead."""
    from ray.data.aggregate import Sum

    qs = [(int(n), int(d)) for n, d in quantiles]
    for n, d in qs:
        if not (0 < n <= d):
            raise ValueError(f"quantile {n}/{d} out of (0, 1]")
    labels = [f"p{100 * n // d:02d}" for n, d in qs]

    def partial(t: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(
            pa.table({group_col: t[group_col],
                      "value": pc.cast(t[value_col], pa.int64())}),
            [group_col, "value"]).aggregate([([], "count_all")])
        return pa.table({
            group_col: agg[group_col],
            "value": agg["value"].cast(pa.int64()),
            "n": agg["count_all"].cast(pa.int64())})

    counts = (ds.select_columns([group_col, value_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby([group_col, "value"])
              .aggregate(Sum("n", alias_name="n")))

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "q": pa.array([], pa.string()),
                             "value": pa.array([], pa.int64())})
        g = t[group_col].combine_chunks()
        vals = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        cnts = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        codes = g.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((vals, codes))
        codes, vals, cnts = codes[order], vals[order], cnts[order]
        out_g, out_q, out_v = [], [], []
        starts = np.concatenate(
            ([0], np.nonzero(np.diff(codes))[0] + 1, [len(codes)]))
        gd = g.dictionary_encode().dictionary
        for i in range(len(starts) - 1):
            a, b = starts[i], starts[i + 1]
            cum = np.cumsum(cnts[a:b])
            n = int(cum[-1])
            for (num, den), lab in zip(qs, labels):
                k = (num * n + den - 1) // den
                j = int(np.searchsorted(cum, k))
                out_g.append(gd[codes[a]].as_py())
                out_q.append(lab)
                out_v.append(int(vals[a + j]))
        return pa.table({group_col: pa.array(out_g, pa.string()),
                         "q": pa.array(out_q, pa.string()),
                         "value": pa.array(out_v, pa.int64())})

    # the distinct (group, value) table is tiny — one final block
    return (counts.repartition(1)
            .map_batches(pick, batch_size=None, batch_format="pyarrow")
            .sort([group_col, "q"]))


def length_extremes(ds, group_col: str = "lang",
                    value_col: str = "n_chars", id_col: str = "doc_id",
                    lo=(1, 10), hi=(9, 10)):
    """Per-group tail outliers → ``(doc_id, group, value:int64,
    side:string)``: rows whose value falls STRICTLY below the group's
    ``lo`` quantile or strictly above its ``hi`` quantile (exact
    nearest-rank quantiles, same integer-ceil definition as
    :func:`grouped_quantiles` so the SQL replay hash-matches). The
    length-tail filter is the standard first quality gate on a web
    corpus (truncated boilerplate below, concatenation junk above).

    100 TB shape: the per-group bound table is GROUP-CARDINALITY-sized
    (two ints per group), computed by the grouped_quantiles pass and
    broadcast via ``ray.put`` — the data-sized side is ONE pruned
    streaming filter pass, no shuffle."""
    import ray

    qds = grouped_quantiles(ds, group_col, value_col,
                            quantiles=(lo, hi))
    lo_lab = f"p{100 * lo[0] // lo[1]:02d}"
    bounds: dict[str, list] = {}
    for b in qds.iter_batches(batch_format="pyarrow"):
        for g, q, v in zip(b[group_col].to_pylist(),
                           b["q"].to_pylist(), b["value"].to_pylist()):
            bounds.setdefault(g, [None, None])[0 if q == lo_lab else 1] = v
    ref = ray.put(bounds)

    class Flag:
        def __init__(self, ref):
            self.bounds = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            g = t[group_col].combine_chunks()
            v = t[value_col].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            enc = g.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            dlo = np.array([self.bounds[s.as_py()][0]
                            for s in enc.dictionary], np.int64)
            dhi = np.array([self.bounds[s.as_py()][1]
                            for s in enc.dictionary], np.int64)
            low = v < dlo[codes]
            high = v > dhi[codes]
            keep = low | high
            side = np.where(low, "low", "high")
            idx = np.flatnonzero(keep)
            return pa.table({
                id_col: t[id_col].take(pa.array(idx)).cast(pa.int64()),
                group_col: g.take(pa.array(idx)),
                "value": pa.array(v[idx], pa.int64()),
                "side": pa.array(side[idx], pa.string())})

    return (ds.select_columns([id_col, group_col, value_col])
            .map_batches(Flag, fn_constructor_args=(ref,),
                         concurrency=(1, 8), batch_format="pyarrow")
            .sort(id_col))


def inverted_index(ds, text_col: str = "text", id_col: str = "doc_id",
                   min_df: int = 2, max_postings: int = 64):
    """Inverted index over the corpus → ``(term, df:int64,
    postings:string)``: document frequency plus the first
    ``max_postings`` doc ids (ascending, comma-joined) for every term
    with ``df >= min_df``. The dictionary/search-index build is the
    engine's home turf — this is the posting-list companion to the FST
    term dictionary (reference ``fst_cmd.cpp:23-114`` builds the term
    index; the postings are what a search engine attaches to it).

    The 100 TB shape: per-block DISTINCT (term, doc_id) partials (one
    block contributes each pair once), then ONE co-locating sort on
    (term, doc_id) and a block-local fold — the engine's verified
    sort invariant (rows of one key never split across blocks, the
    merge_join contract) makes the block-local df/postings complete.
    Posting lists are CAPPED at ``max_postings`` ids so a stopword's
    row stays bounded; ``df`` still counts all of them."""
    def pairs(t: pa.Table) -> pa.Table:
        flat, row, _n = _explode_tokens(t[text_col])
        if len(flat) == 0:
            return pa.table({"term": pa.array([], pa.large_string()),
                             "doc_id": pa.array([], pa.int64())})
        ids = t[id_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)[row]
        import pandas as pd
        codes, uniq = pd.factorize(flat.to_numpy(zero_copy_only=False))
        # dedup (term, doc) pairs with a ROW-index key (row count per
        # block is bounded, so codes * n_rows never overflows int64 —
        # a doc-ID key could, at 100 TB id ranges)
        id_codes, id_uniq = pd.factorize(ids)
        key = codes.astype(np.int64) * np.int64(len(id_uniq)) + id_codes
        kept = np.unique(key)
        return pa.table({
            "term": pa.array(
                uniq[(kept // len(id_uniq)).astype(np.int64)],
                pa.large_string()),
            "doc_id": pa.array(id_uniq[kept % len(id_uniq)],
                               pa.int64())})

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table({"term": pa.array([], pa.large_string()),
                          "df": pa.array([], pa.int64()),
                          "postings": pa.array([], pa.large_string())})
        if t.num_rows == 0:
            return empty
        terms = t["term"].combine_chunks()
        ids = t["doc_id"].combine_chunks().to_numpy(
            zero_copy_only=False)
        enc = terms.dictionary_encode()
        codes = enc.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        # (term, doc_id) pairs arrive globally unique (each doc lives
        # in exactly one upstream block and the partial dedups there)
        # and grouped by term — the pinned single-key sort invariant
        # (test_ray_sort_colocates_equal_keys) makes this block-local
        # fold each term's COMPLETE posting list. Order ids WITHIN
        # each term run here (sorting upstream on (term, doc_id)
        # would break the invariant: it holds for runs of the FULL
        # sort key, and a term's rows could then split across blocks)
        order = np.lexsort((ids, codes))
        codes, ids = codes[order], ids[order]
        starts = np.concatenate(
            ([0], np.nonzero(np.diff(codes))[0] + 1))
        df = np.diff(np.concatenate((starts, [len(codes)])))
        keep = df >= min_df
        if not keep.any():
            return empty
        starts_k, df_k = starts[keep], df[keep]
        cl = np.minimum(df_k, max_postings)
        # gather the first `cl` ids of each kept term, vectorized
        offs = np.concatenate(([0], np.cumsum(cl)))
        idx = np.repeat(starts_k - offs[:-1], cl) + np.arange(offs[-1])
        id_strs = pc.cast(pa.array(ids[idx], pa.int64()),
                          pa.large_string())
        postings = pc.binary_join(
            pa.LargeListArray.from_arrays(offs, id_strs),
            pa.scalar(",", pa.large_string()))
        return pa.table({
            "term": enc.dictionary.take(
                pa.array(codes[starts_k])).cast(pa.large_string()),
            "df": pa.array(df_k, pa.int64()),
            "postings": postings})

    return (ds.select_columns([id_col, text_col])
            .map_batches(pairs, batch_format="pyarrow")
            .sort("term")
            .map_batches(fold, batch_size=None, batch_format="pyarrow"))


def heavy_hitters(ds, text_col: str = "text", top_n: int = 20,
                  per_block: int = 4096, max_recount: int | None = None,
                  return_info: bool = False):
    """EXACT corpus-wide top-``top_n`` tokens WITHOUT ever shuffling
    the full distinct-token table — the SpaceSaving/Misra-Gries shape
    re-expressed over Ray blocks, with a recount pass that turns the
    sketch into a provably exact answer.

    Pass 1 (truncated combiner): each block counts its tokens exactly
    (Arrow hash aggregate) and ships only its top ``per_block`` rows
    plus ONE scalar ``bnd`` — the count of its first *dropped* token.
    Any token absent from a block's survivors has fewer than ``bnd``
    occurrences there, so the global undercount of ANY token is
    ≤ B = Σ_blocks bnd. The one exchange is over ≤ per_block rows per
    block — chosen, not vocabulary-sized (``term_frequencies`` ships
    every distinct token; at web scale that IS the cost).

    Pass 2 (exact recount): every token whose estimate could still
    reach the top — ``est(x) + B ≥ est`` of the top_n-th candidate —
    is recounted exactly against the full stream through a broadcast
    membership filter (candidate set is O(top_n)-ish; ``max_recount``
    caps it). Tokens never recounted satisfy
    ``f(x) ≤ est(x) + B < est_nth ≤`` every reported count, so when
    the candidate set fits the cap the result is EXACTLY the global
    top_n (ties broken token-asc). ``return_info`` exposes
    ``{"guaranteed": bool, "bound": B, "recounted": k}``.
    """
    import ray
    from ray.data.aggregate import Sum

    from orchid_fst_ray.pipelines.textstats import _explode_tokens

    if max_recount is None:
        max_recount = 64 * top_n

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"token": pa.array([], pa.large_string()),
                          "n": pa.array([], pa.int64()),
                          "bnd": pa.array([], pa.int64())})
        flat, _, _ = _explode_tokens(t[text_col])
        if len(flat) == 0:
            return empty
        agg = pa.TableGroupBy(pa.table({"token": flat}),
                              "token").aggregate([("token", "count")])
        tok = agg["token"].combine_chunks().cast(pa.large_string())
        cnt = agg["token_count"].combine_chunks().cast(pa.int64())
        order = pc.sort_indices(pa.table({"n": cnt, "token": tok}),
                                sort_keys=[("n", "descending"),
                                           ("token", "ascending")])
        keep = order[:per_block]
        dropped = order[per_block:]
        bnd = np.zeros(len(keep), np.int64)
        if len(dropped):
            bnd[0] = cnt.take(dropped[:1])[0].as_py()
        return pa.table({"token": tok.take(keep), "n": cnt.take(keep),
                         "bnd": pa.array(bnd)})

    trunc = (ds.select_columns([text_col])
             .map_batches(partial, batch_format="pyarrow")
             .materialize())
    B = int(trunc.sum("bnd") or 0)
    est = (trunc.groupby("token").aggregate(Sum("n", alias_name="n"))
           .map_batches(lambda t: pa.table({
               "token": t["token"].cast(pa.large_string()),
               "n": t["n"].cast(pa.int64())}), batch_format="pyarrow")
           .sort(["n", "token"], descending=[True, False])
           .materialize())
    head = est.take(top_n)
    if not head:
        out = pa.table({"token": pa.array([], pa.string()),
                        "n": pa.array([], pa.int64())})
        info = {"guaranteed": True, "bound": B, "recounted": 0}
        return ((ray.data.from_arrow(out), info) if return_info
                else ray.data.from_arrow(out))
    est_nth = int(head[-1]["n"])
    thresh = est_nth - B

    def above(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n"], thresh))

    cand_rows = (est.map_batches(above, batch_format="pyarrow")
                 .take(max_recount + 1))
    guaranteed = B == 0 or (B < est_nth
                            and len(cand_rows) <= max_recount)
    cand_rows = cand_rows[:max_recount]
    cands = np.sort(np.asarray([r["token"] for r in cand_rows],
                               dtype=object))
    if B == 0:
        # truncation never dropped anything: est IS exact
        final = pa.table({
            "token": pa.array([r["token"] for r in head], pa.string()),
            "n": pa.array([int(r["n"]) for r in head], pa.int64())})
        info = {"guaranteed": True, "bound": 0, "recounted": 0}
        return ((ray.data.from_arrow(final), info) if return_info
                else ray.data.from_arrow(final))
    ref = ray.put(cands)

    class Recount:
        def __init__(self) -> None:
            self.cands = ray.get(ref)           # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            empty = pa.table({"token": pa.array([], pa.large_string()),
                              "n": pa.array([], pa.int64())})
            flat, _, _ = _explode_tokens(t[text_col])
            if len(flat) == 0:
                return empty
            toks = flat.to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.cands, toks)
            pos_c = np.minimum(pos, len(self.cands) - 1)
            hit = self.cands[pos_c] == toks
            if not hit.any():
                return empty
            agg = pa.TableGroupBy(pa.table({
                "token": pa.array(toks[hit], pa.large_string())}),
                "token").aggregate([("token", "count")])
            return pa.table({
                "token": agg["token"].combine_chunks().cast(
                    pa.large_string()),
                "n": agg["token_count"].combine_chunks().cast(
                    pa.int64())})

    exact = (ds.select_columns([text_col])
             .map_batches(Recount, batch_format="pyarrow",
                          concurrency=(1, 8), num_cpus=1)
             .groupby("token").aggregate(Sum("n", alias_name="n"))
             .map_batches(lambda t: pa.table({
                 "token": t["token"].cast(pa.string()),
                 "n": t["n"].cast(pa.int64())}), batch_format="pyarrow")
             .sort(["n", "token"], descending=[True, False])
             .limit(top_n))
    info = {"guaranteed": bool(guaranteed), "bound": B,
            "recounted": len(cands)}
    return (exact, info) if return_info else exact
