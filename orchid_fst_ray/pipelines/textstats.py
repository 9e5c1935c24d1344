"""Text-analysis stages over a documents table (training-data ops).

All integer/boolean statistics are computed with pyarrow.compute regex
kernels so they are exactly reproducible by a SQL oracle (the driver
hash-compares values — float-free on purpose where an oracle exists).

- token counting: whitespace-free `[A-Za-z0-9]+` word runs (the
  BPE-ish WORD_RE of functions/text.py);
- quality scoring: integer size/shape stats + a boolean keep flag from
  integer comparisons (Gopher-style length & repetition cuts);
- language ID: vectorized stopword/charset n-gram heuristic;
- document fingerprinting: winnowing-style rolling min-hash.

Hot paths are exploded-token kernels: split once with an Arrow regex,
flatten the list column, then express every per-document statistic as
a numpy segment reduce over the (row, token) pairs — no Python loop
touches a token.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from orchid_fst_ray.functions.text import stable_fingerprint

__all__ = ["token_stats", "quality_stats", "lang_id", "doc_fingerprints",
           "pii_scan", "term_frequencies", "repetition_stats",
           "quality_ok_mask", "dup_gram_stats",
           "lang_pred_array", "STOPWORDS_EN"]

_WORD_PAT = "[A-Za-z0-9]+"

STOPWORDS_EN = ("the", "a", "an", "and", "or", "of", "to", "in", "is",
                "it", "that", "for", "on", "with", "as", "at", "by")
_STOP_DE = ("der", "die", "das", "und", "ist", "ein", "eine", "nicht",
            "mit", "von", "zu", "den", "dem", "sich")
_STOP_FR = ("le", "la", "les", "et", "est", "un", "une", "pas", "avec",
            "de", "du", "des", "que", "pour")


def _explode_tokens(txt: pa.ChunkedArray | pa.Array):
    """Lowercase, split on non-alphanumerics, flatten.

    Returns ``(flat, row, n_rows)``: ``flat`` is the non-empty token
    array, ``row[i]`` the (ascending) document index of ``flat[i]``.
    """
    low = pc.utf8_lower(pc.fill_null(pc.cast(txt, pa.large_string()), ""))
    words = pc.split_pattern_regex(low, pattern="[^a-z0-9]+")
    arr = words.combine_chunks() if isinstance(
        words, pa.ChunkedArray) else words
    n = len(arr)
    flat = arr.flatten()
    counts = np.diff(arr.offsets.to_numpy(zero_copy_only=False))
    row = np.repeat(np.arange(n, dtype=np.int64), counts)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return flat.filter(pa.array(keep)), row[keep], n


def _segment_starts(row: np.ndarray, n: int):
    """Per-row contiguous segment bookkeeping for ``reduceat``: returns
    (counts, starts-of-nonempty-rows, nonempty-row mask)."""
    cnt = np.bincount(row, minlength=n) if len(row) else np.zeros(n, np.int64)
    starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    nz = cnt > 0
    return cnt, starts[nz], nz


def _stop_hits(flat: pa.Array, row: np.ndarray, n: int,
               stops: tuple) -> np.ndarray:
    mask = pc.is_in(flat, value_set=pa.array(stops)).to_numpy(
        zero_copy_only=False)
    return np.bincount(row[mask], minlength=n).astype(np.int64)


def token_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ (doc_id, n_tokens, n_distinct_tokens, n_chars) per document."""

    def fn(t: pa.Table) -> pa.Table:
        txt = pc.cast(t[text_col], pa.large_string())
        flat, row, n = _explode_tokens(txt)
        n_tokens = np.bincount(row, minlength=n).astype(np.int64)
        # distinct per row: unique (row, token-code) pairs, then count
        # the survivors per row — one np.unique, no Python sets
        if len(flat):
            codes = flat.dictionary_encode().indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
            key = row * (codes.max() + 1) + codes
            uniq_rows = np.unique(key) // (codes.max() + 1)
            distinct = np.bincount(uniq_rows, minlength=n).astype(np.int64)
        else:
            distinct = np.zeros(n, dtype=np.int64)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_distinct_tokens": pa.array(distinct, pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(txt), pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def _max_token_run(flat: pa.Array, row: np.ndarray, n: int) -> np.ndarray:
    """Longest run of the same consecutive token per row. Vectorized:
    run length ending at token i via a last-reset cumulative max, then
    a per-row segment max (reduceat). Rows with no tokens → 0."""
    m = len(flat)
    if m == 0:
        return np.zeros(n, dtype=np.int64)
    codes = flat.dictionary_encode().indices.to_numpy(
        zero_copy_only=False).astype(np.int64)
    same = (codes[1:] == codes[:-1]) & (row[1:] == row[:-1])
    x = same.astype(np.int64)
    idx = np.arange(len(x), dtype=np.int64)
    last_reset = np.maximum.accumulate(np.where(x == 0, idx, -1))
    runlen = np.ones(m, dtype=np.int64)
    runlen[1:] += np.where(x == 1, idx - last_reset, 0)
    _, red_starts, nz = _segment_starts(row, n)
    out = np.zeros(n, dtype=np.int64)
    if len(red_starts):
        out[nz] = np.maximum.reduceat(runlen, red_starts)
    return out


def quality_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                  min_tokens: int = 10, max_tokens: int = 100000,
                  stop_hits_required: int = 0):
    """→ (doc_id, n_chars, n_tokens, n_stop, max_run, quality_ok).

    ``quality_ok`` is a pure integer predicate: token count in range,
    mean token length sane (n_chars ≤ 12·n_tokens, and n_tokens ≤
    n_chars), longest repeated-token run < 8, ≥ ``stop_hits_required``
    English stopword hits.
    """

    def fn(t: pa.Table) -> pa.Table:
        txt = pc.cast(t[text_col], pa.large_string())
        flat, row, n = _explode_tokens(txt)
        n_tokens = pa.array(
            np.bincount(row, minlength=n).astype(np.int64), pa.int64())
        n_chars = pc.cast(pc.utf8_length(txt), pa.int64())
        n_stop_a = pa.array(_stop_hits(flat, row, n, STOPWORDS_EN),
                            pa.int64())
        max_run_a = pa.array(_max_token_run(flat, row, n), pa.int64())
        ok = pc.and_(
            pc.and_(pc.greater_equal(n_tokens, min_tokens),
                    pc.less_equal(n_tokens, max_tokens)),
            pc.and_(
                pc.and_(pc.less_equal(n_chars,
                                      pc.multiply(n_tokens, 12)),
                        pc.less_equal(n_tokens, n_chars)),
                pc.and_(pc.less(max_run_a, 8),
                        pc.greater_equal(n_stop_a, stop_hits_required))))
        return pa.table({
            id_col: t[id_col],
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_stop": n_stop_a,
            "max_run": max_run_a,
            "quality_ok": ok,
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def quality_ok_mask(txt_col, min_tokens: int = 10,
                    max_tokens: int = 100000,
                    stop_hits_required: int = 0) -> np.ndarray:
    """The ``quality_ok`` predicate of :func:`quality_stats` as a bare
    numpy mask over a text column — the batch-local gate composite
    pipelines filter with (same kernels; keep in sync with
    quality_stats' Arrow expression and its SQL oracle)."""
    txt = pc.cast(txt_col, pa.large_string())
    flat, row, n = _explode_tokens(txt)
    n_tokens = np.bincount(row, minlength=n).astype(np.int64)
    n_chars = np.nan_to_num(pc.utf8_length(txt).to_numpy(
        zero_copy_only=False).astype(np.float64)).astype(np.int64)
    n_stop = _stop_hits(flat, row, n, STOPWORDS_EN)
    max_run = _max_token_run(flat, row, n)
    return ((n_tokens >= min_tokens) & (n_tokens <= max_tokens)
            & (n_chars <= 12 * n_tokens) & (n_tokens <= n_chars)
            & (max_run < 8) & (n_stop >= stop_hits_required))


def lang_pred_array(txt_col) -> np.ndarray:
    """:func:`lang_id`'s prediction as a bare numpy array over a text
    column (same kernels and tie order; keep in sync with lang_id and
    its SQL oracle)."""
    txt = pc.cast(txt_col, pa.large_string())
    cjk = pc.count_substring_regex(
        txt, pattern=r"[\x{4E00}-\x{9FFF}]").to_numpy(
            zero_copy_only=False).astype(np.int64)
    n_char = np.nan_to_num(pc.utf8_length(txt).to_numpy(
        zero_copy_only=False).astype(np.float64)).astype(np.int64)
    flat, row, n = _explode_tokens(txt)
    en = _stop_hits(flat, row, n, STOPWORDS_EN)
    de = _stop_hits(flat, row, n, _STOP_DE)
    fr = _stop_hits(flat, row, n, _STOP_FR)
    pred = np.where((en >= de) & (en >= fr), "en",
                    np.where(de >= fr, "de", "fr"))
    zh = (n_char > 0) & (cjk > 0) & (cjk * 4 >= n_char)
    return np.where(zh, "zh", pred)


def lang_id(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ (doc_id, pred_lang) via a stopword + charset heuristic:
    zh when CJK chars dominate, else the language whose stopword list
    hits most tokens (ties break en > de > fr). Stateless vectorized
    map_batches."""

    def fn(t: pa.Table) -> pa.Table:
        txt = pc.cast(t[text_col], pa.large_string())
        cjk = pc.count_substring_regex(
            txt, pattern=r"[\x{4E00}-\x{9FFF}]").to_numpy(
                zero_copy_only=False).astype(np.int64)
        n_char = pc.utf8_length(txt).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat, row, n = _explode_tokens(txt)
        en = _stop_hits(flat, row, n, STOPWORDS_EN)
        de = _stop_hits(flat, row, n, _STOP_DE)
        fr = _stop_hits(flat, row, n, _STOP_FR)
        pred = np.where((en >= de) & (en >= fr), "en",
                        np.where(de >= fr, "de", "fr"))
        zh = (n_char > 0) & (cjk > 0) & (cjk * 4 >= n_char)
        pred = np.where(zh, "zh", pred)
        return pa.table({id_col: t[id_col],
                         "pred_lang": pa.array(pred, pa.string())})

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


# Shared with the SQL oracle — pyarrow and DuckDB both run RE2, so the
# per-document match COUNTS agree exactly (leftmost-first,
# non-overlapping).
PII_PATTERNS = {
    "n_emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "n_urls": r"https?://[^\s]+",
    "n_ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "n_phones": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
}


def pii_scan(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ (doc_id, n_emails, n_urls, n_ipv4, n_phones, has_pii) — the
    contamination / PII pre-filter a curation run applies before
    training-data export. Pure Arrow regex kernels; a positive count on
    any pattern sets ``has_pii``."""

    def fn(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(t[text_col], pa.large_string()), "")
        cols = {id_col: t[id_col]}
        total = None
        for name, pat in PII_PATTERNS.items():
            c = pc.cast(pc.count_substring_regex(txt, pattern=pat),
                        pa.int64())
            cols[name] = c
            total = c if total is None else pc.add(total, c)
        cols["has_pii"] = pc.greater(total, 0)
        return pa.table(cols)

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def term_frequencies(ds, text_col: str = "text", top_n: int = 50):
    """→ (token, n) — the ``top_n`` most frequent lowercase tokens
    corpus-wide, ties broken by token asc.

    The 100 TB shape: per-block PARTIAL counts (Arrow hash aggregate
    inside ``map_batches``) shrink each block to its distinct tokens
    before the one global shuffle — the combiner pattern that keeps a
    token-frequency job from moving one row per token occurrence."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        flat, _, _ = _explode_tokens(t[text_col])
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.large_string()),
                             "n": pa.array([], pa.int64())})
        agg = pa.TableGroupBy(pa.table({"token": flat}),
                              "token").aggregate([("token", "count")])
        return pa.table({
            "token": agg["token"].combine_chunks().cast(pa.large_string()),
            "n": agg["token_count"].combine_chunks().cast(pa.int64())})

    totals = (ds.select_columns([text_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("token").aggregate(Sum("n", alias_name="n")))

    def cast_out(t: pa.Table) -> pa.Table:
        return pa.table({
            "token": t["token"].cast(pa.large_string()),
            "n": t["n"].cast(pa.int64())})

    # top-N on the (already tiny) distinct-token table
    return (totals.map_batches(cast_out, batch_format="pyarrow")
            .sort(["n", "token"], descending=[True, False])
            .limit(top_n))


def doc_fingerprints(ds, text_col: str = "text", id_col: str = "doc_id",
                     window: int = 8):
    """→ (doc_id, fingerprint: uint64) winnowing-style rolling-hash
    fingerprint (functions/text.py); equal fingerprints ⇒ near-identical
    token streams — the cheap first-pass dedup key."""

    def fn(t: pa.Table) -> pa.Table:
        fps = stable_fingerprint(t[text_col].to_pylist(), window=window)
        return pa.table({id_col: t[id_col],
                         "fingerprint": pa.array(fps, pa.uint64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def salient_terms(ds, top_k: int = 5, text_col: str = "text",
                  id_col: str = "doc_id"):
    """→ (doc_id, rank, term, tf, df) — each document's ``top_k`` most
    CHARACTERISTIC terms: frequent in the document, rare in the corpus,
    ranked by the fully-integer ordering ``(tf DESC, df ASC, term
    ASC)`` (the lexicographic cousin of tf-idf; integer keys keep the
    result exactly SQL-replayable — no float scores to drift).

    The 100 TB shape: document frequencies come from the combiner
    pattern (per-block distinct-(doc, term) partial counts → one
    vocabulary-sized ``groupby``), and the resulting ``(term, df)``
    table is broadcast once via ``ray.put`` — a declared
    vocabulary-fits-in-memory bound, the same contract as the
    brute-force embedding baseline. The per-document ranking pass then
    streams: counts, one searchsorted df attach, one lexsort per
    batch."""
    import ray
    from ray.data.aggregate import Sum

    def df_partial(t: pa.Table) -> pa.Table:
        flat, row, _n = _explode_tokens(t[text_col])
        if len(flat) == 0:
            return pa.table({"term": pa.array([], pa.large_string()),
                             "df": pa.array([], pa.int64())})
        import pandas as pd
        codes, uniq = pd.factorize(flat.to_numpy(zero_copy_only=False))
        pair = np.unique(row.astype(np.int64) * len(uniq) + codes)
        df = np.bincount((pair % len(uniq)).astype(np.int64),
                         minlength=len(uniq)).astype(np.int64)
        return pa.table({"term": pa.array(uniq, pa.large_string()),
                         "df": pa.array(df, pa.int64())})

    df_rows = (ds.select_columns([text_col])
               .map_batches(df_partial, batch_format="pyarrow")
               .groupby("term").aggregate(Sum("df", alias_name="df"))
               ).take_all()                      # vocabulary-sized
    vocab = np.array([r["term"] for r in df_rows])
    order = np.argsort(vocab, kind="stable")
    vocab = vocab[order]
    dfs = np.array([r["df"] for r in df_rows], np.int64)[order]
    ref = ray.put((vocab, dfs))

    class Rank:
        def __init__(self) -> None:
            self.vocab, self.dfs = ray.get(ref)   # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t[id_col].combine_chunks().to_numpy(
                zero_copy_only=False)
            flat, row, _n = _explode_tokens(t[text_col])
            empty = pa.table({
                "doc_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "term": pa.array([], pa.large_string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64())})
            if len(flat) == 0:
                return empty
            import pandas as pd
            codes, uniq = pd.factorize(
                flat.to_numpy(zero_copy_only=False))
            pair, tf = np.unique(
                row.astype(np.int64) * len(uniq) + codes,
                return_counts=True)
            prow = pair // len(uniq)
            pterm = uniq[pair % len(uniq)]
            pdf = self.dfs[np.searchsorted(self.vocab, pterm)]
            # (doc, tf desc, df asc, term asc): lexsort, last key primary
            sel = np.lexsort((pterm, pdf, -tf.astype(np.int64), prow))
            prow, pterm = prow[sel], pterm[sel]
            tf, pdf = tf[sel].astype(np.int64), pdf[sel]
            firsts = np.concatenate(
                ([0], np.cumsum(np.bincount(prow))[:-1]))
            rank = np.arange(len(prow), dtype=np.int64) - firsts[prow] + 1
            keep = rank <= top_k
            return pa.table({
                "doc_id": pa.array(ids[prow[keep]], pa.int64()),
                "rank": pa.array(rank[keep], pa.int64()),
                "term": pa.array(pterm[keep], pa.large_string()),
                "tf": pa.array(tf[keep], pa.int64()),
                "df": pa.array(pdf[keep], pa.int64()),
            })

    return ds.select_columns([id_col, text_col]).map_batches(
        Rank, concurrency=(1, 4), batch_format="pyarrow")


def repetition_stats(ds, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Gopher/RefinedWeb-style per-document repetition signals →
    ``(doc_id, dup_token_ppm, top2gram_ppm, top3gram_ppm)``, all
    integer parts-per-million so the DuckDB oracle replays them
    value-for-value:

    - ``dup_token_ppm``   = ⌊1e6 · (n_tokens − n_distinct) / n_tokens⌋
    - ``top{2,3}gram_ppm`` = ⌊1e6 · occurrences(most frequent n-gram)
      · char_len(n-gram) / char_len(all tokens space-joined)⌋ — the
      fraction of characters covered by the dominant n-gram, the
      classic boilerplate/repetition filter (ties: count desc, gram
      asc). Documents with < n tokens score 0.

    Row-local and shuffle-free: one ``map_batches`` pass; per batch the
    token stream is exploded ONCE and both n-gram sizes reuse the same
    flat arrays (pandas factorize + np.bincount — no Python loop over
    rows or grams)."""
    M = 1_000_000

    def _top_ngram_ppm(toks: np.ndarray, row: np.ndarray,
                       tok_len: np.ndarray, total_len: np.ndarray,
                       n_rows: int, n: int) -> np.ndarray:
        import pandas as pd
        out = np.zeros(n_rows, np.int64)
        if len(toks) < n:
            return out
        # adjacent windows within one doc: all n consecutive tokens
        # share the row id
        same = np.ones(len(toks) - (n - 1), bool)
        for j in range(1, n):
            same &= row[j:len(row) - (n - 1) + j] == \
                row[:len(row) - (n - 1)]
        if not same.any():
            return out
        base = np.flatnonzero(same)
        grow = row[base]
        # gram string key: tokens joined by one space
        parts = [toks[base + j] for j in range(n)]
        gram = parts[0].astype(object)
        for p in parts[1:]:
            gram = gram + " " + p.astype(object)
        glen = sum(tok_len[base + j] for j in range(n)) + (n - 1)
        # count per (row, gram); argmax per row with (count desc,
        # gram asc) tie-break
        codes, uniq = pd.factorize(gram)
        key = grow * np.int64(len(uniq)) + codes
        ukey, cnt = np.unique(key, return_counts=True)
        urow = (ukey // len(uniq)).astype(np.int64)
        ugram = uniq[ukey % len(uniq)]
        # glen for a (row, gram) pair: gather it from any occurrence
        uglen = np.zeros(len(ukey), np.int64)
        slot = np.searchsorted(ukey, key)
        uglen[slot] = glen
        order = np.lexsort((ugram, -cnt, urow))   # row, count desc, gram
        urow_s = urow[order]
        firsts = np.concatenate(
            ([0], np.flatnonzero(urow_s[1:] != urow_s[:-1]) + 1))
        best = order[firsts]
        covered = cnt[best] * uglen[best]
        out[urow[best]] = covered * M // total_len[urow[best]]
        return out

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().cast(pa.int64())
        flat, row, n_rows = _explode_tokens(t[text_col])
        toks = flat.to_numpy(zero_copy_only=False)
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.int64) if len(flat) else np.zeros(0, np.int64)
        n_tok = np.bincount(row, minlength=n_rows).astype(np.int64) \
            if len(row) else np.zeros(n_rows, np.int64)
        # distinct tokens per row (factorize + unique of packed key)
        import pandas as pd
        dup_ppm = np.zeros(n_rows, np.int64)
        total_len = np.ones(n_rows, np.int64)   # guard div-by-zero
        if len(toks):
            codes, uniq = pd.factorize(toks)
            key = row * np.int64(len(uniq)) + codes
            n_dist = np.bincount(
                (np.unique(key) // len(uniq)).astype(np.int64),
                minlength=n_rows).astype(np.int64)
            nz = n_tok > 0
            dup_ppm[nz] = ((n_tok[nz] - n_dist[nz]) * M) // n_tok[nz]
            sums = np.zeros(n_rows, np.int64)
            np.add.at(sums, row, tok_len)
            total_len = np.where(n_tok > 0,
                                 sums + np.maximum(n_tok - 1, 0), 1)
        return pa.table({
            "doc_id": ids,
            "dup_token_ppm": pa.array(dup_ppm, pa.int64()),
            "top2gram_ppm": pa.array(_top_ngram_ppm(
                toks, row, tok_len, total_len, n_rows, 2), pa.int64()),
            "top3gram_ppm": pa.array(_top_ngram_ppm(
                toks, row, tok_len, total_len, n_rows, 3), pa.int64()),
        })

    return (ds.select_columns([id_col, text_col])
            .map_batches(fn, batch_format="pyarrow")
            .sort(id_col))


def dup_gram_stats(ds, k: int = 5, text_col: str = "text",
                   id_col: str = "doc_id"):
    """ExactSubstr-lite duplicated-span statistics → one row per
    document ``(doc_id, n_grams:int64, n_dup:int64)``: ``n_grams`` is
    the number of ``k``-token windows in the doc, ``n_dup`` how many
    of those windows' grams also occur in at least one OTHER document
    (the train-set-internal analogue of ``decontaminate``'s
    train-vs-eval k-gram scan; the Lee et al. ExactSubstr dedup signal
    at token-window granularity).

    100 TB shape — ONE gram-key sort total: per-block gram explosion
    is vectorized (``binary_join_element_wise`` over shifted token
    takes — no per-row Python); the position stream takes a single
    co-locating sort on the gram key (the verified
    each-key-whole-in-one-block invariant), and one block-local
    segment scan derives BOTH the per-gram distinct-doc count and the
    per-row dup flag in place — the first version's separate
    gram-count groupby and position⋈count merge_join collapse into
    this scan (measured 25 s → the sort is now the only exchange).
    Each block then folds to per-doc partials; docs with < k tokens
    enter as zero seeds from a column-pruned id read, so no outer
    join is needed. Grams shuffle by STRING key so the SQL oracle
    replays raw grams — swap in ``poly_hash64`` keys to narrow the
    exchange when collision-tolerance is acceptable."""
    from ray.data.aggregate import Sum

    def gram_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({"gram": pa.array([], pa.large_string()),
                          id_col: pa.array([], pa.int64())})
        flat, row, _n = _explode_tokens(t[text_col])
        if len(flat) < k:
            return empty
        m = len(flat) - (k - 1)
        same = np.ones(m, bool)
        for j in range(1, k):
            same &= row[j:j + m] == row[:m]
        base = np.flatnonzero(same)
        if len(base) == 0:
            return empty
        ids = t[id_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        parts = [flat.take(pa.array(base + j)) for j in range(k)]
        gram = pc.binary_join_element_wise(
            *parts, pa.scalar(" ", pa.large_string()))
        return pa.table({"gram": gram.cast(pa.large_string()),
                         id_col: pa.array(ids[row[base]], pa.int64())})

    def scan(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "n_grams": pa.array([], pa.int64()),
                          "n_dup": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        codes = t["gram"].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, codes))
        codes, ids = codes[order], ids[order]
        n = len(codes)
        new_seg = np.concatenate(([True], codes[1:] != codes[:-1]))
        seg = np.flatnonzero(new_seg)
        lens = np.diff(np.concatenate((seg, [n])))
        # distinct docs per gram segment: doc changes within segment
        new_doc = new_seg | np.concatenate(([True],
                                            ids[1:] != ids[:-1]))
        ndoc = np.add.reduceat(new_doc.astype(np.int64), seg)
        dup = np.repeat(ndoc >= 2, lens).astype(np.int64)
        agg = pa.TableGroupBy(
            pa.table({id_col: pa.array(ids), "dup": pa.array(dup)}),
            [id_col]).aggregate([([], "count_all"), ("dup", "sum")])
        return pa.table({id_col: agg[id_col].cast(pa.int64()),
                         "n_grams": agg["count_all"].cast(pa.int64()),
                         "n_dup": agg["dup_sum"].cast(pa.int64())})

    per_doc = (ds.select_columns([id_col, text_col])
               .map_batches(gram_rows, batch_format="pyarrow")
               .sort("gram")
               .map_batches(scan, batch_size=None,
                            batch_format="pyarrow"))

    seeds = ds.select_columns([id_col]).map_batches(
        lambda t: pa.table({
            id_col: t[id_col].cast(pa.int64()),
            "n_grams": pa.nulls(t.num_rows, pa.int64()).fill_null(0),
            "n_dup": pa.nulls(t.num_rows, pa.int64()).fill_null(0)}),
        batch_format="pyarrow")

    return (per_doc.union(seeds)
            .groupby(id_col)
            .aggregate(Sum("n_grams", alias_name="n_grams"),
                       Sum("n_dup", alias_name="n_dup"))
            .map_batches(lambda t: pa.table({
                id_col: t[id_col].cast(pa.int64()),
                "n_grams": t["n_grams"].cast(pa.int64()),
                "n_dup": t["n_dup"].cast(pa.int64())}),
                batch_format="pyarrow")
            .sort(id_col))
