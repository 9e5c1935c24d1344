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
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from orchid_fst_ray.functions.text import stable_fingerprint

__all__ = ["token_stats", "quality_stats", "lang_id", "doc_fingerprints",
           "STOPWORDS_EN"]

_WORD_PAT = "[A-Za-z0-9]+"

STOPWORDS_EN = ("the", "a", "an", "and", "or", "of", "to", "in", "is",
                "it", "that", "for", "on", "with", "as", "at", "by")
_STOP_DE = ("der", "die", "das", "und", "ist", "ein", "eine", "nicht",
            "mit", "von", "zu", "den", "dem", "sich")
_STOP_FR = ("le", "la", "les", "et", "est", "un", "une", "pas", "avec",
            "de", "du", "des", "que", "pour")


def token_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ (doc_id, n_tokens, n_distinct_tokens, n_chars) per document."""

    def fn(t: pa.Table) -> pa.Table:
        txt = pc.cast(t[text_col], pa.large_string())
        words = pc.split_pattern_regex(
            pc.utf8_lower(txt), pattern="[^A-Za-z0-9]+")
        # split produces empty strings at the edges; count non-empty
        n_tokens = pc.count_substring_regex(txt, pattern=_WORD_PAT)
        distinct = pa.array(
            [len(set(w) - {""}) for w in words.to_pylist()], pa.int64())
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_distinct_tokens": distinct,
            "n_chars": pc.cast(pc.utf8_length(txt), pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def quality_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                  min_tokens: int = 10, max_tokens: int = 100000,
                  stop_hits_required: int = 0):
    """→ (doc_id, n_chars, n_tokens, n_stop, max_run, quality_ok).

    ``quality_ok`` is a pure integer predicate: token count in range,
    mean token length sane (n_chars ≤ 12·n_tokens, and n_tokens ≤
    n_chars), longest repeated-token run < 8, ≥ ``stop_hits_required``
    English stopword hits.
    """
    stop_set = set(STOPWORDS_EN)

    def fn(t: pa.Table) -> pa.Table:
        txt = pc.cast(t[text_col], pa.large_string())
        low = pc.utf8_lower(txt)
        n_tokens = pc.cast(pc.count_substring_regex(low, pattern=_WORD_PAT),
                           pa.int64())
        n_chars = pc.cast(pc.utf8_length(txt), pa.int64())
        words = pc.split_pattern_regex(low, pattern="[^a-z0-9]+")
        n_stop, max_run = [], []
        for w in words.to_pylist():
            w = [x for x in w if x]
            n_stop.append(sum(1 for x in w if x in stop_set))
            run = best = 0
            prev = None
            for x in w:
                run = run + 1 if x == prev else 1
                prev = x
                best = max(best, run)
            max_run.append(best)
        n_stop_a = pa.array(n_stop, pa.int64())
        max_run_a = pa.array(max_run, pa.int64())
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


def lang_id(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ (doc_id, pred_lang) via a stopword + charset heuristic:
    zh when CJK chars dominate, else the language whose stopword list
    hits most tokens (en default). Stateless vectorized map_batches."""
    tables = {"en": set(STOPWORDS_EN), "de": set(_STOP_DE),
              "fr": set(_STOP_FR)}

    def fn(t: pa.Table) -> pa.Table:
        txt = pc.cast(t[text_col], pa.large_string())
        cjk = pc.count_substring_regex(txt, pattern=r"[\x{4E00}-\x{9FFF}]")
        n_char = pc.utf8_length(txt)
        words = pc.split_pattern_regex(
            pc.utf8_lower(txt), pattern="[^a-z0-9]+")
        preds = []
        for w, c, n in zip(words.to_pylist(), cjk.to_pylist(),
                           n_char.to_pylist()):
            if n and c and c * 4 >= n:
                preds.append("zh")
                continue
            w = [x for x in w if x]
            best, best_hits = "en", -1
            for lang, stops in tables.items():
                hits = sum(1 for x in w if x in stops)
                if hits > best_hits:
                    best, best_hits = lang, hits
            preds.append(best)
        return pa.table({id_col: t[id_col],
                         "pred_lang": pa.array(preds, pa.string())})

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


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
