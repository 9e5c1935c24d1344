"""Text / url kernels: normalization, tokenization, shingles.

These are the ER-specific per-record transforms SURVEY.md §2.2 adds on
top of the reference's string utilities (StringUtil::Split/Trim,
string_util.cpp:16-47 → pyarrow.compute kernels here). All functions
are batch-vectorized (pyarrow.compute / numpy) — no per-row Python in
hot paths except where a true scalar kernel is required.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "normalize_urls", "url_hosts", "tokenize", "char_ngrams",
    "token_shingles", "doc_keys_from_text", "WORD_RE",
]

# BPE-ish word splitter: runs of alphanumerics or single non-space symbols.
WORD_RE = re.compile(r"[A-Za-z0-9]+|[^\sA-Za-z0-9]")

_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://"


def normalize_urls(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Canonical url: strip scheme, lowercase host, drop ``www.``,
    drop query/fragment, strip one trailing slash. Vectorized."""
    arr = pc.cast(urls, pa.large_string())
    arr = pc.replace_substring_regex(arr, pattern=_SCHEME_RE, replacement="")
    # split off query/fragment
    arr = pc.replace_substring_regex(arr, pattern=r"[?#].*$", replacement="")
    # lowercase the host part only: host = up to first '/'
    host = pc.replace_substring_regex(arr, pattern=r"/.*$", replacement="")
    path = pc.replace_substring_regex(arr, pattern=r"^[^/]*", replacement="")
    host = pc.utf8_lower(host)
    host = pc.replace_substring_regex(host, pattern=r"^www\.", replacement="")
    joined = pc.binary_join_element_wise(
        host, path, pa.scalar("", pa.large_string()))
    return pc.replace_substring_regex(joined, pattern=r"/$", replacement="")


def url_hosts(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Normalized host of each url (the primary blocking key)."""
    arr = pc.cast(urls, pa.large_string())
    arr = pc.replace_substring_regex(arr, pattern=_SCHEME_RE, replacement="")
    host = pc.replace_substring_regex(arr, pattern=r"[/?#].*$", replacement="")
    host = pc.utf8_lower(host)
    host = pc.replace_substring_regex(host, pattern=r"^www\.", replacement="")
    # strip port
    return pc.replace_substring_regex(host, pattern=r":\d+$", replacement="")


def tokenize(texts: pa.ChunkedArray | pa.Array,
             lowercase: bool = True) -> pa.Array:
    """Whitespace+symbol tokenization → list<large_string> per row,
    using Arrow's regex splitter (vectorized)."""
    arr = pc.cast(texts, pa.large_string())
    if lowercase:
        arr = pc.utf8_lower(arr)
    return pc.split_pattern_regex(arr, pattern=r"[^A-Za-z0-9]+")


def char_ngrams(text: str, n: int = 3) -> list[str]:
    """Character n-gram shingles of one string (scalar helper)."""
    if len(text) < n:
        return [text] if text else []
    return [text[i:i + n] for i in range(len(text) - n + 1)]


def token_shingles(tokens: list[str], k: int = 3) -> list[str]:
    """k-token shingles (scalar helper for minhash)."""
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]


def doc_keys_from_text(texts: pa.ChunkedArray | pa.Array,
                       n_tokens: int = 8) -> pa.Array:
    """Fuzzy-blocking key: the first ``n_tokens`` lowercase word tokens
    joined by a single space. This is the string the per-block FST
    indexes and the Levenshtein automaton probes (SURVEY.md §7).
    Vectorized: one regex pass + list slice + join."""
    arr = pc.cast(texts, pa.large_string())
    arr = pc.utf8_lower(arr)
    # unicode-aware split: CJK titles survive as single tokens
    toks = pc.split_pattern_regex(arr, pattern=r"[^\pL\pN]+")
    head = pc.list_slice(toks, 0, n_tokens)
    joined = pc.binary_join(head, pa.scalar(" ", pa.large_string()))
    # strip empties produced by leading separators
    return pc.replace_substring_regex(
        pc.utf8_trim_whitespace(joined), pattern=r"  +", replacement=" ")


# Fingerprint tokenizer: word runs only (same tokenization the ngram-
# Jaccard SQL oracle uses, so the two oracles share one spec).
FP_TOKEN_RE = re.compile(r"[a-z0-9]+")

# FNV-64 offset/prime: the k-gram hash is the classic Karp-Rabin
# polynomial mod 2**64 the winnowing paper assumes (Schleimer et al.,
# SIGMOD'03 §3) — chosen over siphash so a SQL oracle can recompute it
# exactly (DuckDB HUGEINT arithmetic mod 2**64, see __ray_entry__
# ``doc_fingerprints`` oracle).
_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _poly_token_hashes(tokens: list[str]) -> np.ndarray:
    """Polynomial hash of each token (shared spec: ``poly_hash64``)."""
    from orchid_fst_ray.functions.hashing import poly_hash64
    return poly_hash64(tokens)


def stable_fingerprint(texts, window: int = 8, k: int = 3) -> np.ndarray:
    """Winnowing-style rolling-hash document fingerprint: polynomial-
    hash k-token grams (position-sensitive, like winnowing's k-grams),
    take the min hash over each sliding window, mix the distinct
    selected mins into one uint64. Equal fingerprints ⇒ near-identical
    token streams.

    Every step is exactly reproducible in ANSI SQL (the driver's
    DuckDB oracle recomputes it value-for-value): tokens are
    ``[a-z0-9]+`` runs of the lowercased text, token hashes are
    FNV-style polynomials mod 2**64, a k-gram hash folds its k token
    hashes with the same polynomial (init 0; documents shorter than
    ``k`` tokens fold ALL their tokens into one gram), and the final
    mix is :func:`~orchid_fst_ray.functions.hashing.hash64_pairs` over
    the ascending distinct window minima. Empty documents → 0.

    .. versionchanged:: round 3
       The k-gram hash moved from ``pd.util.hash_array`` (siphash —
       not SQL-expressible) to the polynomial above, and tokenization
       from WORD_RE (punctuation tokens) to word runs; fingerprint
       VALUES changed, semantics (winnowing near-dup signature) did
       not."""
    from orchid_fst_ray.functions.hashing import hash64_pairs
    out = np.zeros(len(texts), dtype=np.uint64)
    doc_tokens = [FP_TOKEN_RE.findall((t or "").lower()) for t in texts]
    flat = [tok for toks in doc_tokens for tok in toks]
    if not flat:
        return out
    flat_hashes = _poly_token_hashes(flat)
    offsets = np.cumsum([0] + [len(t) for t in doc_tokens])
    for i, toks in enumerate(doc_tokens):
        if not toks:
            continue
        th = flat_hashes[offsets[i]:offsets[i + 1]]
        with np.errstate(over="ignore"):
            n_grams = max(len(th) - k + 1, 1)
            gh = np.zeros(n_grams, dtype=np.uint64)
            for j in range(min(k, len(th))):
                gh = gh * _FNV_PRIME + th[j:j + n_grams]
        if len(gh) <= window:
            mins = np.array([gh.min()], dtype=np.uint64)
        else:
            sw = np.lib.stride_tricks.sliding_window_view(gh, window)
            mins = sw.min(axis=1)
        acc = np.uint64(0)
        for m in np.unique(mins):
            acc = hash64_pairs(np.array([acc]), np.array([m]))[0]
        out[i] = acc
    return out
