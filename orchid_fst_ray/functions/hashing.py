"""Deterministic vectorized hashing (no PYTHONHASHSEED dependence).

Plays the role of the reference's hash utilities
(/root/reference/src/main/common/common/util/hash_util.h:61-172 —
one-at-a-time string hashes + HashCombine used for shard routing and
node signatures), but vectorized: FNV-1a 64-bit over numpy byte views.
Used for partition routing (`hash(key) % P`), pair ids, minhash seeds —
anywhere a stable cross-process hash is required (Python's builtin
``hash`` is salted per process and must never be used for routing).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["hash64", "hash64_pairs", "minhash_permute",
           "poly_hash64", "minhash_coeffs"]

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)

# poly_hash64 reads <U codepoints via view(np.uint32); that view is the
# raw UCS4 storage in platform byte order. Checked once: the view of
# "A" must read back the codepoint 65 (i.e. storage order and native
# uint32 order agree), otherwise the hash would diverge from the
# codepoint-arithmetic DuckDB replay.
_U_CODEPOINT_VIEW_OK = bool(np.array(["A"]).view(np.uint32)[0] == 65)


def _np_U_little_endian() -> bool:
    return _U_CODEPOINT_VIEW_OK


def poly_hash64(strings) -> np.ndarray:
    """SQL-replicable 64-bit string hash: polynomial over the string's
    CODEPOINTS, ``h = fold(h * FNV_PRIME + cp)`` from the FNV offset,
    mod 2**64. Weaker mixing than :func:`hash64` (siphash) but exactly
    recomputable in DuckDB HUGEINT arithmetic — the dedup/fingerprint
    oracles recompute it value-for-value. Vectorized over the UNIQUE
    strings via the numpy ``<U`` codepoint view (one fused
    multiply-add per character column).

    Input contract (for the SQL-oracle equivalence): strings must be
    NUL-free — numpy ``<U`` storage pads with (and drops trailing)
    U+0000, so values differing only by embedded/trailing NULs hash
    identically (all current callers feed ``[a-z0-9]+`` tokens /
    shingles, which satisfy this). The ``view(np.uint32)`` codepoint
    read also assumes little-endian UCS4 storage, asserted below —
    on a big-endian host the values would differ from the DuckDB
    replay."""
    assert _np_U_little_endian(), \
        "poly_hash64 requires little-endian numpy <U storage"
    if isinstance(strings, (pa.Array, pa.ChunkedArray)):
        strings = strings.to_pylist()
    arr = np.asarray(strings)
    if arr.dtype.kind != "U":
        arr = arr.astype(str)
    if len(arr) == 0:
        return np.zeros(0, dtype=np.uint64)
    uniq, inv = np.unique(arr, return_inverse=True)
    if uniq.dtype.itemsize == 0:        # all-empty-string corner
        return np.full(len(arr), _FNV_OFFSET, dtype=np.uint64)
    codes = uniq.view(np.uint32).reshape(len(uniq), -1).astype(np.uint64)
    h = np.full(len(uniq), _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(codes.shape[1]):
            c = codes[:, j]
            live = c != 0
            h[live] = h[live] * _FNV_PRIME + c[live]
    return h[inv]


def minhash_coeffs(n_perm: int,
                   seed: int = 0x5EED) -> tuple[np.ndarray, np.ndarray]:
    """The (a, b) universal-hash coefficients behind
    :func:`minhash_permute` — exposed so the DuckDB oracle embeds the
    SAME constants (one seeded generator, two consumers)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 61, size=n_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, 1 << 61, size=n_perm, dtype=np.uint64)
    return a, b


def hash64(strings) -> np.ndarray:
    """Deterministic 64-bit hash of each UTF-8 string (vectorized
    C-speed siphash via ``pd.util.hash_array`` with its fixed default
    key — stable across processes/machines, unlike builtin ``hash``).
    Accepts pyarrow array / list / numpy object array; uint64 out."""
    import pandas as pd
    if isinstance(strings, (pa.Array, pa.ChunkedArray)):
        strings = strings.to_pylist()
    arr = np.asarray(strings, dtype=object)
    if len(arr) == 0:
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_array(arr, categorize=False)


def hash64_fnv(strings) -> np.ndarray:
    """Reference FNV-1a 64-bit (pure Python; kept for tests/debug —
    the role of the reference's one-at-a-time hashes,
    hash_util.h:61-157)."""
    out = np.empty(len(strings), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, s in enumerate(strings):
            h = _FNV_OFFSET
            if s is not None:
                for b in s.encode("utf-8"):
                    h = (h ^ np.uint64(b)) * _FNV_PRIME
            out[i] = h
    return out


def hash64_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-sensitive 64-bit mix of two uint64 vectors (HashCombine
    analogue, hash_util.h:169-172)."""
    a = a.astype(np.uint64, copy=False)
    b = b.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        h = a * np.uint64(0x9E3779B97F4A7C15)
        h ^= (b << np.uint64(17)) | (b >> np.uint64(47))
        h *= np.uint64(0xC2B2AE3D27D4EB4F)
        h ^= h >> np.uint64(29)
    return h


def minhash_permute(hashes: np.ndarray, n_perm: int,
                    seed: int = 0x5EED) -> np.ndarray:
    """Universal-hash permutations for MinHash: returns (len, n_perm)
    uint64 matrix ``(a_i * h + b_i) mod p``-style mixes of the input
    64-bit hashes (vectorized)."""
    a, b = minhash_coeffs(n_perm, seed)
    h = hashes.astype(np.uint64, copy=False)[:, None]
    with np.errstate(over="ignore"):
        m = h * a[None, :] + b[None, :]
        m ^= m >> np.uint64(33)
    return m
