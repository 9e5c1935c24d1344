"""Benchmark decontamination — flag training documents that share any
k-token gram with an evaluation/benchmark set. The canonical pre-
training hygiene pass (e.g. strip eval-set overlap before training).

Shape at 100 TB: the benchmark side is SMALL (an eval suite is
10^5–10^7 grams = a few MB of uint64 hashes), so it is collected once,
deduplicated, and **broadcast via ``ray.put``** — the corpus side then
streams through a stateless ``map_batches`` membership scan
(``np.searchsorted`` against the sorted broadcast array). No shuffle,
no join; corpus bytes cross the cluster exactly once.

Gram hashing matches the fingerprint chain the SQL oracles already
replay: token = ``[a-z0-9]+`` run of the lowercased text, token hash =
FNV-style polynomial over codepoints mod 2**64 (``poly_hash64``), gram
hash = the same polynomial folded over the k token hashes (init 0) —
every value recomputable in DuckDB HUGEINT arithmetic.

Reference scope note: the reference engine (apollo008/orchid-fst) has
no decontamination surface; engine-side addition for the training-data
tier (same family as ``pipelines/textstats.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from orchid_fst_ray.functions.hashing import poly_hash64
from orchid_fst_ray.functions.text import _FNV_PRIME
from orchid_fst_ray.pipelines.textstats import _explode_tokens

__all__ = ["benchmark_gram_hashes", "scan_contamination"]


def _gram_hashes(th: np.ndarray, row: np.ndarray, k: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    """k-gram polynomial hashes over a FLAT token-hash array with doc
    boundaries from ``row``: one fused multiply-add per window offset,
    windows crossing a boundary masked out. Returns (gram_hash,
    doc_index) — docs shorter than ``k`` tokens contribute none."""
    m = len(th)
    n_pos = m - k + 1
    if n_pos <= 0:
        return (np.zeros(0, np.uint64), np.zeros(0, np.int64))
    gh = np.zeros(n_pos, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            gh = gh * _FNV_PRIME + th[j:j + n_pos]
    valid = row[:n_pos] == row[k - 1:k - 1 + n_pos]
    return gh[valid], row[:n_pos][valid]


def benchmark_gram_hashes(bench_ds, k: int = 8,
                          text_col: str = "text") -> np.ndarray:
    """Collect the benchmark side's distinct k-gram hashes as one
    sorted uint64 array. Each task ships only its unique hashes
    (8 B/gram); the driver-side union is bounded by the benchmark
    size, which is small by construction — an unbounded corpus does
    NOT belong on this side."""

    def fn(t: pa.Table) -> pa.Table:
        flat, row, _n = _explode_tokens(t[text_col])
        th = poly_hash64(flat)
        gh, _ = _gram_hashes(th, row, k)
        return pa.table({"g": pa.array(np.unique(gh), pa.uint64())})

    parts = bench_ds.map_batches(fn, batch_format="pyarrow").take_all()
    if not parts:
        return np.zeros(0, np.uint64)
    return np.unique(np.array([r["g"] for r in parts], dtype=np.uint64))


def scan_contamination(docs_ds, bench_hashes, k: int = 8,
                       text_col: str = "text",
                       id_col: str = "doc_id"):
    """Stream the corpus through a per-batch k-gram membership scan
    against the broadcast benchmark set. Output one row per input
    document: ``(doc_id, n_grams, n_hits, contaminated)``."""
    import ray
    ref = (bench_hashes if isinstance(bench_hashes, ray.ObjectRef)
           else ray.put(np.asarray(bench_hashes, dtype=np.uint64)))

    class Scan:
        def __init__(self) -> None:
            self.bench = ray.get(ref)          # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t[id_col].combine_chunks().to_numpy(
                zero_copy_only=False)
            n = len(ids)
            flat, row, _n = _explode_tokens(t[text_col])
            th = poly_hash64(flat)
            gh, grow = _gram_hashes(th, row, k)
            n_grams = np.bincount(grow, minlength=n).astype(np.int64)
            if len(self.bench) and len(gh):
                pos = np.searchsorted(self.bench, gh)
                pos = np.minimum(pos, len(self.bench) - 1)
                hit = self.bench[pos] == gh
                n_hits = np.bincount(grow[hit],
                                     minlength=n).astype(np.int64)
            else:
                n_hits = np.zeros(n, np.int64)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "n_grams": pa.array(n_grams, pa.int64()),
                "n_hits": pa.array(n_hits, pa.int64()),
                "contaminated": pa.array(n_hits > 0),
            })

    return docs_ds.map_batches(Scan, concurrency=(1, 4),
                               batch_format="pyarrow")
