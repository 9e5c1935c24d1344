"""Deterministic corpus sampling — the subset/rebalance ops a 100 TB
training-data pipeline runs before anything expensive.

Both operators are **stateless per-batch filters**: no shuffle, no
driver state, no RNG. The keep/drop decision is a pure function of the
row's key (``poly_hash64(key) % granularity < rate·granularity``), so

- the sample is **reproducible** across runs, workers and cluster
  sizes (resume-safe: a re-run of a failed partition keeps exactly the
  same rows);
- samples are **nested**: the 1 % sample is a strict subset of the
  10 % sample (threshold inclusion), so sweeps over sample sizes reuse
  downstream artifacts;
- the whole thing is **SQL-replicable** value-for-value (the DuckDB
  oracle recomputes the same polynomial hash in HUGEINT — see
  ``__ray_entry__._sql_poly_token``).

At 100 TB this runs as a ``map_batches`` projection-filter right after
the pruned parquet read — wall time is I/O-bound, the hash is one
fused multiply-add per character over the batch's unique keys.

Reference scope note: the reference engine (apollo008/orchid-fst) has
no sampling surface; these are engine-side additions for the
training-data tier, same pattern as ``pipelines/textstats.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from orchid_fst_ray.functions.hashing import poly_hash64

__all__ = ["hash_sample", "stratified_sample", "weighted_sample",
           "GRANULARITY"]

# rate resolution: rates are quantized to 1/GRANULARITY so the engine
# filter and the SQL oracle share one integer threshold semantics
GRANULARITY = 10_000


def _key_hashes(t: pa.Table, key_col: str) -> np.ndarray:
    keys = t[key_col]
    if not pa.types.is_string(keys.type) \
            and not pa.types.is_large_string(keys.type):
        keys = keys.cast(pa.string())
    return poly_hash64(keys.combine_chunks())


def hash_sample(ds, rate: float, key_col: str = "doc_id"):
    """Keep rows where ``poly_hash64(str(key)) % GRANULARITY`` falls
    under ``rate``. Deterministic, nested across rates, shuffle-free."""
    threshold = np.uint64(int(round(rate * GRANULARITY)))
    gran = np.uint64(GRANULARITY)

    def fn(t: pa.Table) -> pa.Table:
        keep = (_key_hashes(t, key_col) % gran) < threshold
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample(ds, rates: dict[str, float], default_rate: float,
                      strat_col: str = "lang",
                      key_col: str = "doc_id"):
    """Per-stratum deterministic sampling — the classic corpus
    rebalance (downsample the head language, keep the tail). Each
    row's threshold comes from its ``strat_col`` value; the keep
    decision stays a pure key-hash function, so every property of
    :func:`hash_sample` (reproducible, nested per stratum, no
    shuffle) carries over."""
    gran = np.uint64(GRANULARITY)
    table = {k: np.uint64(int(round(v * GRANULARITY)))
             for k, v in rates.items()}
    default = np.uint64(int(round(default_rate * GRANULARITY)))

    def fn(t: pa.Table) -> pa.Table:
        strata = t[strat_col].combine_chunks().to_pylist()
        thresholds = np.fromiter(
            (table.get(s, default) for s in strata),
            dtype=np.uint64, count=len(strata))
        keep = (_key_hashes(t, key_col) % gran) < thresholds
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def weighted_sample(ds, weight_col: str = "n_chars",
                    full_weight: int = 1000,
                    key_col: str = "doc_id"):
    """LENGTH-WEIGHTED deterministic Bernoulli sampling: each row is
    kept with probability ``min(weight / full_weight, 1)`` — the
    importance-sampling curation step that keeps long documents and
    thins short ones (a char-budget-proportional corpus subset).
    The keep decision stays a pure key-hash function
    (``poly_hash64(str(key)) % GRANULARITY <
    min(weight, full_weight) · GRANULARITY // full_weight``), so
    every :func:`hash_sample` property carries over: reproducible,
    resume-safe, shuffle-free, nested in ``full_weight`` sweeps, and
    SQL-replicable value-for-value in integer arithmetic."""
    gran = np.uint64(GRANULARITY)

    def fn(t: pa.Table) -> pa.Table:
        w = t[weight_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        thresholds = (np.minimum(w, full_weight).astype(np.uint64)
                      * gran // np.uint64(full_weight))
        keep = (_key_hashes(t, key_col) % gran) < thresholds
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")
