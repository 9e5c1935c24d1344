"""Deterministic hash-sampling tests (`pipelines/sampling.py`):
reproducibility, rate accuracy, nesting across rates, per-stratum
thresholds, and string-key support."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from orchid_fst_ray.pipelines.sampling import (
    GRANULARITY, hash_sample, stratified_sample)

SF = "/root/testdata/sf0.001"


def _ids(ds) -> np.ndarray:
    return np.sort(ds.to_pandas()["doc_id"].to_numpy())


def test_hash_sample_deterministic_and_rate(ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang"])
    a = _ids(hash_sample(docs, 0.2))
    b = _ids(hash_sample(rd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "lang"]), 0.2))
    assert np.array_equal(a, b)                   # reproducible
    n = docs.count()
    assert abs(len(a) / n - 0.2) < 0.1            # rate ±10 pts at n=500


def test_hash_sample_nested(ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id"])
    small = set(_ids(hash_sample(docs, 0.05)).tolist())
    big = set(_ids(hash_sample(docs, 0.3)).tolist())
    assert small <= big                           # threshold nesting


def test_stratified_rates(ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang"])
    out = stratified_sample(docs, {"en": 0.05},
                            default_rate=0.6).to_pandas()
    full = docs.to_pandas()
    n_en = (full["lang"] == "en").sum()
    n_rest = len(full) - n_en
    got_en = (out["lang"] == "en").sum()
    got_rest = len(out) - got_en
    assert got_en / max(n_en, 1) < 0.2            # head downsampled
    assert abs(got_rest / max(n_rest, 1) - 0.6) < 0.15
    # per-stratum keep set == hash_sample at that stratum's rate
    en_only = hash_sample(
        docs.filter(lambda r: r["lang"] == "en"), 0.05).to_pandas()
    assert (np.sort(en_only["doc_id"].to_numpy())
            == np.sort(out[out["lang"] == "en"]["doc_id"].to_numpy())
            ).all()


def test_string_keys_and_edge_rates(ray_session):
    t = pa.table({"doc_id": pa.array([f"u{i}" for i in range(200)]),
                  "lang": pa.array(["en"] * 200)})
    ds = rd.from_arrow(t)
    assert hash_sample(ds, 0.0).count() == 0
    assert hash_sample(ds, 1.0).count() == 200
    mid = hash_sample(ds, 0.5).count()
    assert 60 <= mid <= 140
    assert GRANULARITY == 10_000
