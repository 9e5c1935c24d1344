"""Decontamination tests (`pipelines/decontaminate.py`): planted
k-gram overlap detection, the (k-1)-token near-miss, short-doc and
empty-benchmark edges, gram-count math."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from orchid_fst_ray.pipelines.decontaminate import (
    benchmark_gram_hashes, scan_contamination)


def _ds(ids, texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))


BENCH_TEXT = ("the quick brown fox jumps over the lazy dog "
              "while seven wizards brew acid")


def test_planted_overlap_detected(ray_session):
    bench = _ds([0], [BENCH_TEXT])
    corpus = _ds(
        [1, 2, 3, 4],
        [
            # 8-token span lifted verbatim from the benchmark
            "prefix words " + "quick brown fox jumps over the lazy dog"
            + " and more filler tokens here",
            # only 7 consecutive shared tokens — below k, clean
            "quick brown fox jumps over the lazy cat stays different "
            "for the rest of this document",
            # no overlap at all
            "completely unrelated content about parquet shuffles and "
            "actor pools in a streaming executor",
            # too short for any 8-gram
            "tiny doc",
        ])
    grams = benchmark_gram_hashes(bench, k=8)
    out = scan_contamination(corpus, grams,
                             k=8).sort("doc_id").to_pandas()
    assert out["contaminated"].tolist() == [True, False, False, False]
    assert out.loc[out.doc_id == 1, "n_hits"].iloc[0] == 1
    assert out.loc[out.doc_id == 4, "n_grams"].iloc[0] == 0


def test_gram_counts(ray_session):
    # n tokens → n - k + 1 grams (k=8)
    txt = " ".join(f"t{i}" for i in range(30))
    out = scan_contamination(_ds([9], [txt]), np.zeros(0, np.uint64),
                             k=8).to_pandas()
    assert out["n_grams"].iloc[0] == 30 - 8 + 1
    assert not out["contaminated"].iloc[0]


def test_self_contamination_full(ray_session):
    bench = _ds([0], [BENCH_TEXT])
    grams = benchmark_gram_hashes(bench, k=8)
    out = scan_contamination(_ds([1], [BENCH_TEXT]), grams,
                             k=8).to_pandas()
    # an exact copy of a benchmark doc: every gram hits
    assert out["n_hits"].iloc[0] == out["n_grams"].iloc[0] > 0
