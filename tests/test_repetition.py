"""repetition_stats (pipelines/textstats.py) vs a brute-force Python
replay of the integer-ppm definitions."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa


def _brute(texts):
    M = 1_000_000
    out = []
    for i, s in enumerate(texts):
        toks = [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        n = len(toks)
        dup = ((n - len(set(toks))) * M) // n if n else 0
        total = sum(map(len, toks)) + max(n - 1, 0) if n else 1
        row = {"doc_id": i, "dup_token_ppm": dup}
        for g in (2, 3):
            if n < g:
                row[f"top{g}gram_ppm"] = 0
                continue
            grams = [" ".join(toks[j:j + g]) for j in range(n - g + 1)]
            cnt = Counter(grams)
            best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            row[f"top{g}gram_ppm"] = (best[1] * len(best[0]) * M) // total
        out.append(row)
    return out


def test_repetition_stats_brute_parity(ray_session):
    import ray.data as rd
    from orchid_fst_ray.pipelines.textstats import repetition_stats
    texts = [
        "spam spam spam spam eggs",          # dominant bigram
        "a b c a b c a b c",                 # dominant trigram
        "all distinct tokens here now",      # low repetition
        "",                                  # empty
        "solo",                              # 1 token: no grams
        "x y",                               # 2 tokens: bigram only
        "!!! ...",                           # zero tokens after split
        "Tie tie ONE one tie one",           # case-fold + gram ties
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    got = repetition_stats(
        rd.from_arrow(tbl).repartition(3)).to_pandas()
    want = _brute(texts)
    assert got.to_dict("records") == want


def test_repetition_stats_flags_boilerplate(ray_session):
    """A page whose text is one phrase repeated must score near 1e6 on
    the n-gram fractions — the filterable regime."""
    import ray.data as rd
    from orchid_fst_ray.pipelines.textstats import repetition_stats
    texts = ["click here to subscribe " * 50,
             " ".join(f"w{i}" for i in range(200))]
    tbl = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(texts, pa.string())})
    got = repetition_stats(rd.from_arrow(tbl)).to_pandas()
    assert int(got.top3gram_ppm[0]) > 500_000
    assert int(got.top3gram_ppm[1]) < 50_000
    assert int(got.dup_token_ppm[0]) > 900_000
