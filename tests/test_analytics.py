"""Analytics operators: HLL register sketch, exact grouped quantiles,
inverted index (pipelines/analytics.py)."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl: pa.Table, parts: int = 4):
    import ray.data as rd
    return rd.from_arrow(tbl).repartition(parts)


def test_bit_length_u64_matches_python():
    from orchid_fst_ray.pipelines.analytics import bit_length_u64
    edges = [0, 1, 2, 3, 4, 5, 255, 256, 2**31 - 1, 2**31, 2**32,
             2**53 - 1, 2**53, 2**53 + 1, 2**63 - 1, 2**63,
             2**64 - 1]
    rng = np.random.default_rng(7)
    vals = np.concatenate([np.array(edges, np.uint64),
                           rng.integers(0, 2**63, 500).astype(np.uint64)])
    got = bit_length_u64(vals)
    want = np.array([int(v).bit_length() for v in vals], np.int64)
    assert (got == want).all()


def _brute_registers(strings, p):
    from orchid_fst_ray.functions.hashing import hash64_pairs, poly_hash64
    ph = poly_hash64(np.unique(np.asarray(strings)))
    h = hash64_pairs(ph, ph)
    n_low = 64 - p
    regs = {}
    for v in h:
        r = int(v) >> n_low
        w = int(v) & ((1 << n_low) - 1)
        rank = (n_low + 1) if w == 0 else n_low - w.bit_length() + 1
        regs[r] = max(regs.get(r, 0), rank)
    return regs


def test_hll_token_registers_match_brute(ray_session):
    from orchid_fst_ray.pipelines.analytics import hll_token_registers
    texts = [f"alpha beta tok{i} tok{i * 7 % 50}" for i in range(200)]
    t = pa.table({"text": pa.array(texts, pa.string())})
    got = hll_token_registers(_ds(t), p=8).to_pandas()
    toks = sorted({w for s in texts for w in s.split()})
    want = _brute_registers(toks, 8)
    assert dict(zip(got.register, got.max_rank)) == want


def test_hll_estimate_accuracy(ray_session):
    """20k distinct tokens, p=10 → |est - true|/true within ~3 sigma
    (1.04/sqrt(1024) ≈ 3.3% per sigma)."""
    from orchid_fst_ray.pipelines.analytics import (hll_estimate,
                                                    hll_token_registers)
    n = 20000
    texts = [" ".join(f"w{j}" for j in range(i, min(i + 40, n)))
             for i in range(0, n, 40)]
    t = pa.table({"text": pa.array(texts, pa.string())})
    regs = hll_token_registers(_ds(t, 8), p=10).to_pandas()
    est = hll_estimate(regs.register.values, regs.max_rank.values, p=10)
    assert abs(est - n) / n < 0.10


def test_hll_shingle_registers_match_brute(ray_session):
    from orchid_fst_ray.functions.hashing import hash64_pairs
    from orchid_fst_ray.pipelines.analytics import hll_shingle_registers
    from orchid_fst_ray.pipelines.dedup import shingle_hashes_flat
    texts = [f"the quick brown fox {i} jumps over {i % 5}"
             for i in range(60)] + ["ab", ""]
    t = pa.table({"text": pa.array(texts, pa.string())})
    got = hll_shingle_registers(_ds(t), p=8, k=3).to_pandas()
    sh, _row, _n = shingle_hashes_flat(pa.chunked_array(
        [pa.array(texts, pa.string())]), k=3)
    n_low = 56
    regs = {}
    for v in hash64_pairs(np.unique(sh), np.unique(sh)):
        r, w = int(v) >> n_low, int(v) & ((1 << n_low) - 1)
        rank = (n_low + 1) if w == 0 else n_low - w.bit_length() + 1
        regs[r] = max(regs.get(r, 0), rank)
    assert dict(zip(got.register, got.max_rank)) == regs


def test_grouped_quantiles_nearest_rank(ray_session):
    from orchid_fst_ray.pipelines.analytics import grouped_quantiles
    rng = np.random.default_rng(3)
    ga = rng.integers(0, 500, 997)
    t = pa.table({
        "g": pa.array(["a"] * 997 + ["b"], pa.string()),
        "v": pa.array(np.concatenate([ga, [42]]), pa.int64()),
    })
    got = grouped_quantiles(_ds(t, 6), "g", "v").to_pandas()
    va = np.sort(ga)
    for (num, den), lab in [((1, 4), "p25"), ((1, 2), "p50"),
                            ((3, 4), "p75"), ((9, 10), "p90"),
                            ((99, 100), "p99")]:
        k = (num * 997 + den - 1) // den
        row = got[(got.g == "a") & (got.q == lab)]
        assert int(row.value.iloc[0]) == int(va[k - 1]), lab
        # the singleton group: every quantile is its one value
        rb = got[(got.g == "b") & (got.q == lab)]
        assert int(rb.value.iloc[0]) == 42


def test_grouped_quantiles_float_ceil_trap(ray_session):
    """n=10, p90: float ceil(0.9*10)=ceil(9.000000000000002)=10 picks
    the WRONG (10th) element; the rational rank picks the 9th."""
    from orchid_fst_ray.pipelines.analytics import grouped_quantiles
    t = pa.table({"g": pa.array(["x"] * 10, pa.string()),
                  "v": pa.array(range(1, 11), pa.int64())})
    got = grouped_quantiles(_ds(t, 2), "g", "v",
                            quantiles=((9, 10),)).to_pandas()
    assert int(got.value.iloc[0]) == 9


def test_inverted_index_matches_brute(ray_session):
    from orchid_fst_ray.pipelines.analytics import inverted_index
    texts = ["apple banana apple", "banana cherry", "apple date",
             "banana apple egg", "", "cherry cherry"]
    t = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = inverted_index(_ds(t, 3), min_df=2, max_postings=2).to_pandas()
    brute = {}
    for i, s in enumerate(texts):
        for w in set(s.split()):
            brute.setdefault(w, []).append(i)
    want = {w: (len(ids), ",".join(map(str, sorted(ids)[:2])))
            for w, ids in brute.items() if len(ids) >= 2}
    assert {r.term: (r.df, r.postings)
            for r in got.itertuples()} == want


def test_inverted_index_skewed_term_single_row(ray_session):
    """A term in EVERY doc (maximum sort skew) must still produce ONE
    complete row — the single-key sort invariant at work."""
    from orchid_fst_ray.pipelines.analytics import inverted_index
    n = 2000
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"common uniq{i}" for i in range(n)],
                         pa.string())})
    got = inverted_index(_ds(t, 8), min_df=2,
                         max_postings=10).to_pandas()
    assert list(got.term) == ["common"]
    assert int(got.df.iloc[0]) == n
    assert got.postings.iloc[0] == ",".join(map(str, range(10)))


def _hh_corpus() -> pa.Table:
    # skewed: 10 hot tokens (counts 105..150) over a long tail of 200
    # tokens with 2 occurrences each — the regime the truncated
    # combiner is FOR (per-block bound stays tail-sized, so the
    # exactness guarantee B < est_nth holds despite real truncation)
    toks = []
    for i in range(10):
        toks += [f"hot{i}"] * (150 - 5 * i)
    for i in range(200):
        toks += [f"x{i:03d}"] * 2
    rng = np.random.default_rng(7)
    rng.shuffle(toks)
    per_doc = 12
    rows = [" ".join(toks[d:d + per_doc])
            for d in range(0, len(toks), per_doc)]
    return pa.table({"text": pa.array(rows, pa.string())})


def _brute_top(tbl: pa.Table, n: int) -> list[tuple[str, int]]:
    from collections import Counter
    c = Counter()
    for s in tbl["text"].to_pylist():
        c.update(s.split())
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:n]


def test_heavy_hitters_exact_with_truncation(ray_session):
    from orchid_fst_ray.pipelines.analytics import heavy_hitters
    tbl = _hh_corpus()
    out, info = heavy_hitters(_ds(tbl, parts=6), top_n=10,
                              per_block=16, return_info=True)
    got = [(r["token"], r["n"]) for r in out.take_all()]
    assert info["bound"] > 0          # truncation really happened
    assert info["guaranteed"] is True
    assert got == _brute_top(tbl, 10)


def test_heavy_hitters_no_truncation_fast_path(ray_session):
    from orchid_fst_ray.pipelines.analytics import heavy_hitters
    tbl = _hh_corpus()
    out, info = heavy_hitters(_ds(tbl, parts=2), top_n=5,
                              per_block=10_000, return_info=True)
    got = [(r["token"], r["n"]) for r in out.take_all()]
    assert info == {"guaranteed": True, "bound": 0, "recounted": 0}
    assert got == _brute_top(tbl, 5)


def test_heavy_hitters_unguaranteed_when_capped(ray_session):
    from orchid_fst_ray.pipelines.analytics import heavy_hitters
    tbl = _hh_corpus()
    _out, info = heavy_hitters(_ds(tbl, parts=6), top_n=10,
                               per_block=2, max_recount=3,
                               return_info=True)
    assert info["guaranteed"] is False
