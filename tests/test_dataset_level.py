"""Dataset-level re-expressions of the reference's test suites
(SURVEY.md §5): the golden fuzzy searches run through the *distributed*
dictionary (ds.sort → per-partition FST build → automaton∩FST search),
and the external-sort goldens run through ``sort_by_trimmed``.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from orchid_fst_ray.stages.dictionary import (
    build_dictionary, dictionary_items, search_dictionary,
)
from orchid_fst_ray.stages.sorting import sort_by_trimmed

SORT_INPUT = ("/root/reference/src/main/fst/testdata/"
              "large_file_sort_test1_input.txt")
SORT_GOLD_KEEP = ("/root/reference/src/main/fst/testdata/"
                  "large_file_sort_test1_standard_contain_empty.txt")
SORT_GOLD_DROP = ("/root/reference/src/main/fst/testdata/"
                  "large_file_sort_test1_standard_ignore_empty.txt")


@pytest.fixture(scope="module")
def words_index(ray_session, ref_words):
    """The 82k-word dictionary as a distributed set-FST index."""
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "key": pa.array(sorted(set(ref_words)), pa.large_string())}))
    return build_dictionary(ds.repartition(8), key_col="key",
                            value_col=None).materialize()


def test_dataset_fuzzy_golden_lev(words_index, golden_lev):
    res = search_dictionary(words_index, "fuzzy", has_output=False,
                            query="hair", d=2, damerau=False)
    got = sorted(res.to_pandas()["key"].tolist())
    assert len(got) == 214
    assert got == sorted(golden_lev)


def test_dataset_fuzzy_golden_damerau(words_index, golden_dl):
    res = search_dictionary(words_index, "fuzzy", has_output=False,
                            query="hair", d=2, damerau=True)
    got = sorted(res.to_pandas()["key"].tolist())
    assert len(got) == 220
    assert got == sorted(golden_dl)


def test_dataset_dictionary_roundtrip(words_index, ref_words):
    """Every key is present; total item count matches the input set."""
    items = dictionary_items(words_index, has_output=False)
    assert items.count() == len(set(ref_words))
    res = search_dictionary(words_index, "match", has_output=False,
                            keys=["hair", "zebra", "nosuchword_xq"])
    got = sorted(res.to_pandas()["key"].tolist())
    expect = sorted(k for k in ["hair", "zebra"] if k in set(ref_words))
    assert got == expect


def test_dataset_prefix_and_range(words_index, ref_words):
    words = sorted(set(ref_words))
    pre = search_dictionary(words_index, "prefix", has_output=False,
                            prefix="hair")
    assert sorted(pre.to_pandas()["key"]) == [
        w for w in words if w.startswith("hair")]
    rng = search_dictionary(words_index, "range", has_output=False,
                            min_key="hair", max_key="hat",
                            min_inclusive=True, max_inclusive=False)
    assert sorted(rng.to_pandas()["key"]) == [
        w for w in words if "hair" <= w < "hat"]


# ---------------------------------------------------------------- lfsort

def _sort_fixture():
    lines = open(SORT_INPUT, encoding="utf-8").read().splitlines()
    return pa.table({
        "line": pa.array(lines, pa.large_string()),
        "lineno": pa.array(range(len(lines)), pa.int64()),
    })


def _golden(path):
    return open(path, encoding="utf-8").read().splitlines()


def test_sort_by_trimmed_keep_empty(ray_session):
    """large_file_sorter_unittest keep-empty golden, as ds.sort."""
    import ray.data as rd
    ds = rd.from_arrow(_sort_fixture()).repartition(4)
    got = sort_by_trimmed(ds, col="line", id_col="lineno")\
        .to_pandas()["line"].tolist()
    gold = _golden(SORT_GOLD_KEEP)
    assert got == gold


def test_sort_by_trimmed_drop_empty(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(_sort_fixture()).repartition(4)
    got = sort_by_trimmed(ds, col="line", id_col="lineno",
                          drop_empty=True).to_pandas()["line"].tolist()
    gold = _golden(SORT_GOLD_DROP)
    assert got == gold


def test_batched_fuzzy_matches_per_query(words_index, ref_words):
    """FstSearcherPool (actor-pool batched probe) == one-at-a-time
    search_dictionary for every query."""
    import pyarrow as pa
    import ray.data as rd
    from orchid_fst_ray.stages.dictionary import search_dictionary_many
    queries = ["hair", "chari", "zebra"]
    qds = rd.from_arrow(pa.table({
        "query": pa.array(queries, pa.large_string())}))
    batched = search_dictionary_many(
        words_index, qds, kind="fuzzy", has_output=False, d=2,
        concurrency=2).to_pandas()
    for q in queries:
        one = search_dictionary(words_index, "fuzzy", has_output=False,
                                query=q, d=2)
        expect = sorted(one.to_pandas()["key"])
        got = sorted(batched[batched["query"] == q]["key"])
        assert got == expect


def test_broadcast_pool_range_pruning(words_index, ref_words):
    """The broadcast FstSearcherPool prunes partitions by their
    [part_lo, part_hi] range per query (same predicate as the sharded
    path): exact-match probes against an 8-partition index touch ~1
    partition each, and the results are identical to unpruned search."""
    import ray
    from orchid_fst_ray.stages.dictionary import FstSearcherPool

    rows = words_index.select_columns(
        ["part_lo", "part_hi", "fst"]).take_all()
    assert len(rows) == 8
    ref = ray.put([(r["part_lo"], r["part_hi"], r["fst"]) for r in rows])
    pool = FstSearcherPool(ref, "match", {}, has_output=False)
    queries = ["hair", "zebra", "aardvark", "nosuchword_zz"]
    out = pool(pa.table({"query": pa.array(queries, pa.large_string())}))
    # every existing word found, missing word not
    got = set(out["key"].to_pylist())
    present = {q for q in queries if q in set(ref_words)}
    assert got == present
    # pruning engaged: each match query can land in at most one
    # range-disjoint partition, so probes <= n_queries and the other
    # (n_parts - 1) per query were pruned
    assert pool.probes <= len(queries)
    assert pool.pruned == len(queries) * len(rows) - pool.probes

    # prefix kind prunes too
    pool_p = FstSearcherPool(ref, "prefix", {}, has_output=False)
    out_p = pool_p(pa.table({"query": pa.array(
        ["hairb"], pa.large_string())}))
    assert set(out_p["key"].to_pylist()) == {
        w for w in ref_words if w.startswith("hairb")}
    assert pool_p.pruned > 0


def test_sharded_path_matches_broadcast(words_index, ref_words):
    """search_dictionary_many with broadcast_max_bytes=0 (the sharded
    queries × partition-ranges join — the big-index path) returns
    exactly the broadcast/actor-pool results for every query kind."""
    import pyarrow as pa
    import ray.data as rd
    from orchid_fst_ray.stages.dictionary import search_dictionary_many

    cases = [
        ("fuzzy", ["hair", "chari", "zebra"], {"d": 2}),
        ("fuzzy", ["hair"], {"d": 2, "damerau": True}),
        ("fuzzy", ["hairs"], {"d": 2, "same_prefix_len": 3}),
        ("match", ["hair", "nosuchword_zz"], {}),
        ("prefix", ["hairb", "zz_nohit"], {}),
    ]
    for kind, queries, params in cases:
        qds = rd.from_arrow(pa.table({
            "query": pa.array(queries, pa.large_string())}))
        broad = search_dictionary_many(
            words_index, qds, kind=kind, has_output=False,
            concurrency=2, **params).to_pandas()
        shard = search_dictionary_many(
            words_index, qds, kind=kind, has_output=False,
            broadcast_max_bytes=0, **params).to_pandas()
        key = lambda df: sorted(zip(df["query"], df["key"]))
        assert key(shard) == key(broad), (kind, params)


def test_index_parquet_roundtrip(ray_session, words_index, tmp_path,
                                 golden_lev):
    """The FST index dataset persists to partitioned Parquet and reads
    back fully queryable — the role of the reference's FST *file*
    (fst.h:208-217) with resumable, shardable storage."""
    import ray.data as rd
    path = str(tmp_path / "fst_index")
    words_index.write_parquet(path)
    reloaded = rd.read_parquet(path)
    res = search_dictionary(reloaded, "fuzzy", has_output=False,
                            query="hair", d=2, damerau=False)
    assert sorted(res.to_pandas()["key"]) == sorted(golden_lev)


def test_batched_pool_match_and_prefix_kinds(words_index, ref_words):
    import pyarrow as pa
    import ray.data as rd
    from orchid_fst_ray.stages.dictionary import search_dictionary_many
    words = set(ref_words)
    qds = rd.from_arrow(pa.table({
        "query": pa.array(["hair", "nosuchword_zz"], pa.large_string())}))
    got = search_dictionary_many(words_index, qds, kind="match",
                                 has_output=False,
                                 concurrency=2).to_pandas()
    assert sorted(got["key"]) == sorted(k for k in ["hair"] if k in words)
    qds2 = rd.from_arrow(pa.table({
        "query": pa.array(["hairb"], pa.large_string())}))
    got2 = search_dictionary_many(words_index, qds2, kind="prefix",
                                  has_output=False,
                                  concurrency=2).to_pandas()
    assert sorted(got2["key"]) == sorted(
        w for w in words if w.startswith("hairb"))


def test_compact_nonempty_caps_blocks(ray_session):
    """Block-count cap: compact coalesces past max_blocks (the guard
    against iterative union+sort block-count compounding)."""
    import pyarrow as pa
    import ray.data as rd
    from orchid_fst_ray.functions.blocks import compact_nonempty
    ds = rd.from_arrow(pa.table({"x": pa.array(range(1000))})).repartition(200)
    out = compact_nonempty(ds, max_blocks=8)
    assert out.count() == 1000
    mat = out.materialize()
    n_blocks = sum(len(b.blocks) for b in mat.iter_internal_ref_bundles())
    assert n_blocks <= 8
    # uncapped keeps the original granularity
    out2 = compact_nonempty(ds, max_blocks=None)
    assert out2.count() == 1000
