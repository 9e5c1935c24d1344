"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship entity-resolution pipeline on sf0.001.
``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md §2 + the training-data ops); ``oracle_sql()`` gives the
DuckDB-equivalent SQL where the operator is SQL-expressible (the
remainder get the driver's rows-only check and are gated by pytest
oracles instead — see tests/).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` anywhere in here or in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow as pa

SF_SMOKE = "/root/testdata/sf0.001"

# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------


def entry() -> Any:
    """Flagship ER pipeline over pages derived from sf0.001 documents:
    extract → block → FST fuzzy candidates → score → cluster."""
    from orchid_fst_ray.pipelines.er import run_er
    from orchid_fst_ray.sources.pages import pages_from_documents

    pages = pages_from_documents(SF_SMOKE, parallelism=8)
    res = run_er(pages, num_partitions=8, scorer_concurrency=(1, 4))
    return res["assignment"]


# --------------------------------------------------------------------------
# shared helpers
# --------------------------------------------------------------------------


def _docs(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


def _emb(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _part_kv(sf_dir: str):
    """part → distinct (key=p_name, value=max p_partkey) — the
    dictionary-build input (duplicate keys pre-aggregated so the result
    is partition-order independent)."""
    import ray.data as rd
    from ray.data.aggregate import Max
    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_name", "p_partkey"])
    agg = ds.groupby("p_name").aggregate(Max("p_partkey", alias_name="value"))
    return agg.map_batches(
        lambda t: pa.table({"key": t["p_name"].cast(pa.large_string()),
                            "value": t["value"].cast(pa.int64())}),
        batch_format="pyarrow")


def _part_index(sf_dir: str):
    from orchid_fst_ray.stages.dictionary import build_dictionary
    return build_dictionary(_part_kv(sf_dir), key_col="key",
                            value_col="value")


def _as_int64_value(ds):
    return ds.map_batches(
        lambda t: pa.table({"key": t["key"],
                            "value": t["value"].cast(pa.int64())}),
        batch_format="pyarrow")


_MATCH_KEYS = ["blue bolt", "red widget", "small ring", "zzz no such part"]
_FUZZY_QUERY = "red widgit"
_BATCH_QUERIES = ["red widget", "blue balt", "smal ring", "green gear"]


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def queries() -> dict[str, Callable[[str], Any]]:
    from orchid_fst_ray.pipelines import dedup, similarity, textstats
    from orchid_fst_ray.stages.dictionary import search_dictionary
    from orchid_fst_ray.stages.sorting import sort_by_trimmed

    def dict_items(sf_dir: str):
        from orchid_fst_ray.stages.dictionary import dictionary_items
        return _as_int64_value(
            dictionary_items(_part_index(sf_dir)).sort("key"))

    def dict_match(sf_dir: str):
        return _as_int64_value(
            search_dictionary(_part_index(sf_dir), "match",
                              keys=_MATCH_KEYS).sort("key"))

    def dict_prefix(sf_dir: str):
        return _as_int64_value(
            search_dictionary(_part_index(sf_dir), "prefix",
                              prefix="re").sort("key"))

    def dict_range(sf_dir: str):
        return _as_int64_value(
            search_dictionary(_part_index(sf_dir), "range",
                              min_key="b", max_key="m",
                              min_inclusive=True,
                              max_inclusive=False).sort("key"))

    def dict_fuzzy_lev(sf_dir: str):
        from orchid_fst_ray.stages.dictionary import build_dictionary
        keys = _part_kv(sf_dir).select_columns(["key"])
        idx = build_dictionary(keys, key_col="key", value_col=None)
        return search_dictionary(idx, "fuzzy", has_output=False,
                                 query=_FUZZY_QUERY, d=2,
                                 damerau=False).sort("key")

    def dict_fuzzy_prefixlen(sf_dir: str):
        """Fuzzy with required common prefix (the reference's
        samePrefixLen — Intersect(PrefixAutomaton, LevAutomaton),
        fst.cpp:530-553)."""
        from orchid_fst_ray.stages.dictionary import build_dictionary
        keys = _part_kv(sf_dir).select_columns(["key"])
        idx = build_dictionary(keys, key_col="key", value_col=None)
        return search_dictionary(idx, "fuzzy", has_output=False,
                                 query=_FUZZY_QUERY, d=2,
                                 same_prefix_len=4,
                                 damerau=False).sort("key")

    def dict_fuzzy_batch(sf_dir: str):
        """Batched fuzzy probe through the SHARDED (queries ×
        index-partition-ranges) path — broadcast_max_bytes=0 forces it
        so the oracle exercises the 100 TB-index code path; the
        broadcast/actor-pool path is parity-tested in pytest."""
        import ray.data as rd
        from orchid_fst_ray.stages.dictionary import (
            build_dictionary, search_dictionary_many)
        keys = _part_kv(sf_dir).select_columns(["key"])
        idx = build_dictionary(keys, key_col="key", value_col=None)
        queries_ds = rd.from_arrow(pa.table({
            "query": pa.array(_BATCH_QUERIES, pa.large_string())}))
        return search_dictionary_many(
            idx, queries_ds, kind="fuzzy", has_output=False, d=1,
            concurrency=(1, 4),
            broadcast_max_bytes=0).sort(["query", "key"])

    def dict_fuzzy_damerau(sf_dir: str):
        from orchid_fst_ray.stages.dictionary import build_dictionary
        keys = _part_kv(sf_dir).select_columns(["key"])
        idx = build_dictionary(keys, key_col="key", value_col=None)
        return search_dictionary(idx, "fuzzy", has_output=False,
                                 query=_FUZZY_QUERY, d=2,
                                 damerau=True).sort("key")

    def dict_fuzzy_selfjoin(sf_dir: str):
        """Edit-distance SELF-join of the dictionary keys: every key
        probes the distributed index (broadcast FstSearcherPool →
        level-synchronous batched prober, fst/batch_fuzzy.py); each
        unordered pair reported once via key > query. The blocking
        primitive of the ER candidates stage, behind an exact SQL
        oracle."""
        import pyarrow.compute as pc
        import ray.data as rd
        from orchid_fst_ray.stages.dictionary import (
            build_dictionary, search_dictionary_many)
        keys = _part_kv(sf_dir).select_columns(["key"])
        idx = build_dictionary(keys, key_col="key", value_col=None)
        hits = search_dictionary_many(
            idx, keys.map_batches(
                lambda t: pa.table(
                    {"query": t["key"].cast(pa.large_string())}),
                batch_format="pyarrow"),
            kind="fuzzy", has_output=False, d=1, damerau=False,
            concurrency=(1, 4))
        return hits.map_batches(
            lambda t: t.filter(pc.greater(t["key"], t["query"])),
            batch_format="pyarrow").sort(["query", "key"])

    def _setop_sides(sf_dir: str):
        import ray.data as rd
        from ray.data.aggregate import Max, Min
        part = rd.read_parquet(f"{sf_dir}/part.parquet",
                               columns=["p_name", "p_partkey"])
        left = (part.filter(expr="p_name < 'm'")
                .groupby("p_name")
                .aggregate(Max("p_partkey", alias_name="value"))
                .map_batches(lambda t: pa.table(
                    {"key": t["p_name"].cast(pa.large_string()),
                     "value": t["value"].cast(pa.int64())}),
                    batch_format="pyarrow"))
        right = (part.filter(expr="p_name >= 'f'")
                 .groupby("p_name")
                 .aggregate(Min("p_partkey", alias_name="value"))
                 .map_batches(lambda t: pa.table(
                     {"key": t["p_name"].cast(pa.large_string()),
                      "value": t["value"].cast(pa.int64())}),
                     batch_format="pyarrow"))
        return left, right

    def dict_union_q(sf_dir: str):
        from orchid_fst_ray.stages.setops import dict_union
        return dict_union(*_setop_sides(sf_dir)).sort("key")

    def dict_intersect_q(sf_dir: str):
        from orchid_fst_ray.stages.setops import dict_intersect
        return dict_intersect(*_setop_sides(sf_dir)).sort("key")

    def dict_difference_q(sf_dir: str):
        from orchid_fst_ray.stages.setops import dict_difference
        return dict_difference(*_setop_sides(sf_dir)).sort("key")

    def events_window(sf_dir: str):
        import ray.data as rd
        from orchid_fst_ray.pipelines.events import tumbling_window_stats
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["ts", "event_type", "value"])
        return tumbling_window_stats(ev).sort(["window_start",
                                               "event_type"])

    def events_asof(sf_dir: str):
        """AS-OF join: each purchase matched to the user's latest
        strictly-prior click."""
        import ray.data as rd
        from orchid_fst_ray.pipelines.events import asof_join_prior
        ev = rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"])
        return asof_join_prior(ev, "purchase", "click").sort("event_id")

    def events_range_join(sf_dir: str):
        """Range join: purchases paired with all same-user clicks in
        the prior 30 minutes."""
        import ray.data as rd
        from orchid_fst_ray.pipelines.events import range_join_window
        ev = rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"])
        return range_join_window(ev, "purchase", "click",
                                 window_minutes=30).sort(
            ["event_id", "match_id"])

    def events_sessions(sf_dir: str):
        import ray.data as rd
        from orchid_fst_ray.pipelines.events import sessionize
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts"])
        return sessionize(ev).sort(["user_id", "session_id"])

    def lineitem_summary(sf_dir: str):
        """TPC-H-q1-style grouped summary (count/min/max only — float
        Sum is summation-order-dependent and would break the value
        hash; Min/Max/Count are order-free exact)."""
        import ray.data as rd
        from ray.data.aggregate import Count, Max, Min
        li = rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice"])
        return (li.groupby(["l_returnflag", "l_linestatus"])
                .aggregate(Count(alias_name="n_rows"),
                           Min("l_quantity", alias_name="min_qty"),
                           Max("l_quantity", alias_name="max_qty"),
                           Min("l_extendedprice", alias_name="min_price"),
                           Max("l_extendedprice", alias_name="max_price"))
                .sort(["l_returnflag", "l_linestatus"]))

    def orders_per_priority(sf_dir: str):
        """Join breadth check: lineitems per order priority.
        Pre-aggregates lineitem counts per orderkey BEFORE the join
        (combiner-before-shuffle), then joins via ONE co-locating sort
        on the orderkey + an in-block Arrow hash join with per-block
        partial sums — Ray's actor-reducer hash join costs seconds of
        pool spin-up this avoids."""
        import pyarrow.compute as pc
        import ray.data as rd
        from ray.data.aggregate import Sum
        li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                             columns=["l_orderkey"])
        orders = rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderpriority"])

        def tag_l(t: pa.Table) -> pa.Table:
            # PARTIAL counts per block (Arrow hash agg, no shuffle);
            # duplicate keys across blocks are fine — the in-block join
            # matches each partial to its priority and the final Sum
            # adds them up. Saves a whole all-to-all aggregate.
            agg = pa.TableGroupBy(
                t.select(["l_orderkey"]),
                "l_orderkey").aggregate([("l_orderkey", "count")])
            return pa.table({
                "key": agg["l_orderkey"].combine_chunks().cast(
                    pa.int64()),
                "n": agg["l_orderkey_count"].combine_chunks().cast(
                    pa.int64()),
                "prio": pa.nulls(agg.num_rows, pa.string())})

        def tag_r(t: pa.Table) -> pa.Table:
            return pa.table({
                "key": t["o_orderkey"].cast(pa.int64()),
                "n": pa.nulls(t.num_rows, pa.int64()),
                "prio": t["o_orderpriority"].cast(pa.string())})

        def merge(t: pa.Table) -> pa.Table:
            left = t.filter(pc.is_valid(t["n"])).select(["key", "n"])
            right = t.filter(pc.is_valid(t["prio"])).select(
                ["key", "prio"])
            if left.num_rows == 0 or right.num_rows == 0:
                return pa.table({
                    "o_orderpriority": pa.array([], pa.string()),
                    "n_lineitems": pa.array([], pa.int64())})
            joined = left.join(right, keys="key", join_type="inner")
            agg = pa.TableGroupBy(joined.select(["prio", "n"]),
                                  "prio").aggregate([("n", "sum")])
            return pa.table({
                "o_orderpriority": agg["prio"].combine_chunks().cast(
                    pa.string()),
                "n_lineitems": agg["n_sum"].combine_chunks().cast(
                    pa.int64())})

        partials = (li.map_batches(tag_l, batch_format="pyarrow")
                    .union(orders.map_batches(tag_r,
                                              batch_format="pyarrow"))
                    .sort("key")
                    .map_batches(merge, batch_size=None,
                                 batch_format="pyarrow"))
        return (partials.groupby("o_orderpriority")
                .aggregate(Sum("n_lineitems", alias_name="n_lineitems"))
                .map_batches(lambda t: pa.table({
                    "o_orderpriority": t["o_orderpriority"].cast(
                        pa.string()),
                    "n_lineitems": t["n_lineitems"].cast(pa.int64()),
                }), batch_format="pyarrow")
                .sort("o_orderpriority"))

    def sort_lines(sf_dir: str):
        return sort_by_trimmed(_docs(sf_dir), col="text", id_col="doc_id")

    def dedup_exact(sf_dir: str):
        return dedup.exact_dedup(_docs(sf_dir))

    def dedup_ngram_jaccard(sf_dir: str):
        pairs = dedup.ngram_jaccard_pairs(_docs(sf_dir), threshold=0.5,
                                          max_posting=1_000_000)
        return pairs.select_columns(["id_a", "id_b"]).sort(["id_a", "id_b"])

    def dedup_minhash(sf_dir: str):
        pairs = dedup.minhash_dup_pairs(_docs(sf_dir), threshold=0.5,
                                        n_perm=128, bands=32)
        return pairs.select_columns(["id_a", "id_b"]).sort(["id_a", "id_b"])

    def dedup_simhash(sf_dir: str):
        return dedup.simhash_dup_pairs(_docs(sf_dir), max_hamming=3)

    def dedup_embedding(sf_dir: str):
        pairs = dedup.embedding_dup_pairs(_emb(sf_dir), threshold=0.4)
        return pairs.select_columns(["id_a", "id_b"]).sort(["id_a", "id_b"])

    def dedup_embedding_lsh(sf_dir: str):
        pairs = dedup.embedding_dup_pairs_lsh(_emb(sf_dir), threshold=0.4,
                                              bits=4, multiprobe=2)
        return pairs.select_columns(["id_a", "id_b"]).sort(["id_a", "id_b"])

    def ann_topk(sf_dir: str):
        res = similarity.ann_topk(_emb(sf_dir), [0, 7, 42], k=10)
        return res.select_columns(["query_id", "vec_id", "rank"]).sort(
            ["query_id", "rank"])

    def ann_lsh(sf_dir: str):
        res = similarity.lsh_ann_topk(_emb(sf_dir), [0, 7, 42], k=10,
                                      bits=8, multiprobe=4)
        return res.select_columns(["query_id", "vec_id", "rank"])

    def ann_ivf(sf_dir: str):
        res = similarity.ivf_ann_topk(_emb(sf_dir), [0, 7, 42], k=10)
        return res.select_columns(["query_id", "vec_id", "rank"])

    def dedup_embedding_lsh_exhaustive(sf_dir: str):
        """Embedding-LSH in its exhaustive configuration: with bits=1
        every vector probes both buckets, so every pair is a candidate
        and canonical-bucket emission must reproduce the brute-force
        near-dup set EXACTLY — pins the banding + canonical-dedup
        machinery with the same DuckDB oracle as ``dedup_embedding``."""
        pairs = dedup.embedding_dup_pairs_lsh(_emb(sf_dir), threshold=0.4,
                                              bits=1, multiprobe=1)
        return pairs.select_columns(["id_a", "id_b"]).sort(["id_a", "id_b"])

    def ann_lsh_exhaustive(sf_dir: str):
        """LSH ANN in its exhaustive-probe configuration: multiprobe ==
        bits means every vector is within Hamming range of every query,
        so the bucketing machinery runs end-to-end but must reproduce
        the brute-force top-k EXACTLY — pins the signature/candidate
        plumbing with the same DuckDB oracle as ``ann_topk``."""
        res = similarity.lsh_ann_topk(_emb(sf_dir), [0, 7, 42], k=10,
                                      bits=8, multiprobe=8)
        return res.select_columns(["query_id", "vec_id", "rank"]).sort(
            ["query_id", "rank"])

    def ann_ivf_exhaustive(sf_dir: str):
        """IVF ANN with a single cell: every vector lands in the one
        centroid's list and every query probes it, so the cell
        assignment/probe machinery must reproduce brute-force top-k
        exactly (same oracle as ``ann_topk``)."""
        res = similarity.ivf_ann_topk(_emb(sf_dir), [0, 7, 42], k=10,
                                      n_cells=1, n_probe=1)
        return res.select_columns(["query_id", "vec_id", "rank"]).sort(
            ["query_id", "rank"])

    def token_stats(sf_dir: str):
        return textstats.token_stats(_docs(sf_dir)).sort("doc_id")

    def quality_stats(sf_dir: str):
        return textstats.quality_stats(_docs(sf_dir)).sort("doc_id")

    def lang_id(sf_dir: str):
        return textstats.lang_id(_docs(sf_dir)).sort("doc_id")

    def doc_fingerprints(sf_dir: str):
        return textstats.doc_fingerprints(_docs(sf_dir)).sort("doc_id")

    def pii_scan(sf_dir: str):
        """Contamination / PII pre-filter counts (RE2 on both sides)."""
        return textstats.pii_scan(_docs(sf_dir)).sort("doc_id")

    def _docs_meta(sf_dir: str):
        import ray.data as rd
        return rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "n_chars"])

    def pack_sequences(sf_dir: str):
        """GPT-style sequence packing (concat-and-chunk): map every
        document into the global fixed-length training-sequence grid.
        Runs as a two-pass distributed prefix scan — per-block token
        sums (one tiny row per block) → driver cumsum over O(blocks)
        → broadcast offsets → per-block vectorized assignment
        (pipelines/chunking.py)."""
        from orchid_fst_ray.pipelines.chunking import (
            pack_sequences as ps)
        return ps(_docs(sf_dir), seq_tokens=256).sort("doc_id")

    def sample_hash(sf_dir: str):
        """Deterministic 10 % corpus sample: stateless per-batch
        filter on ``poly_hash64(str(doc_id)) % 10000 < 1000`` — no
        shuffle, no RNG, reproducible and nested across rates
        (pipelines/sampling.py). The oracle replays the hash in
        HUGEINT."""
        from orchid_fst_ray.pipelines import sampling
        return sampling.hash_sample(_docs_meta(sf_dir),
                                    0.10).sort("doc_id")

    def salient_terms(sf_dir: str):
        """Top-5 characteristic terms per document, ranked by the
        fully-integer ordering (tf DESC, df ASC, term ASC) — the
        lexicographic cousin of tf-idf, kept integer so the oracle
        hash is exact. Document frequencies come from the combiner
        pattern; the vocabulary-sized (term, df) table is broadcast
        once via ray.put (pipelines/textstats.py)."""
        return textstats.salient_terms(_docs(sf_dir)).sort(
            ["doc_id", "rank"])

    def decontaminate(sf_dir: str):
        """Benchmark decontamination: docs with ``doc_id % 10 = 7``
        play the eval/benchmark set; their distinct 8-token-gram
        hashes are collected once (8 B/gram) and broadcast via
        ``ray.put``; the corpus side streams through a stateless
        membership scan — no shuffle, no join, corpus bytes cross the
        wire once (pipelines/decontaminate.py)."""
        import pyarrow as _pa
        from orchid_fst_ray.pipelines import decontaminate as dc

        def side(keep_bench: bool):
            def fn(t: _pa.Table) -> _pa.Table:
                import numpy as _np
                ids = t["doc_id"].combine_chunks().to_numpy(
                    zero_copy_only=False)
                is_bench = (ids % 10) == 7
                return t.filter(_pa.array(
                    is_bench if keep_bench else ~is_bench))
            return fn

        bench = _docs(sf_dir).map_batches(side(True),
                                          batch_format="pyarrow")
        corpus = _docs(sf_dir).map_batches(side(False),
                                           batch_format="pyarrow")
        grams = dc.benchmark_gram_hashes(bench, k=8)
        return dc.scan_contamination(corpus, grams, k=8).sort("doc_id")

    def doc_chunks(sf_dir: str):
        """Context-window chunking: 64-token windows advancing by 48
        (16-token overlap) over every document's ``[a-z0-9]+`` token
        stream — the RAG/embedding preprocessing pass. Fully
        vectorized (one gather-index build + one Arrow binary_join
        per batch, pipelines/chunking.py); stateless, shuffle-free."""
        from orchid_fst_ray.pipelines.chunking import doc_chunks as dc
        return dc(_docs(sf_dir)).sort(["doc_id", "chunk_idx"])

    def sample_stratified(sf_dir: str):
        """Per-language rebalance: downsample the head language (en →
        5 %), keep half of every tail language — the classic corpus
        rebalancing pass, still a pure key-hash filter per row."""
        from orchid_fst_ray.pipelines import sampling
        return sampling.stratified_sample(
            _docs_meta(sf_dir), {"en": 0.05}, default_rate=0.5
        ).sort("doc_id")

    def sample_weighted(sf_dir: str):
        """Length-weighted Bernoulli sampling: keep probability
        min(n_chars/1000, 1) — the char-budget importance-sampling
        curation pass, still a pure key-hash filter per row
        (sampling.weighted_sample)."""
        from orchid_fst_ray.pipelines import sampling
        return sampling.weighted_sample(
            _docs_meta(sf_dir), weight_col="n_chars",
            full_weight=1000).sort("doc_id")

    def heavy_hitters(sf_dir: str):
        """Exact top-20 tokens via the truncated-combiner + bounded
        recount path (SpaceSaving shape): per-block top-64 survivors +
        undercount bound B, then an exact broadcast recount of every
        candidate that could still reach the top. per_block=64 forces
        real truncation (B > 0) so the recount machinery is what the
        oracle pins."""
        from orchid_fst_ray.pipelines.analytics import heavy_hitters
        return heavy_hitters(_docs(sf_dir), top_n=20, per_block=64)

    def term_frequencies(sf_dir: str):
        """Corpus-wide top-50 token frequencies via per-block partial
        counts (the combiner pattern) + one small global aggregate."""
        return textstats.term_frequencies(_docs(sf_dir), top_n=50)

    def approx_distinct_tokens(sf_dir: str):
        """HyperLogLog distinct-token sketch — exposed as its REGISTER
        TABLE so the oracle replays it exactly (poly_hash64 →
        hash64_pairs avalanche → register/rank → distributed max)."""
        from orchid_fst_ray.pipelines.analytics import (
            hll_token_registers)
        return hll_token_registers(_docs(sf_dir), p=10)

    def approx_distinct_shingles(sf_dir: str):
        """HLL sketch of distinct 3-token shingles — sizes the minhash
        dedup's bucket tables; shares that pipeline's exact shingle
        hash space (shingle_hashes_flat), register-table contract."""
        from orchid_fst_ray.pipelines.analytics import (
            hll_shingle_registers)
        return hll_shingle_registers(_docs(sf_dir), p=10, k=3)

    def doc_length_quantiles(sf_dir: str):
        """EXACT per-language nearest-rank quantiles of n_chars via
        the value-count combiner (rational ranks — no float ceil)."""
        import ray.data as rd
        from orchid_fst_ray.pipelines.analytics import grouped_quantiles
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])
        return grouped_quantiles(docs, "lang", "n_chars")

    def inverted_index(sf_dir: str):
        """Posting-list build: (term, df, first-64 doc ids) for every
        term with df ≥ 2 — per-block distinct pairs, one single-key
        sort, block-local fold under the pinned sort invariant."""
        from orchid_fst_ray.pipelines import analytics
        return analytics.inverted_index(_docs(sf_dir), min_df=2,
                                        max_postings=64)

    def bloom_semijoin_urgent(sf_dir: str):
        """Exact semi-join via broadcast BLOOM prefilter + survivor
        merge-join verify: lineitem ⋉ urgent orders → per-returnflag
        rollup (integer quantity units)."""
        import ray.data as rd
        from ray.data.aggregate import Count, Sum
        from orchid_fst_ray.pipelines.relational import bloom_semijoin

        li = rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag", "l_quantity"])

        def prep(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({
                "l_orderkey": t["l_orderkey"].cast(pa.int64()),
                "l_returnflag": t["l_returnflag"].cast(pa.string()),
                "qty_units": pc.cast(pc.floor(pc.cast(
                    t["l_quantity"], pa.float64())), pa.int64()),
            })

        orders = rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderpriority"])

        def urgent(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            keep = pc.equal(t["o_orderpriority"], "1-URGENT")
            return pa.table({"l_orderkey":
                             t.filter(keep)["o_orderkey"].cast(
                                 pa.int64())})

        out = bloom_semijoin(
            li.map_batches(prep, batch_format="pyarrow"),
            orders.map_batches(urgent, batch_format="pyarrow"),
            key="l_orderkey", n_bits=1 << 16)
        agg = (out.groupby("l_returnflag")
               .aggregate(Count(alias_name="n_items"),
                          Sum("qty_units",
                              alias_name="sum_qty_units")))
        return agg.map_batches(lambda t: pa.table({
            "l_returnflag": t["l_returnflag"].cast(pa.string()),
            "n_items": t["n_items"].cast(pa.int64()),
            "sum_qty_units": t["sum_qty_units"].cast(pa.int64()),
        }), batch_format="pyarrow").sort("l_returnflag")

    def bloom_antijoin_nonurgent(sf_dir: str):
        """Exact ANTI-join via the same broadcast Bloom: lineitem rows
        whose order is NOT urgent — misses stream through shuffle-free,
        only Bloom hits take the left-anti merge-join verify. Same
        rollup shape as the semi-join so the two results partition
        lineitem."""
        import ray.data as rd
        from ray.data.aggregate import Count, Sum
        from orchid_fst_ray.pipelines.relational import bloom_antijoin

        li = rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag", "l_quantity"])

        def prep(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({
                "l_orderkey": t["l_orderkey"].cast(pa.int64()),
                "l_returnflag": t["l_returnflag"].cast(pa.string()),
                "qty_units": pc.cast(pc.floor(pc.cast(
                    t["l_quantity"], pa.float64())), pa.int64()),
            })

        orders = rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderpriority"])

        def urgent(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            keep = pc.equal(t["o_orderpriority"], "1-URGENT")
            return pa.table({"l_orderkey":
                             t.filter(keep)["o_orderkey"].cast(
                                 pa.int64())})

        out = bloom_antijoin(
            li.map_batches(prep, batch_format="pyarrow"),
            orders.map_batches(urgent, batch_format="pyarrow"),
            key="l_orderkey", n_bits=1 << 16)
        agg = (out.groupby("l_returnflag")
               .aggregate(Count(alias_name="n_items"),
                          Sum("qty_units",
                              alias_name="sum_qty_units")))
        return agg.map_batches(lambda t: pa.table({
            "l_returnflag": t["l_returnflag"].cast(pa.string()),
            "n_items": t["n_items"].cast(pa.int64()),
            "sum_qty_units": t["sum_qty_units"].cast(pa.int64()),
        }), batch_format="pyarrow").sort("l_returnflag")

    def kmeans_embeddings(sf_dir: str):
        """Fixed-point Lloyd's k-means (k=8, 2 rounds) over the
        embeddings table — integer quantization + integer centroid
        updates make the distributed result bit-identical to the
        unrolled SQL replay (pipelines/ml.py)."""
        import ray.data as rd
        from orchid_fst_ray.pipelines.ml import kmeans_fixedpoint
        emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        return kmeans_fixedpoint(emb, k=8, iters=2)

    def lineitem_rollup(sf_dir: str):
        """GROUPING-SETS rollup (returnflag, linestatus) → (returnflag)
        → grand total in one data-sized pass; coarser levels derive
        from the finest aggregate (relational.rollup_aggregate)."""
        import ray.data as rd
        from orchid_fst_ray.pipelines.relational import rollup_aggregate

        li = rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity"])

        def prep(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({
                "l_returnflag": t["l_returnflag"].cast(pa.string()),
                "l_linestatus": t["l_linestatus"].cast(pa.string()),
                "qty_units": pc.cast(pc.floor(pc.cast(
                    t["l_quantity"], pa.float64())), pa.int64())})

        return rollup_aggregate(
            li.map_batches(prep, batch_format="pyarrow"),
            keys=["l_returnflag", "l_linestatus"],
            units_col="qty_units")

    def events_running(sf_dir: str):
        """Per-user running count + running integer value sum — the
        distributed per-group prefix scan (events.running_totals)."""
        import ray.data as rd
        from orchid_fst_ray.pipelines.events import running_totals
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "user_id", "ts",
                                      "value"])
        return running_totals(ev)

    def repetition_stats(sf_dir: str):
        """Gopher-style per-doc repetition signals (duplicate-token and
        dominant-n-gram character fractions, integer ppm) — the classic
        boilerplate filters, shuffle-free (textstats.repetition_stats)."""
        return textstats.repetition_stats(_docs(sf_dir))

    def partitioned_write(sf_dir: str):
        """Resumable key-partitioned Parquet sink: documents written
        as one atomically-committed directory per lang under a fresh
        temp root; returns the (part_key, n_rows, skipped) manifest —
        rows exactly a GROUP BY lang, skipped always 0 on a fresh
        root (sources/sinks.py)."""
        import tempfile
        import ray.data as rd
        from orchid_fst_ray.sources.sinks import write_partitioned
        root = tempfile.mkdtemp(prefix="ofst_partwrite_")
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])
        return write_partitioned(docs, root, by_col="lang")

    def events_lag_lead(sf_dir: str):
        """LAG/LEAD/ROW_NUMBER window pack per user ordered by
        (ts, event_id): exact µs gaps to the previous/next event, -1
        sentinel at partition bounds (events.lag_lead_gaps)."""
        import ray.data as rd
        from orchid_fst_ray.pipelines.events import lag_lead_gaps
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "user_id", "ts"])
        return lag_lead_gaps(ev)

    def events_funnel(sf_dir: str):
        """Ordered min-timestamp funnel view→click→purchase: users
        reaching each step with strictly-increasing timestamps; blocks
        emit constant-size partial counts (events.funnel_depths)."""
        import ray.data as rd
        from orchid_fst_ray.pipelines.events import funnel_depths
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts", "event_type"])
        return funnel_depths(ev)

    def lineitem_cube(sf_dir: str):
        """GROUP BY CUBE (returnflag, linestatus): all 4 grouping sets
        in one data-sized pass — the 3 coarser sets derive from the
        finest aggregate (relational.cube_aggregate)."""
        import ray.data as rd
        from orchid_fst_ray.pipelines.relational import cube_aggregate

        li = rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity"])

        def prep(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({
                "l_returnflag": t["l_returnflag"].cast(pa.string()),
                "l_linestatus": t["l_linestatus"].cast(pa.string()),
                "qty_units": pc.cast(pc.floor(pc.cast(
                    t["l_quantity"], pa.float64())), pa.int64())})

        return cube_aggregate(
            li.map_batches(prep, batch_format="pyarrow"),
            keys=["l_returnflag", "l_linestatus"],
            units_col="qty_units")

    def doc_length_extremes(sf_dir: str):
        """Per-lang length-tail outliers (strictly below p10 / above
        p90, exact nearest-rank quantiles): the first quality gate on
        a web corpus — group-cardinality bounds broadcast, one
        streaming filter pass (analytics.length_extremes)."""
        from orchid_fst_ray.pipelines.analytics import length_extremes
        return length_extremes(_docs_meta(sf_dir))

    def tfidf_pairs_q(sf_dir: str):
        """Sparse similarity join: top-50 doc pairs by integer TF-IDF
        dot product over the shared-token inverted index, df-capped
        fan-out (similarity.tfidf_pairs)."""
        import ray.data as rd
        from orchid_fst_ray.pipelines.similarity import tfidf_pairs
        docs = _docs(sf_dir)
        n_docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"]).count()
        return tfidf_pairs(docs, n_docs)

    def dup_gram_stats_q(sf_dir: str):
        """ExactSubstr-lite: per-doc count of 5-token windows whose
        gram occurs in ≥1 other document — the within-corpus
        duplicated-span signal (textstats.dup_gram_stats)."""
        return textstats.dup_gram_stats(_docs(sf_dir), k=5)

    def blocked_jw_scores(sf_dir: str):
        """Standalone blocking + Jaro-Winkler pair scoring over
        documents: (lang, n_chars//64) blocking key, vectorized
        triangular pair expansion with a max-block cap, DuckDB-kernel
        jw in an actor pool — the ER scorer surfaced as a first-class
        query (er.blocked_pair_scores)."""
        import ray.data as rd
        from orchid_fst_ray.pipelines.er import blocked_pair_scores
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang",
                                        "n_chars"])
        return blocked_pair_scores(docs)

    def top_orders_q3(sf_dir: str):
        """TPC-H-Q3-style 3-table join: segment customers broadcast
        (no orders shuffle), lineitem date-pruned + pre-aggregated per
        order, ONE merge_join, integer revenue units
        (relational.q3_top_orders)."""
        from orchid_fst_ray.pipelines.relational import q3_top_orders
        return q3_top_orders(sf_dir)

    def local_supplier_revenue(sf_dir: str):
        """TPC-H-Q5-style 5-table chain: two merge_joins over the
        data-sized tables, supplier→nation + nation-name maps
        broadcast, nation-equality as a vectorized filter
        (relational.local_supplier_revenue)."""
        from orchid_fst_ray.pipelines.relational import (
            local_supplier_revenue as q5)
        return q5(sf_dir)

    def events_ntile(sf_dir: str):
        """NTILE(4) value quartiles per event type — SQL-standard
        uneven split, closed-form bucket assignment after one
        group-key sort (events.value_ntile)."""
        import ray.data as rd
        from orchid_fst_ray.pipelines.events import value_ntile
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "event_type",
                                      "value"])
        return value_ntile(ev)

    def events_retention(sf_dir: str):
        """Weekly cohort retention triangle: first-event cohort week ×
        active-week offset × distinct users; blocks ship only distinct
        triples (events.retention_cohorts)."""
        import ray.data as rd
        from orchid_fst_ray.pipelines.events import retention_cohorts
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts"])
        return retention_cohorts(ev)

    def knn_triangles(sf_dir: str):
        """k-NN graph (k=3 cosine neighbors per embedding) → distributed
        degree-ordered triangle count: one row of exact integer graph
        stats (pipelines/graphs.triangle_count)."""
        import ray.data as rd
        from orchid_fst_ray.pipelines.graphs import triangle_count
        from orchid_fst_ray.pipelines.similarity import knn_edges
        emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        return triangle_count(knn_edges(emb, k=3))

    def graph_pagerank(sf_dir: str):
        """Fixed-point INTEGER PageRank (3 damped rounds) over the
        symmetrized user↔event-type bipartite graph from events —
        integer sums make the distributed result bit-identical to the
        unrolled SQL replay regardless of partial-sum order."""
        import pyarrow.compute as pc
        import ray.data as rd
        from ray.data.aggregate import Count
        from orchid_fst_ray.pipelines.graphs import pagerank_int

        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "event_type"])

        def to_edges(t: pa.Table) -> pa.Table:
            import numpy as np
            n = t.num_rows
            u = pc.binary_join_element_wise(
                pa.array(np.full(n, "u")),
                pc.cast(t["user_id"].combine_chunks(), pa.string()),
                "")
            v = pc.binary_join_element_wise(
                pa.array(np.full(n, "t")),
                pc.cast(t["event_type"].combine_chunks(), pa.string()),
                "")
            return pa.table({"src": pa.concat_arrays([u, v]),
                             "dst": pa.concat_arrays([v, u])})

        edges = (ev.map_batches(to_edges, batch_format="pyarrow")
                 .groupby(["src", "dst"])
                 .aggregate(Count(alias_name="__n"))
                 .drop_columns(["__n"]))
        return pagerank_int(edges, iters=3)

    def customers_per_region(sf_dir: str):
        """Fact ⋈ dim ⋈ dim rollup with BROADCAST joins (no shuffle of
        the big side) — customer x nation x region."""
        from orchid_fst_ray.pipelines.relational import (
            customers_per_region as cpr)
        return cpr(sf_dir)

    def events_topk(sf_dir: str):
        """Groupwise top-k: each user's top-3 events by value."""
        import ray.data as rd
        from orchid_fst_ray.pipelines.events import top_k_per_user
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "event_id", "value"])
        return top_k_per_user(ev, k=3).sort(["user_id", "rank"])

    def curated_docs(sf_dir: str):
        """Composite training-corpus curation: quality gate → exact
        dedup → MinHash near-dedup; returns surviving doc ids."""
        from orchid_fst_ray.pipelines.curation import curate_corpus
        res = curate_corpus(_docs(sf_dir), near_dup_threshold=0.6)
        return (res["docs"].select_columns(["doc_id"]).sort("doc_id"))

    def curated_docs_ngram(sf_dir: str):
        """Same composite with the exact n-gram-Jaccard near-dup
        backend — every stage (quality gate, exact dedup, jaccard
        pairs, connected components) is DuckDB-expressible, so this
        query carries a FULL end-to-end SQL oracle."""
        from orchid_fst_ray.pipelines.curation import curate_corpus
        res = curate_corpus(_docs(sf_dir), near_dup_threshold=0.5,
                            near_dup_backend="ngram",
                            ngram_max_posting=1_000_000)
        return (res["docs"].select_columns(["doc_id"]).sort("doc_id"))

    def er_core_clusters(sf_dir: str):
        """The ER core (blocking → fuzzy candidate self-join → hybrid
        scoring → connected components) over the raw documents table,
        restricted to ASCII-only docs so every step is exactly
        DuckDB-expressible (DuckDB's edit distances count BYTES; the
        engine counts characters — identical on ASCII, pinned by
        test_scoring). Blocking key = lang, doc_key = first-8-token
        key, d=2 Damerau candidates, score = 0.5·jw + 0.5·edit_sim
        gated at 0.82 with the char_dist ≤ 1 bypass, cluster_id =
        numeric min doc id of the component."""
        import pyarrow.compute as pc

        import ray.data as rd
        from orchid_fst_ray.functions.text import doc_keys_from_text
        from orchid_fst_ray.stages.candidates import (dedupe_pairs,
                                                      generate_candidates)
        from orchid_fst_ray.stages.clustering import connected_components
        from orchid_fst_ray.stages.scoring import score_pairs

        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])

        def prep(t: pa.Table) -> pa.Table:
            text = pc.fill_null(pc.cast(t["text"], pa.large_string()), "")
            ok = pc.match_substring_regex(text, r"^[\x00-\x7F]*$")
            out = pa.table({
                # zero-padded ids: lexicographic min == numeric min
                "id": pc.utf8_lpad(pc.cast(t["doc_id"], pa.string()),
                                   20, "0"),
                "lang": pc.cast(t["lang"], pa.string()),
                "doc_key": doc_keys_from_text(text, 8),
            })
            return out.filter(ok)

        ds = docs.map_batches(prep, batch_format="pyarrow")
        cand = dedupe_pairs(generate_candidates(
            ds, d=2, damerau=True, key_col="doc_key", id_col="id",
            block_col="lang", max_pairs_per_key=10 ** 9,
            hot_block_rows=None), num_partitions=8)
        scored = score_pairs(cand, threshold=0.82, max_char_dist=1,
                             concurrency=(1, 4))
        clusters = connected_components(
            scored, nodes_ds=ds.select_columns(["id"]), node_col="id",
            num_partitions=8)
        return clusters.map_batches(lambda t: pa.table({
            "doc_id": pc.cast(t["url"], pa.int64()),
            "cluster_id": pc.cast(t["cluster_id"], pa.int64()),
        }), batch_format="pyarrow").sort("doc_id")

    def er_clusters(sf_dir: str):
        from orchid_fst_ray.pipelines.er import run_er
        from orchid_fst_ray.sources.pages import pages_from_documents
        pages = pages_from_documents(sf_dir, parallelism=8)
        res = run_er(pages, num_partitions=8, scorer_concurrency=(1, 4))
        return res["assignment"].sort("url")

    def priority_flag_summary(sf_dir: str):
        """Large×large equi-join through the general
        ``relational.merge_join`` operator (tag → null-pad → union →
        ONE co-locating sort → in-block Arrow hash joins), then an
        order-free grouped summary (Count/Min/Max only — float Sum
        would break the value hash)."""
        import ray.data as rd
        from ray.data.aggregate import Count, Max, Min
        from orchid_fst_ray.pipelines.relational import merge_join
        orders = rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderpriority"])
        li = rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag", "l_quantity"]
        ).rename_columns({"l_orderkey": "o_orderkey"})
        joined = merge_join(orders, li, on="o_orderkey")
        return (joined.groupby(["o_orderpriority", "l_returnflag"])
                .aggregate(Count(alias_name="n_items"),
                           Min("l_quantity", alias_name="min_qty"),
                           Max("l_quantity", alias_name="max_qty"))
                .sort(["o_orderpriority", "l_returnflag"]))

    def multimodal_image_features(sf_dir: str):
        from orchid_fst_ray.stages.multimodal import (
            image_feature_pipeline, synth_image_table)
        return image_feature_pipeline(synth_image_table(sf_dir))

    def multimodal_image_codecs(sf_dir: str):
        """Same feature pipeline over a MIXED-container corpus: the
        image column cycles ppm / PNG / baseline-JPEG / BMP / GIF by
        row, and the decode stage dispatches per row on magic bytes —
        all five decoded for real in-container (pure numpy + stdlib,
        `stages/imagecodecs.py`). PNG/BMP rows produce features
        identical to their ppm twins (lossless); JPEG/GIF rows are
        within codec tolerance (pinned by pytest)."""
        from orchid_fst_ray.stages.multimodal import (
            image_feature_pipeline, synth_image_table)
        return image_feature_pipeline(
            synth_image_table(sf_dir, fmt="mixed"))

    def multimodal_audio_frames(sf_dir: str):
        from orchid_fst_ray.stages.multimodal import (
            audio_frame_pipeline, synth_audio_table)
        return audio_frame_pipeline(synth_audio_table(sf_dir))

    def multimodal_audio_codecs(sf_dir: str):
        """Frame-RMS pipeline over a MIXED-encoding WAV corpus: the
        audio column cycles PCM16 / IEEE-float32 / A-law / µ-law /
        PCM8 by row (`stages/avcodecs.py` — all five decoded for real,
        G.711 expansion is a 256-entry LUT gather). MP3 stays a loud
        stub. Fidelity vs the PCM16 twin is pinned by pytest."""
        from orchid_fst_ray.stages.multimodal import (
            audio_frame_pipeline, synth_audio_table)
        return audio_frame_pipeline(
            synth_audio_table(sf_dir, fmt="mixed"))

    def multimodal_video_frames(sf_dir: str):
        """Frame-sample + featurize over an opaque video binary column
        (RAWV container decoded for real; MP4 stubbed)."""
        from orchid_fst_ray.stages.multimodal import (
            synth_video_table, video_frame_pipeline)
        return video_frame_pipeline(synth_video_table(sf_dir))

    def multimodal_video_codecs(sf_dir: str):
        """Same frame pipeline over a MIXED-container corpus cycling
        RAWV / MJPEG-in-AVI / animated GIF by row — the AVI demux +
        per-frame baseline-JPEG decode and the GIF LZW frames are real
        in-container (`stages/avcodecs.py`, `stages/imagecodecs.py`);
        MP4/MKV stay loud stubs. RAWV rows match the lossless twin
        exactly; AVI/GIF rows within codec tolerance (pytest)."""
        from orchid_fst_ray.stages.multimodal import (
            synth_video_table, video_frame_pipeline)
        return video_frame_pipeline(synth_video_table(sf_dir,
                                                      fmt="mixed"))

    # Ordered for the driver's CORRECTNESS window (first ~50 rows):
    # flagship composites and the newest operators first, then the
    # remaining oracled queries, then oracled-but-redundant dictionary
    # variants, and finally the approximate-by-design / multimodal
    # queries that have no SQL oracle (their machinery is pinned by
    # the *_exhaustive twins and pytest golden gates above).
    # tools/check_oracles.py --json covers ALL rows regardless of
    # window position (committed as CORRECTNESS_LOCAL_r05.json).
    return {
        # --- flagship composites + round-4/5 operators ---
        "er_core_clusters": er_core_clusters,
        "curated_docs": curated_docs,
        "curated_docs_ngram": curated_docs_ngram,
        "kmeans_embeddings": kmeans_embeddings,
        "graph_pagerank": graph_pagerank,
        "knn_triangles": knn_triangles,
        "lineitem_rollup": lineitem_rollup,
        "events_running": events_running,
        "repetition_stats": repetition_stats,
        "partitioned_write": partitioned_write,
        # round-5 additions (keep inside the driver's 50-row window)
        "events_lag_lead": events_lag_lead,
        "events_funnel": events_funnel,
        "lineitem_cube": lineitem_cube,
        "doc_length_extremes": doc_length_extremes,
        "tfidf_pairs": tfidf_pairs_q,
        "dup_gram_stats": dup_gram_stats_q,
        "blocked_jw_scores": blocked_jw_scores,
        "top_orders_q3": top_orders_q3,
        "local_supplier_revenue": local_supplier_revenue,
        "events_ntile": events_ntile,
        "events_retention": events_retention,
        # reference-core surface kept in-window (one row per family;
        # the full registry is covered by ORACLES_r05.json)
        "dict_items": dict_items,
        "dict_fuzzy_lev": dict_fuzzy_lev,
        "dict_union": dict_union_q,
        "sort_lines": sort_lines,
        # --- analytics / sketches / joins ---
        "heavy_hitters": heavy_hitters,
        "approx_distinct_tokens": approx_distinct_tokens,
        "doc_length_quantiles": doc_length_quantiles,
        "inverted_index": inverted_index,
        "bloom_semijoin_urgent": bloom_semijoin_urgent,
        "bloom_antijoin_nonurgent": bloom_antijoin_nonurgent,
        # --- dedup family ---
        "dedup_exact": dedup_exact,
        "dedup_minhash": dedup_minhash,
        "dedup_simhash": dedup_simhash,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_embedding": dedup_embedding,
        "dedup_embedding_lsh_exhaustive": dedup_embedding_lsh_exhaustive,
        # --- similarity search ---
        "ann_topk": ann_topk,
        "ann_lsh_exhaustive": ann_lsh_exhaustive,
        "ann_ivf_exhaustive": ann_ivf_exhaustive,
        # --- text analysis / curation primitives ---
        "token_stats": token_stats,
        "quality_stats": quality_stats,
        "lang_id": lang_id,
        "doc_fingerprints": doc_fingerprints,
        "pii_scan": pii_scan,
        "salient_terms": salient_terms,
        "decontaminate": decontaminate,
        "doc_chunks": doc_chunks,
        "pack_sequences": pack_sequences,
        "sample_stratified": sample_stratified,
        # --- events / relational ---
        "events_window": events_window,
        "events_sessions": events_sessions,
        "lineitem_summary": lineitem_summary,
        "orders_per_priority": orders_per_priority,
        "sample_hash": sample_hash,
        "sample_weighted": sample_weighted,
        "events_asof": events_asof,
        "events_range_join": events_range_join,
        "events_topk": events_topk,
        "customers_per_region": customers_per_region,
        "priority_flag_summary": priority_flag_summary,
        # --- dictionary core (representatives in-window) ---
        "dict_match": dict_match,
        "dict_fuzzy_selfjoin": dict_fuzzy_selfjoin,
        # --- window boundary (~50) ---
        "dict_prefix": dict_prefix,
        "dict_range": dict_range,
        "dict_fuzzy_prefixlen": dict_fuzzy_prefixlen,
        "dict_fuzzy_batch": dict_fuzzy_batch,
        "dict_fuzzy_damerau": dict_fuzzy_damerau,
        "dict_intersect": dict_intersect_q,
        "dict_difference": dict_difference_q,
        "term_frequencies": term_frequencies,
        "approx_distinct_shingles": approx_distinct_shingles,
        # --- approximate-by-design / multimodal (no SQL oracle) ---
        "dedup_embedding_lsh": dedup_embedding_lsh,
        "ann_lsh": ann_lsh,
        "ann_ivf": ann_ivf,
        "er_clusters": er_clusters,
        "multimodal_image_features": multimodal_image_features,
        "multimodal_image_codecs": multimodal_image_codecs,
        "multimodal_audio_frames": multimodal_audio_frames,
        "multimodal_audio_codecs": multimodal_audio_codecs,
        "multimodal_video_frames": multimodal_video_frames,
        "multimodal_video_codecs": multimodal_video_codecs,
    }


# --------------------------------------------------------------------------
# oracles (ANSI SQL for DuckDB over the pre-registered table views)
# --------------------------------------------------------------------------

_PART_KV = ("SELECT p_name AS key, max(p_partkey) AS value "
            "FROM part GROUP BY p_name")

_SHINGLES = """
tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
        FROM documents),
sh AS (SELECT doc_id,
         CASE WHEN len(ts) >= 3 THEN list_distinct(list_transform(
                   generate_series(1, len(ts) - 2),
                   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
              WHEN len(ts) > 0 THEN [array_to_string(ts, ' ')]
              ELSE [] END AS sets
       FROM tok)
"""

_STOPS_SQL = ("['the','a','an','and','or','of','to','in','is','it',"
              "'that','for','on','with','as','at','by']")
_STOPS_DE_SQL = ("['der','die','das','und','ist','ein','eine','nicht',"
                 "'mit','von','zu','den','dem','sich']")


# ---- shared SQL arithmetic builders (mod-2**64 in DuckDB HUGEINT) --
_SQL_M = "18446744073709551616::HUGEINT"            # 2**64


def _sql_mulmod(x: str, k: int) -> str:
    """(x * k) % 2**64 with the near-2**64 constant split into 32-bit
    halves so no product exceeds INT128."""
    m = _SQL_M
    hi, lo = k >> 32, k & 0xFFFFFFFF
    return (f"((({x}) * {lo}::HUGEINT) % {m} + "
            f"(((({x}) * {hi}::HUGEINT) % {m}) * 4294967296::HUGEINT)"
            f" % {m}) % {m}")


def _sql_mix(va: str, vb: str) -> str:
    """hash64_pairs (functions/hashing.py) on two HUGEINT expressions:
    h = a*K1; h ^= rotl17(b); h *= K2; h ^= h >> 29 — all mod 2**64."""
    m = _SQL_M
    rot = (f"((({vb}) * 131072::HUGEINT) % {m} "
           f"+ ({vb}) // 140737488355328::HUGEINT)")
    x = (f"xor(({_sql_mulmod(va, 0x9E3779B97F4A7C15)})::UBIGINT, "
         f"({rot})::UBIGINT)::HUGEINT")
    q = _sql_mulmod(x, 0xC2B2AE3D27D4EB4F)
    return (f"xor(({q})::UBIGINT, "
            f"(({q}) // 536870912::HUGEINT)::UBIGINT)::HUGEINT")


def _sql_poly_token(var: str = "t") -> str:
    """poly_hash64 (functions/hashing.py) of one VARCHAR expression:
    fold(h * FNV_PRIME + codepoint) from the FNV offset, mod 2**64."""
    from orchid_fst_ray.functions.text import _FNV_OFFSET, _FNV_PRIME
    m = _SQL_M
    b = f"{int(_FNV_PRIME)}::HUGEINT"          # < 2**41: h*b fits INT128
    off = f"{int(_FNV_OFFSET)}::HUGEINT"
    return (f"list_reduce(list_prepend({off}, "
            f"list_transform(generate_series(1, length({var})), "
            f"i -> ascii({var}[i])::HUGEINT)), "
            f"(h, c) -> (h * {b} + c) % {m})")


def _hll_registers_sql(p: int = 10) -> str:
    """Exact SQL replica of ``hll_token_registers``
    (pipelines/analytics.py): distinct tokens → poly_hash64 →
    hash64_pairs self-mix (the avalanche finalizer) → top-``p``-bit
    register / leftmost-1-bit rank over the low ``64-p`` bits →
    per-register MAX. ``length(bin(w))`` is the integer bit length —
    no float log2."""
    n_low = 64 - p
    mix = _sql_mix("th", "th")
    return f"""
            WITH tok AS (
              SELECT DISTINCT unnest(regexp_extract_all(lower(text),
                  '[a-z0-9]+')) AS t
              FROM documents),
            h AS (SELECT {_sql_poly_token("t")} AS th FROM tok),
            hm AS (SELECT {mix} AS hv FROM h),
            rw AS (SELECT hv // {1 << n_low}::HUGEINT AS register,
                          hv % {1 << n_low}::HUGEINT AS w FROM hm),
            rk AS (SELECT register,
                          CASE WHEN w = 0 THEN {n_low + 1}
                               ELSE {n_low} - length(bin(w::UBIGINT)) + 1
                          END AS rank
                   FROM rw)
            SELECT register::BIGINT AS register,
                   MAX(rank)::BIGINT AS max_rank
            FROM rk GROUP BY register ORDER BY register"""


def _hll_shingles_sql(p: int = 10, k: int = 3) -> str:
    """Exact SQL replica of ``hll_shingle_registers``
    (pipelines/analytics.py): the minhash shingler's hash chain
    (WORD_RE tokens → poly_hash64 → hash64_pairs window folds,
    short-doc whole-text rule) → self-mix avalanche → register/rank →
    per-register MAX. The tok/shingle CTEs mirror _minhash_pair_ctes
    so both oracles pin the SAME shingle hash space."""
    from orchid_fst_ray.pipelines.dedup import _WS_RE2
    n_low = 64 - p
    pat = rf"[a-z0-9]+|[^{_WS_RE2}a-z0-9]"
    mix = _sql_mix("a", "b")
    self_mix = _sql_mix("s", "s")
    return f"""
            WITH tok AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '{pat}') AS ts
              FROM documents),
            tokr AS (
              SELECT doc_id, unnest(ts) AS t,
                     generate_subscripts(ts, 1) AS pos
              FROM tok),
            dhash AS (
              SELECT t, {_sql_poly_token("t")} AS th
              FROM (SELECT DISTINCT t FROM tokr)),
            tokh AS (
              SELECT r.doc_id, list(d.th ORDER BY r.pos) AS hs
              FROM tokr r JOIN dhash d USING (t)
              GROUP BY r.doc_id),
            shl AS (
              SELECT doc_id, CASE
                WHEN len(hs) = 0 THEN []::HUGEINT[]
                WHEN len(hs) < {k} THEN
                  [list_reduce(hs, (a, b) -> {mix})]
                ELSE list_transform(generate_series(1, len(hs) - {k - 1}),
                  i -> list_reduce(hs[i : i + {k - 1}], (a, b) -> {mix}))
              END AS sh FROM tokh),
            shd AS (SELECT DISTINCT unnest(sh) AS s FROM shl),
            hm AS (SELECT {self_mix} AS hv FROM shd),
            rw AS (SELECT hv // {1 << n_low}::HUGEINT AS register,
                          hv % {1 << n_low}::HUGEINT AS w FROM hm),
            rk AS (SELECT register,
                          CASE WHEN w = 0 THEN {n_low + 1}
                               ELSE {n_low} - length(bin(w::UBIGINT)) + 1
                          END AS rank
                   FROM rw)
            SELECT register::BIGINT AS register,
                   MAX(rank)::BIGINT AS max_rank
            FROM rk GROUP BY register ORDER BY register"""


def _kmeans_sql(k: int = 8, iters: int = 2,
                scale: int = 1_000_000) -> str:
    """Exact SQL replica of ``kmeans_embeddings`` (pipelines/ml.py):
    Lloyd rounds UNROLLED as CTE triples (distance/assign/update), all
    fixed-point integer. Floor division is spelled with the exact
    integer identity ``(s - ((s %% n) + n) %% n) // n`` because
    DuckDB's ``//`` truncates toward zero while the engine floors."""
    ctes = [f"""q AS (
              SELECT vec_id::BIGINT AS vec_id,
                     generate_subscripts(embedding, 1) AS d,
                     CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                * {scale}) AS BIGINT) AS qx
              FROM embeddings),
            init AS (
              SELECT vec_id::BIGINT AS vec_id,
                     row_number() OVER (ORDER BY vec_id) - 1 AS cid
              FROM embeddings ORDER BY vec_id LIMIT {k}),
            c0 AS (SELECT i.cid, q.d, q.qx AS cx
                   FROM init i JOIN q USING (vec_id))"""]
    last = "c0"
    for i in range(1, iters + 1):
        ctes.append(f"""dst{i} AS (
              SELECT q.vec_id, c.cid,
                     sum((q.qx - c.cx) * (q.qx - c.cx))::HUGEINT AS dist
              FROM q JOIN {last} c USING (d)
              GROUP BY q.vec_id, c.cid),
            a{i} AS (
              SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cid) AS rn
                FROM dst{i}) WHERE rn = 1),
            s{i} AS (
              SELECT a.cid, q.d, sum(q.qx)::HUGEINT AS s,
                     count(*)::HUGEINT AS n
              FROM a{i} a JOIN q USING (vec_id)
              GROUP BY a.cid, q.d),
            c{i} AS (
              SELECT p.cid, p.d,
                     CAST(coalesce(
                       (s.s - (((s.s % s.n) + s.n) % s.n)) // s.n,
                       p.cx) AS BIGINT) AS cx
              FROM {last} p LEFT JOIN s{i} s
                ON p.cid = s.cid AND p.d = s.d)""")
        last = f"c{i}"
    ctes.append(f"""dfin AS (
              SELECT q.vec_id, c.cid,
                     sum((q.qx - c.cx) * (q.qx - c.cx))::HUGEINT AS dist
              FROM q JOIN {last} c USING (d)
              GROUP BY q.vec_id, c.cid)""")
    return (f"WITH {', '.join(ctes)}\n"
            "            SELECT vec_id, cid::BIGINT AS cluster FROM (\n"
            "              SELECT vec_id, cid,\n"
            "                     row_number() OVER (PARTITION BY vec_id\n"
            "                                        ORDER BY dist, cid) AS rn\n"
            "              FROM dfin) WHERE rn = 1 ORDER BY vec_id")


def _pagerank_sql(iters: int = 3, scale: int = 1_000_000,
                  damping_pct: int = 85) -> str:
    """Exact SQL replica of ``graph_pagerank`` (pipelines/graphs.py
    over the symmetrized user↔event-type graph): damped power
    iteration UNROLLED as one CTE pair per round, all fixed-point
    integer (``//`` floor division) so the replay is bit-identical to
    the distributed integer sums."""
    base = (100 - damping_pct) * scale // 100
    ctes = [f"""e0 AS (
              SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS src,
                              't' || event_type AS dst
              FROM events),
            edges AS (
              SELECT src, dst FROM e0
              UNION
              SELECT dst AS src, src AS dst FROM e0),
            nodes AS (SELECT DISTINCT src AS node FROM edges),
            odeg AS (SELECT src, count(*)::BIGINT AS odeg
                     FROM edges GROUP BY src),
            r0 AS (SELECT node, {scale}::BIGINT AS rank FROM nodes)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""c{i} AS (
              SELECT e.dst AS node,
                     sum((r.rank * {damping_pct})
                         // (100 * o.odeg))::BIGINT AS s
              FROM edges e
              JOIN r{i - 1} r ON e.src = r.node
              JOIN odeg o ON e.src = o.src
              GROUP BY e.dst),
            r{i} AS (
              SELECT n.node,
                     ({base} + coalesce(c.s, 0))::BIGINT AS rank
              FROM nodes n LEFT JOIN c{i} c USING (node))""")
    return (f"WITH {', '.join(ctes)}\n"
            f"            SELECT node, rank FROM r{iters} "
            f"ORDER BY node")


def _fingerprint_sql() -> str:
    """Exact SQL replica of ``stable_fingerprint`` (functions/text.py):
    winnowing over Karp-Rabin polynomial k-gram hashes mod 2**64, all
    arithmetic in HUGEINT with explicit ``% 2**64``. The constants are
    imported from the engine so the two sides share one spec."""
    from orchid_fst_ray.functions.text import _FNV_PRIME

    m = _SQL_M
    b = f"{int(_FNV_PRIME)}::HUGEINT"
    mix = _sql_mix("a", "b")

    return f"""
            WITH tok AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
              FROM documents),
            th AS (
              SELECT doc_id,
                     list_transform(ts, t -> {_sql_poly_token("t")}) AS hs
              FROM tok),
            gh AS (
              SELECT doc_id,
                CASE WHEN len(hs) = 0 THEN []::HUGEINT[]
                     WHEN len(hs) < 3 THEN
                       [list_reduce(list_prepend(0::HUGEINT, hs),
                                    (g, h) -> (g * {b} + h) % {m})]
                     ELSE list_transform(generate_series(1, len(hs) - 2),
                       i -> (((hs[i] * {b} + hs[i+1]) % {m}) * {b}
                             + hs[i+2]) % {m})
                END AS gs
              FROM th),
            mins AS (
              SELECT doc_id,
                CASE WHEN len(gs) = 0 THEN []::HUGEINT[]
                     WHEN len(gs) <= 8 THEN [list_min(gs)]
                     ELSE list_transform(generate_series(1, len(gs) - 7),
                                         j -> list_min(gs[j:j+7]))
                END AS ms
              FROM gh)
            SELECT doc_id,
              CASE WHEN len(ms) = 0 THEN 0::UBIGINT
                   ELSE list_reduce(
                          list_prepend(0::HUGEINT,
                                       list_sort(list_distinct(ms))),
                          (a, b) -> {mix})::UBIGINT
              END AS fingerprint
            FROM mins ORDER BY doc_id"""


def _decontam_sql(k: int = 8) -> str:
    """Exact SQL replica of ``scan_contamination``
    (pipelines/decontaminate.py): poly token hashes → k-gram
    polynomial folds (init 0) → benchmark split (doc_id % 10 = 7) →
    LEFT-JOIN membership counts per corpus document."""
    from orchid_fst_ray.functions.text import _FNV_PRIME

    m = _SQL_M
    b = f"{int(_FNV_PRIME)}::HUGEINT"
    return f"""
            WITH tok AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
              FROM documents),
            th AS (
              SELECT doc_id,
                     list_transform(ts, t -> {_sql_poly_token("t")}) AS hs
              FROM tok),
            g AS (
              SELECT doc_id, unnest(list_transform(
                       generate_series(1, len(hs) - {k - 1}),
                       i -> list_reduce(
                              list_prepend(0::HUGEINT,
                                           hs[i:i+{k - 1}]),
                              (g, h) -> (g * {b} + h) % {m}))) AS gh
              FROM th WHERE len(hs) >= {k}),
            bench AS (SELECT DISTINCT gh FROM g WHERE doc_id % 10 = 7),
            agg AS (
              SELECT c.doc_id, count(*)::BIGINT AS n_grams,
                     count(b.gh)::BIGINT AS n_hits
              FROM g c LEFT JOIN bench b USING (gh)
              WHERE c.doc_id % 10 <> 7
              GROUP BY c.doc_id)
            SELECT d.doc_id,
                   coalesce(a.n_grams, 0)::BIGINT AS n_grams,
                   coalesce(a.n_hits, 0)::BIGINT AS n_hits,
                   coalesce(a.n_hits, 0) > 0 AS contaminated
            FROM (SELECT doc_id FROM documents
                  WHERE doc_id % 10 <> 7) d
            LEFT JOIN agg a USING (doc_id)
            ORDER BY d.doc_id"""


def _minhash_sql(n_perm: int = 128, bands: int = 32, k: int = 3,
                 threshold: float = 0.5, max_bucket: int = 200) -> str:
    """Exact SQL replica of ``minhash_dup_pairs`` (pipelines/dedup.py):
    WORD_RE tokens → polynomial token hashes → hash64_pairs-chained
    k-token shingles (deduped per doc) → universal-hash minhash lanes
    (the seeded (a,b) coefficients come from the SAME
    ``minhash_coeffs`` generator the engine uses, embedded as a VALUES
    table) → per-band bucket folds → bucket-grouped candidate pairs
    (cap = the ``max_bucket`` smallest ids) → signature-agreement
    estimate ≥ threshold. Empty-token documents carry the engine's
    all-0xFF signature via the scaffold LEFT JOIN."""
    return f"""
            WITH {_minhash_pair_ctes("documents", n_perm=n_perm,
                                     bands=bands, k=k,
                                     threshold=threshold,
                                     max_bucket=max_bucket)}
            SELECT id_a, id_b FROM mh_pairs
            ORDER BY id_a, id_b"""


def _minhash_pair_ctes(source: str, n_perm: int = 128, bands: int = 32,
                       k: int = 3, threshold: float = 0.5,
                       max_bucket: int = 200,
                       materialize: bool = False) -> str:
    """The ``minhash_dup_pairs`` replica as a reusable CTE chain
    (names prefixed ``mh_``, final CTE ``mh_pairs(id_a, id_b)``) over
    any ``source`` relation with (doc_id, text) — used standalone by
    ``_minhash_sql`` and composed after the quality-gate + exact-dedup
    CTEs by the ``curated_docs`` oracle.

    ``materialize=True`` marks the multiply-referenced heavy CTEs
    (mh_shd, mh_hmin) MATERIALIZED: when ``source`` is itself a CTE
    chain, DuckDB's default CTE inlining re-runs that whole chain per
    reference (37 s -> 14 s at sf0.01 for the curated composite); for
    a base-table source the inlined plan is faster, so it stays off."""
    import math

    from orchid_fst_ray.functions.hashing import minhash_coeffs
    from orchid_fst_ray.pipelines.dedup import _WS_RE2

    m = _SQL_M
    r = n_perm // bands
    a_c, b_c = minhash_coeffs(n_perm)
    perm_rows = ",\n                ".join(
        f"({p}, {int(a_c[p])}::HUGEINT, {int(b_c[p])}::HUGEINT)"
        for p in range(n_perm))
    # eq-count threshold: mean(eq) >= t  <=>  count >= ceil(t*n_perm)
    min_eq = math.ceil(threshold * n_perm - 1e-9)
    pat = rf"[a-z0-9]+|[^{_WS_RE2}a-z0-9]"      # WORD_RE, RE2 spelling
    mix = _sql_mix("a", "b")
    # one minhash lane: xorshift33((s*a + b) mod 2**64); a < 2**61 so
    # the product stays inside INT128 without splitting
    lane = f"((sd.s * perm.pa + perm.pb) % {m})"
    lane_h = (f"xor(({lane})::UBIGINT, "
              f"(({lane}) // 8589934592::HUGEINT)::UBIGINT)::HUGEINT")
    mat = "MATERIALIZED " if materialize else ""

    return f"""mh_tok AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '{pat}') AS ts
              FROM {source}),
            mh_tokr AS (
              SELECT doc_id, unnest(ts) AS t,
                     generate_subscripts(ts, 1) AS pos
              FROM mh_tok),
            mh_dhash AS (
              SELECT t, {_sql_poly_token("t")} AS th
              FROM (SELECT DISTINCT t FROM mh_tokr)),
            mh_tokh AS (
              SELECT r.doc_id, list(d.th ORDER BY r.pos) AS hs
              FROM mh_tokr r JOIN mh_dhash d USING (t)
              GROUP BY r.doc_id),
            mh_shl AS (
              SELECT doc_id, CASE
                WHEN len(hs) = 0 THEN []::HUGEINT[]
                WHEN len(hs) < {k} THEN
                  [list_reduce(hs, (a, b) -> {mix})]
                ELSE list_transform(generate_series(1, len(hs) - {k - 1}),
                  i -> list_reduce(hs[i : i + {k - 1}], (a, b) -> {mix}))
              END AS sh FROM mh_tokh),
            mh_shd AS {mat}(
              SELECT DISTINCT doc_id, unnest(sh) AS s FROM mh_shl),
            mh_perm(p, pa, pb) AS (VALUES
                {perm_rows}),
            -- lanes once per DISTINCT shingle value (shingles repeat
            -- across near-dup docs); the big (doc, shingle, perm)
            -- min-aggregate then runs on plain UBIGINT
            mh_dlane AS (
              SELECT sd.s, perm.p, ({lane_h})::UBIGINT AS lh
              FROM (SELECT DISTINCT s FROM mh_shd) sd
              CROSS JOIN mh_perm perm),
            mh_hmin AS {mat}(
              SELECT doc.doc_id, perm.p,
                     coalesce(min(dl.lh),
                              18446744073709551615::UBIGINT)::HUGEINT AS h
              FROM {source} doc
              CROSS JOIN mh_perm perm
              LEFT JOIN mh_shd sd ON sd.doc_id = doc.doc_id
              LEFT JOIN mh_dlane dl ON dl.s = sd.s AND dl.p = perm.p
              GROUP BY doc.doc_id, perm.p),
            mh_sigs AS (
              SELECT doc_id, list(h ORDER BY p) AS sg
              FROM mh_hmin GROUP BY doc_id),
            mh_buckets AS (
              SELECT doc_id,
                     list_reduce(
                       list_prepend((bb.b + 1)::HUGEINT,
                                    sg[{r} * bb.b + 1 : {r} * bb.b + {r}]),
                       (a, b) -> {mix}) AS bucket
              FROM mh_sigs
              CROSS JOIN (SELECT unnest(generate_series(0, {bands - 1}))
                          AS b) bb),
            mh_members AS (SELECT DISTINCT bucket, doc_id
                           FROM mh_buckets),
            mh_capped AS (
              SELECT bucket, doc_id FROM (
                SELECT bucket, doc_id,
                       row_number() OVER (PARTITION BY bucket
                                          ORDER BY doc_id) AS rn
                FROM mh_members) WHERE rn <= {max_bucket}),
            mh_cand AS (
              SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
              FROM mh_capped x JOIN mh_capped y
                ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
            mh_est AS (
              SELECT c.id_a, c.id_b,
                     sum(CASE WHEN hx.h = hy.h THEN 1 ELSE 0 END) AS neq
              FROM mh_cand c
              JOIN mh_hmin hx ON hx.doc_id = c.id_a
              JOIN mh_hmin hy ON hy.doc_id = c.id_b AND hy.p = hx.p
              GROUP BY c.id_a, c.id_b),
            mh_pairs AS (
              SELECT id_a, id_b FROM mh_est WHERE neq >= {min_eq})"""


def _curated_minhash_sql(threshold: float = 0.6) -> str:
    """Exact SQL replica of the DEFAULT ``curated_docs`` composite
    (``curate_corpus`` with the minhash backend): quality gate → exact
    dedup (min doc_id per text) → MinHash+LSH near-dup pairs at the
    query's threshold (the full ``_minhash_pair_ctes`` replica over
    the deduped survivors) → connected components → min-id survivors.
    Composes the same gate CTEs as the ``curated_docs_ngram`` oracle
    with the minhash chain that the ``dedup_minhash`` oracle proves."""
    return f"""
            WITH RECURSIVE base AS (
              SELECT doc_id, text, length(text)::BIGINT AS n_chars,
                     list_filter(regexp_split_to_array(lower(text),
                         '[^a-z0-9]+'), x -> x <> '') AS tk
              FROM documents),
            stats AS (
              SELECT doc_id, text, n_chars, len(tk)::BIGINT AS n_tokens,
                     tk
              FROM base),
            ex AS (SELECT doc_id, unnest(tk) AS tok,
                          generate_subscripts(tk, 1) AS pos FROM stats),
            grp AS (SELECT doc_id, tok,
                           pos - row_number() OVER (
                               PARTITION BY doc_id, tok ORDER BY pos) AS g
                    FROM ex),
            rl AS (SELECT doc_id, count(*) AS run FROM grp
                   GROUP BY doc_id, tok, g),
            mr AS (SELECT doc_id, max(run)::BIGINT AS max_run FROM rl
                   GROUP BY doc_id),
            gated AS (
              SELECT s.doc_id, s.text
              FROM stats s LEFT JOIN mr ON s.doc_id = mr.doc_id
              WHERE s.n_tokens >= 10 AND s.n_tokens <= 100000
                AND s.n_chars <= 12 * s.n_tokens
                AND s.n_tokens <= s.n_chars
                AND coalesce(mr.max_run, 0) < 8),
            -- MATERIALIZED: dd feeds the minhash chain in three
            -- places; DuckDB otherwise inlines (re-runs) the whole
            -- gate chain per reference (42 s -> ~8 s at sf0.01)
            dd AS MATERIALIZED (
                   SELECT min(doc_id) AS doc_id, text FROM gated
                   GROUP BY text),
            {_minhash_pair_ctes("dd", threshold=threshold,
                                materialize=True)},
            edges AS (SELECT id_a AS u, id_b AS v FROM mh_pairs
                      UNION SELECT id_b, id_a FROM mh_pairs),
            reach(a, b) AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u),
            labels AS (SELECT a AS node, min(b) AS mn FROM reach
                       GROUP BY a)
            SELECT doc_id FROM dd
            WHERE doc_id NOT IN (SELECT node FROM labels
                                 WHERE mn < node)
            ORDER BY doc_id"""


def _simhash_sql(max_hamming: int = 3, max_bucket: int = 500) -> str:
    """Exact SQL replica of ``simhash_dup_pairs`` (pipelines/dedup.py):
    WORD_RE token multiplicities vote ±1 per signature bit (bit set
    iff strictly more 1-votes), 4×16-bit pigeonhole band buckets,
    capped bucket self-join, true Hamming distance via
    ``bit_count(xor(...))``. Bit tests use HUGEINT divide-mod against
    literal powers of two (no shift-type pitfalls)."""
    from orchid_fst_ray.pipelines.dedup import _WS_RE2

    pat = rf"[a-z0-9]+|[^{_WS_RE2}a-z0-9]"
    bit_rows = ",\n                ".join(
        f"({j}, {1 << j}::HUGEINT)" for j in range(64))
    band_rows = ", ".join(f"({b}, {1 << (16 * b)}::HUGEINT)"
                          for b in range(4))
    ham = (f"bit_count(xor((x.sh % {_SQL_M})::UBIGINT, "
           f"(y.sh % {_SQL_M})::UBIGINT))::BIGINT")

    return f"""
            WITH tok AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '{pat}') AS ts
              FROM documents),
            tokr AS (
              SELECT doc_id, unnest(ts) AS t FROM tok),
            tokc AS (
              SELECT doc_id, t, count(*)::BIGINT AS c
              FROM tokr GROUP BY doc_id, t),
            dhash AS (
              SELECT t, {_sql_poly_token("t")} AS th
              FROM (SELECT DISTINCT t FROM tokc)),
            bits(j, v) AS (VALUES
                {bit_rows}),
            votes AS (
              SELECT tc.doc_id, bits.j, bits.v,
                     sum(tc.c * ((dh.th // bits.v) % 2))::BIGINT AS ones,
                     sum(tc.c)::BIGINT AS tot
              FROM tokc tc JOIN dhash dh USING (t) CROSS JOIN bits
              GROUP BY tc.doc_id, bits.j, bits.v),
            sigd AS (
              SELECT doc.doc_id,
                     coalesce(sum(CASE WHEN 2 * v.ones > v.tot
                                       THEN v.v END),
                              0)::HUGEINT AS sh
              FROM documents doc LEFT JOIN votes v USING (doc_id)
              GROUP BY doc.doc_id),
            bands(b, bv) AS (VALUES {band_rows}),
            buckets AS (
              SELECT doc_id, sh,
                     (sh // bv) % 65536
                       + b * 4294967296::HUGEINT AS bucket
              FROM sigd CROSS JOIN bands),
            capped AS (
              SELECT bucket, doc_id, sh FROM (
                SELECT bucket, doc_id, sh,
                       row_number() OVER (PARTITION BY bucket
                                          ORDER BY doc_id) AS rn
                FROM buckets) WHERE rn <= {max_bucket})
            SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
                   {ham} AS hamming
            FROM capped x JOIN capped y
              ON x.bucket = y.bucket AND x.doc_id < y.doc_id
            WHERE {ham} <= {max_hamming}
            ORDER BY id_a, id_b"""


def _er_core_sql() -> str:
    r"""Exact SQL replica of the ``er_core_clusters`` query: ASCII-only
    docs, first-8-token doc_key (same split/slice/trim/collapse chain
    as ``doc_keys_from_text``), d=2 Damerau candidate self-join per
    lang block, the PairScorer's own DuckDB scoring expressions
    (0.5·jw + 0.5·edit_sim ≥ 0.82 OR char_dist ≤ 1), connected
    components via recursive transitive closure with numeric-min
    labels."""
    return r"""
            WITH RECURSIVE docs0 AS (
              SELECT doc_id, lower(coalesce(text, '')) AS lt, lang
              FROM documents
              WHERE regexp_matches(coalesce(text, ''),
                                   '^[\x00-\x7F]*$')),
            keys AS (
              SELECT doc_id, lang,
                     regexp_replace(trim(array_to_string(
                         (regexp_split_to_array(lt, '[^\pL\pN]+'))[1:8],
                         ' ')), '  +', ' ', 'g') AS k
              FROM docs0),
            cand AS (
              -- |len(a)-len(b)| <= d is a NECESSARY condition for
              -- DL <= d: the prefilter only prunes, never changes the
              -- result (the n^2-per-block DL evaluation dominates the
              -- oracle otherwise)
              SELECT a.doc_id AS ia, b.doc_id AS ib, a.k AS ka, b.k AS kb
              FROM keys a JOIN keys b
                ON a.lang = b.lang AND a.doc_id < b.doc_id
               AND abs(length(a.k) - length(b.k)) <= 2
              WHERE a.k = b.k OR damerau_levenshtein(a.k, b.k) <= 2),
            scored AS (
              SELECT ia, ib FROM cand
              WHERE damerau_levenshtein(ka, kb) <= 1
                 OR (jaro_winkler_similarity(ka, kb) * 0.5
                     + (CASE WHEN greatest(length(ka), length(kb)) = 0
                             THEN 1.0
                             ELSE 1.0 - levenshtein(ka, kb)::DOUBLE
                                  / greatest(length(ka), length(kb))
                        END) * 0.5) >= 0.82),
            edges AS (SELECT ia AS u, ib AS v FROM scored
                      UNION SELECT ib, ia FROM scored),
            reach(a, b) AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u),
            labels AS (SELECT a AS node, min(b) AS mn FROM reach
                       GROUP BY a)
            SELECT k.doc_id,
                   least(k.doc_id,
                         coalesce(l.mn, k.doc_id))::BIGINT AS cluster_id
            FROM keys k LEFT JOIN labels l ON l.node = k.doc_id
            ORDER BY k.doc_id"""


def _pii_sql() -> str:
    """PII-count oracle sharing the engine's RE2 patterns verbatim
    (DuckDB standard strings don't process backslash escapes, so the
    pattern text passes through unchanged)."""
    from orchid_fst_ray.pipelines.textstats import PII_PATTERNS
    cols = ",\n                   ".join(
        f"len(regexp_extract_all(text, '{pat}'))::BIGINT AS {name}"
        for name, pat in PII_PATTERNS.items())
    total = " + ".join(PII_PATTERNS)
    return f"""
            WITH c AS (
              SELECT doc_id,
                   {cols}
              FROM documents)
            SELECT doc_id, n_emails, n_urls, n_ipv4, n_phones,
                   ({total}) > 0 AS has_pii
            FROM c ORDER BY doc_id"""


_PII_SQL = _pii_sql()
_STOPS_FR_SQL = ("['le','la','les','et','est','un','une','pas','avec',"
                 "'de','du','des','que','pour']")


_EMB_DUP_SQL = """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                 b.embedding::DOUBLE[]) >= 0.4
    ORDER BY id_a, id_b"""

_ANN_TOPK_SQL = """
    WITH q AS (SELECT vec_id AS qid, embedding AS qe
               FROM embeddings WHERE vec_id IN (0, 7, 42)),
    s AS (SELECT q.qid, e.vec_id,
                 list_cosine_similarity(e.embedding::DOUBLE[],
                                        q.qe::DOUBLE[]) AS cos
          FROM embeddings e, q WHERE e.vec_id != q.qid),
    r AS (SELECT qid, vec_id,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cos DESC, vec_id) AS rank
          FROM s)
    SELECT qid AS query_id, vec_id, rank FROM r
    WHERE rank <= 10 ORDER BY query_id, rank"""


def oracle_sql() -> dict[str, str]:
    match_list = ", ".join(f"'{k}'" for k in _MATCH_KEYS)
    return {
        "dict_items": f"SELECT * FROM ({_PART_KV}) ORDER BY key",
        "dict_match": (f"SELECT * FROM ({_PART_KV}) "
                       f"WHERE key IN ({match_list}) ORDER BY key"),
        "dict_prefix": (f"SELECT * FROM ({_PART_KV}) "
                        "WHERE key LIKE 're%' ORDER BY key"),
        "dict_range": (f"SELECT * FROM ({_PART_KV}) "
                       "WHERE key >= 'b' AND key < 'm' ORDER BY key"),
        "dict_fuzzy_lev": (
            "SELECT DISTINCT p_name AS key FROM part "
            f"WHERE levenshtein(p_name, '{_FUZZY_QUERY}') <= 2 "
            "ORDER BY key"),
        # DuckDB's damerau_levenshtein is the same restricted
        # (OSA/transposition) distance the engine's DL automaton
        # implements, and it agrees byte==char on the ASCII part names
        # (validated in tests/test_scoring.py).
        "dict_fuzzy_damerau": (
            "SELECT DISTINCT p_name AS key FROM part "
            f"WHERE damerau_levenshtein(p_name, '{_FUZZY_QUERY}') <= 2 "
            "ORDER BY key"),
        "dict_fuzzy_selfjoin": """
            WITH k AS (SELECT DISTINCT p_name AS key FROM part)
            SELECT a.key AS query, b.key AS key
            FROM k a JOIN k b
              ON b.key > a.key AND levenshtein(a.key, b.key) <= 1
            ORDER BY query, key""",
        "dict_union": """
            WITH l AS (SELECT p_name AS key, max(p_partkey) AS value
                       FROM part WHERE p_name < 'm' GROUP BY p_name),
                 r AS (SELECT p_name AS key, min(p_partkey) AS value
                       FROM part WHERE p_name >= 'f' GROUP BY p_name)
            SELECT coalesce(l.key, r.key) AS key,
                   coalesce(r.value, l.value) AS value
            FROM l FULL OUTER JOIN r ON l.key = r.key ORDER BY key""",
        "dict_intersect": """
            WITH l AS (SELECT p_name AS key, max(p_partkey) AS value
                       FROM part WHERE p_name < 'm' GROUP BY p_name),
                 r AS (SELECT p_name AS key FROM part
                       WHERE p_name >= 'f' GROUP BY p_name)
            SELECT l.key AS key, l.value AS value
            FROM l JOIN r ON l.key = r.key
            ORDER BY l.key""",
        "dict_difference": """
            WITH l AS (SELECT p_name AS key, max(p_partkey) AS value
                       FROM part WHERE p_name < 'm' GROUP BY p_name)
            SELECT key, value FROM l
            WHERE key NOT IN (SELECT DISTINCT p_name FROM part
                              WHERE p_name >= 'f')
            ORDER BY key""",
        "events_window": """
            SELECT date_trunc('minute', ts) AS window_start, event_type,
                   count(*) AS n_events, min(value) AS min_value,
                   max(value) AS max_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
        "events_asof": """
            SELECT l.event_id AS event_id, r.event_id AS prior_id
            FROM (SELECT * FROM events WHERE event_type = 'purchase') l
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') r
              ON l.user_id = r.user_id AND l.ts > r.ts
            ORDER BY event_id""",
        "events_range_join": """
            SELECT l.event_id AS event_id, r.event_id AS match_id
            FROM (SELECT * FROM events WHERE event_type = 'purchase') l
            JOIN (SELECT * FROM events WHERE event_type = 'click') r
              ON l.user_id = r.user_id
             AND r.ts < l.ts
             AND r.ts >= l.ts - INTERVAL 30 MINUTE
            ORDER BY event_id, match_id""",
        "events_sessions": """
            WITH o AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s AS (
              SELECT user_id, ts,
                     sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) - 1 AS session_id
              FROM o)
            SELECT user_id, session_id::BIGINT AS session_id,
                   count(*) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM s GROUP BY 1, 2 ORDER BY 1, 2""",
        "lineitem_summary": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS n_rows,
                   min(l_quantity) AS min_qty,
                   max(l_quantity) AS max_qty,
                   min(l_extendedprice) AS min_price,
                   max(l_extendedprice) AS max_price
            FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
        "orders_per_priority": """
            SELECT o_orderpriority, count(*) AS n_lineitems
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1 ORDER BY 1""",
        "dict_fuzzy_prefixlen": (
            "SELECT DISTINCT p_name AS key FROM part "
            f"WHERE levenshtein(p_name, '{_FUZZY_QUERY}') <= 2 "
            f"AND substr(p_name, 1, 4) = substr('{_FUZZY_QUERY}', 1, 4) "
            "ORDER BY key"),
        "dict_fuzzy_batch": """
            SELECT q.query, p.key
            FROM (VALUES ('red widget'), ('blue balt'), ('smal ring'), ('green gear')) AS q(query)
            JOIN (SELECT DISTINCT p_name AS key FROM part) AS p
              ON levenshtein(p.key, q.query) <= 1
            ORDER BY q.query, p.key""",
        "sort_lines": ("SELECT doc_id, text FROM documents "
                       "ORDER BY trim(text), doc_id"),
        "dedup_exact": ("SELECT min(doc_id) AS doc_id FROM documents "
                        "GROUP BY text ORDER BY doc_id"),
        "dedup_ngram_jaccard": f"""
            WITH {_SHINGLES},
            ex AS (SELECT doc_id, unnest(sets) AS s FROM sh),
            inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
                      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            sizes AS (SELECT doc_id, len(sets) AS n FROM sh)
            SELECT ia AS id_a, ib AS id_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = ia
            JOIN sizes sb ON sb.doc_id = ib
            WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.5
            ORDER BY id_a, id_b""",
        # FULL composite oracle: quality gate (same predicate as
        # quality_stats, min_tokens=10) → exact dedup (min doc_id per
        # text) → exact 3-gram-Jaccard pairs at >= 0.5 → connected
        # components (transitive closure via recursive CTE; min-id
        # survivor) — end-to-end SQL for the curation pipeline.
        "curated_docs_ngram": f"""
            WITH RECURSIVE base AS (
              SELECT doc_id, text, length(text)::BIGINT AS n_chars,
                     list_filter(regexp_split_to_array(lower(text),
                         '[^a-z0-9]+'), x -> x <> '') AS tk
              FROM documents),
            stats AS (
              SELECT doc_id, text, n_chars, len(tk)::BIGINT AS n_tokens,
                     tk
              FROM base),
            ex AS (SELECT doc_id, unnest(tk) AS tok,
                          generate_subscripts(tk, 1) AS pos FROM stats),
            grp AS (SELECT doc_id, tok,
                           pos - row_number() OVER (
                               PARTITION BY doc_id, tok ORDER BY pos) AS g
                    FROM ex),
            rl AS (SELECT doc_id, count(*) AS run FROM grp
                   GROUP BY doc_id, tok, g),
            mr AS (SELECT doc_id, max(run)::BIGINT AS max_run FROM rl
                   GROUP BY doc_id),
            gated AS (
              SELECT s.doc_id, s.text
              FROM stats s LEFT JOIN mr ON s.doc_id = mr.doc_id
              WHERE s.n_tokens >= 10 AND s.n_tokens <= 100000
                AND s.n_chars <= 12 * s.n_tokens
                AND s.n_tokens <= s.n_chars
                AND coalesce(mr.max_run, 0) < 8),
            dd AS (SELECT min(doc_id) AS doc_id, text FROM gated
                   GROUP BY text),
            tok2 AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '[a-z0-9]+')
                                AS ts
                     FROM dd),
            sh2 AS (SELECT doc_id,
                      CASE WHEN len(ts) >= 3 THEN list_distinct(
                               list_transform(
                                   generate_series(1, len(ts) - 2),
                                   i -> ts[i] || ' ' || ts[i+1] || ' '
                                        || ts[i+2]))
                           WHEN len(ts) > 0
                                THEN [array_to_string(ts, ' ')]
                           ELSE [] END AS sets
                    FROM tok2),
            exs AS (SELECT doc_id, unnest(sets) AS s FROM sh2),
            inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                             count(*) AS i
                      FROM exs a JOIN exs b
                        ON a.s = b.s AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            sizes AS (SELECT doc_id, len(sets) AS n FROM sh2),
            pairs AS (SELECT ia, ib FROM inter
                      JOIN sizes sa ON sa.doc_id = ia
                      JOIN sizes sb ON sb.doc_id = ib
                      WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.5),
            edges AS (SELECT ia AS u, ib AS v FROM pairs
                      UNION SELECT ib, ia FROM pairs),
            reach(a, b) AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u),
            labels AS (SELECT a AS node, min(b) AS mn FROM reach
                       GROUP BY a)
            SELECT doc_id FROM dd
            WHERE doc_id NOT IN (SELECT node FROM labels
                                 WHERE mn < node)
            ORDER BY doc_id""",
        "dedup_embedding": _EMB_DUP_SQL,
        # bits=1 makes every vector probe both buckets: all pairs are
        # candidates and canonical-bucket emission must reproduce the
        # brute set exactly (float32 unit rounding stays ≥30x clear of
        # the 0.4 boundary on these tables — verified at sf0.01/sf0.1)
        "dedup_embedding_lsh_exhaustive": _EMB_DUP_SQL,
        "ann_topk": _ANN_TOPK_SQL,
        # exhaustive-probe configurations (multiprobe == bits / a
        # single IVF cell) degenerate to brute force BY CONSTRUCTION,
        # so the approximate machinery carries the exact brute oracle
        "ann_lsh_exhaustive": _ANN_TOPK_SQL,
        "ann_ivf_exhaustive": _ANN_TOPK_SQL,
        "token_stats": """
            SELECT doc_id,
                   len(regexp_extract_all(text, '[A-Za-z0-9]+'))::BIGINT
                       AS n_tokens,
                   len(list_distinct(regexp_extract_all(lower(text),
                       '[a-z0-9]+')))::BIGINT AS n_distinct_tokens,
                   length(text)::BIGINT AS n_chars
            FROM documents ORDER BY doc_id""",
        "quality_stats": f"""
            WITH base AS (
              SELECT doc_id, length(text)::BIGINT AS n_chars,
                     list_filter(regexp_split_to_array(lower(text),
                         '[^a-z0-9]+'), x -> x <> '') AS tk
              FROM documents),
            stats AS (
              SELECT doc_id, n_chars, len(tk)::BIGINT AS n_tokens,
                     len(list_filter(tk,
                         x -> list_contains({_STOPS_SQL}, x)))::BIGINT
                         AS n_stop, tk
              FROM base),
            ex AS (SELECT doc_id, unnest(tk) AS tok,
                          generate_subscripts(tk, 1) AS pos FROM stats),
            grp AS (SELECT doc_id, tok,
                           pos - row_number() OVER (
                               PARTITION BY doc_id, tok ORDER BY pos) AS g
                    FROM ex),
            rl AS (SELECT doc_id, count(*) AS run FROM grp
                   GROUP BY doc_id, tok, g),
            mr AS (SELECT doc_id, max(run)::BIGINT AS max_run FROM rl
                   GROUP BY doc_id)
            SELECT s.doc_id, s.n_chars, s.n_tokens, s.n_stop,
                   coalesce(mr.max_run, 0)::BIGINT AS max_run,
                   (s.n_tokens >= 10 AND s.n_tokens <= 100000
                    AND s.n_chars <= 12 * s.n_tokens
                    AND s.n_tokens <= s.n_chars
                    AND coalesce(mr.max_run, 0) < 8
                    AND s.n_stop >= 0) AS quality_ok
            FROM stats s LEFT JOIN mr ON s.doc_id = mr.doc_id
            ORDER BY s.doc_id""",
        "lang_id": f"""
            WITH base AS (
              SELECT doc_id, length(text)::BIGINT AS n_char,
                     len(regexp_extract_all(text,
                         '[\\x{{4E00}}-\\x{{9FFF}}]'))::BIGINT AS cjk,
                     list_filter(regexp_split_to_array(lower(text),
                         '[^a-z0-9]+'), x -> x <> '') AS tk
              FROM documents),
            h AS (SELECT doc_id, n_char, cjk,
                         len(list_filter(tk,
                             x -> list_contains({_STOPS_SQL}, x))) AS en,
                         len(list_filter(tk,
                             x -> list_contains({_STOPS_DE_SQL}, x))) AS de,
                         len(list_filter(tk,
                             x -> list_contains({_STOPS_FR_SQL}, x))) AS fr
                  FROM base)
            SELECT doc_id,
                   CASE WHEN n_char > 0 AND cjk > 0 AND cjk * 4 >= n_char
                             THEN 'zh'
                        WHEN en >= de AND en >= fr THEN 'en'
                        WHEN de >= fr THEN 'de'
                        ELSE 'fr' END AS pred_lang
            FROM h ORDER BY doc_id""",
        "er_core_clusters": _er_core_sql(),
        "curated_docs": _curated_minhash_sql(),
        "dedup_minhash": _minhash_sql(),
        "dedup_simhash": _simhash_sql(),
        "doc_fingerprints": _fingerprint_sql(),
        "decontaminate": _decontam_sql(),
        "pii_scan": _PII_SQL,
        # context-window chunking: list-slice windows over the same
        # [a-z0-9]+ token stream, text rebuilt with array_to_string
        "doc_chunks": """
            WITH tok AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
              FROM documents),
            c AS (SELECT doc_id, ts, len(ts) AS n FROM tok
                  WHERE len(ts) > 0),
            k AS (SELECT doc_id, ts, n,
                    unnest(generate_series(0,
                      CASE WHEN n <= 64 THEN 0
                           ELSE CAST(ceil((n - 64) / 48.0) AS BIGINT)
                      END)) AS chunk_idx
                  FROM c)
            SELECT doc_id, chunk_idx,
                   least(chunk_idx*48 + 64, n) - chunk_idx*48
                       AS n_tokens,
                   array_to_string(
                       ts[chunk_idx*48 + 1 :
                          least(chunk_idx*48 + 64, n)], ' ')
                       AS chunk_text
            FROM k ORDER BY doc_id, chunk_idx""",
        # characteristic terms: integer (tf DESC, df ASC, term ASC)
        # ranking — row_number window over a tf x df join
        "salient_terms": """
            WITH tok AS (
              SELECT doc_id, unnest(regexp_extract_all(lower(text),
                     '[a-z0-9]+')) AS term
              FROM documents),
            tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
                   FROM tok GROUP BY 1, 2),
            df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
                   FROM tok GROUP BY 1),
            r AS (SELECT t.doc_id, t.term, t.tf, d.df,
                         row_number() OVER (PARTITION BY t.doc_id
                             ORDER BY t.tf DESC, d.df ASC,
                                      t.term ASC)::BIGINT AS rank
                  FROM tf t JOIN df d USING (term))
            SELECT doc_id, rank, term, tf, df FROM r
            WHERE rank <= 5 ORDER BY doc_id, rank""",
        # sequence packing: the global prefix scan is one window SUM
        "pack_sequences": """
            WITH tok AS (
              SELECT doc_id,
                     len(regexp_extract_all(lower(text),
                         '[a-z0-9]+'))::BIGINT AS n
              FROM documents),
            s AS (
              SELECT doc_id, n,
                     coalesce(SUM(n) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0)::BIGINT AS tok_start
              FROM tok)
            SELECT doc_id, n AS n_tokens, tok_start,
                   (CASE WHEN n > 0 THEN tok_start // 256
                         ELSE -1 END)::BIGINT AS seq_first,
                   (CASE WHEN n > 0 THEN (tok_start + n - 1) // 256
                         ELSE -1 END)::BIGINT AS seq_last
            FROM s ORDER BY doc_id""",
        # deterministic hash sampling: the SQL replays poly_hash64
        # over str(doc_id) in HUGEINT — same integer thresholds as
        # pipelines/sampling.py (GRANULARITY = 10000)
        "sample_hash": f"""
            WITH k AS (
              SELECT doc_id, lang, n_chars,
                     CAST(doc_id AS VARCHAR) AS kstr
              FROM documents)
            SELECT doc_id, lang, n_chars FROM k
            WHERE ({_sql_poly_token("kstr")}) % 10000 < 1000
            ORDER BY doc_id""",
        "sample_stratified": f"""
            WITH k AS (
              SELECT doc_id, lang, n_chars,
                     CAST(doc_id AS VARCHAR) AS kstr
              FROM documents)
            SELECT doc_id, lang, n_chars FROM k
            WHERE ({_sql_poly_token("kstr")}) % 10000 <
                  CASE WHEN lang = 'en' THEN 500 ELSE 5000 END
            ORDER BY doc_id""",
        "sample_weighted": f"""
            WITH k AS (
              SELECT doc_id, lang, n_chars,
                     CAST(doc_id AS VARCHAR) AS kstr
              FROM documents)
            SELECT doc_id, lang, n_chars FROM k
            WHERE ({_sql_poly_token("kstr")}) % 10000 <
                  (LEAST(n_chars, 1000) * 10000) // 1000
            ORDER BY doc_id""",
        "heavy_hitters": """
            WITH toks AS (
              SELECT unnest(list_filter(regexp_split_to_array(lower(text),
                  '[^a-z0-9]+'), x -> x <> '')) AS token
              FROM documents)
            SELECT token, count(*)::BIGINT AS n FROM toks
            GROUP BY token ORDER BY n DESC, token LIMIT 20""",
        "term_frequencies": """
            WITH toks AS (
              SELECT unnest(list_filter(regexp_split_to_array(lower(text),
                  '[^a-z0-9]+'), x -> x <> '')) AS token
              FROM documents)
            SELECT token, count(*)::BIGINT AS n FROM toks
            GROUP BY token ORDER BY n DESC, token LIMIT 50""",
        "approx_distinct_tokens": _hll_registers_sql(p=10),
        "approx_distinct_shingles": _hll_shingles_sql(p=10, k=3),
        "doc_length_quantiles": """
            WITH qd(q, num, den) AS (VALUES
                ('p25', 1, 4), ('p50', 1, 2), ('p75', 3, 4),
                ('p90', 9, 10), ('p99', 99, 100)),
            r AS (
              SELECT lang, n_chars::BIGINT AS v,
                     row_number() OVER (
                         PARTITION BY lang ORDER BY n_chars) AS rn,
                     count(*) OVER (PARTITION BY lang) AS n
              FROM documents)
            -- nearest-rank via INTEGER ceil (num*n + den - 1) // den:
            -- float ceil(0.9*n) misrounds when q*n is integral
            SELECT r.lang, qd.q, r.v AS value
            FROM r JOIN qd
              ON r.rn = (qd.num * r.n + qd.den - 1) // qd.den
            ORDER BY lang, q""",
        "inverted_index": """
            WITH tok AS (
              SELECT DISTINCT doc_id,
                     unnest(regexp_extract_all(lower(text),
                                               '[a-z0-9]+')) AS term
              FROM documents),
            rk AS (
              SELECT term, doc_id,
                     row_number() OVER (
                         PARTITION BY term ORDER BY doc_id) AS rn,
                     count(*) OVER (PARTITION BY term) AS df
              FROM tok)
            SELECT term, MAX(df)::BIGINT AS df,
                   string_agg(CASE WHEN rn <= 64
                                   THEN CAST(doc_id AS VARCHAR) END,
                              ',' ORDER BY doc_id) AS postings
            FROM rk GROUP BY term HAVING MAX(df) >= 2
            ORDER BY term""",
        "bloom_semijoin_urgent": """
            SELECT l_returnflag, count(*)::BIGINT AS n_items,
                   CAST(sum(CAST(floor(l_quantity) AS BIGINT))
                        AS BIGINT) AS sum_qty_units
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE o_orderpriority = '1-URGENT')
            GROUP BY l_returnflag ORDER BY l_returnflag""",
        "bloom_antijoin_nonurgent": """
            SELECT l_returnflag, count(*)::BIGINT AS n_items,
                   CAST(sum(CAST(floor(l_quantity) AS BIGINT))
                        AS BIGINT) AS sum_qty_units
            FROM lineitem
            WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                     WHERE o_orderpriority = '1-URGENT')
            GROUP BY l_returnflag ORDER BY l_returnflag""",
        "kmeans_embeddings": _kmeans_sql(k=8, iters=2),
        "events_lag_lead": """
            SELECT event_id, user_id,
                   row_number() OVER w::BIGINT AS row_num,
                   coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER w,
                            -1)::BIGINT AS prev_gap_us,
                   coalesce(lead(epoch_us(ts)) OVER w - epoch_us(ts),
                            -1)::BIGINT AS next_gap_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY event_id""",
        "events_funnel": """
            WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
                   JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'click' AND e.ts > s1.t
                   GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
                   JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t
                   GROUP BY e.user_id)
            SELECT * FROM (VALUES
              (1::BIGINT, 'view',
               (SELECT count(*)::BIGINT FROM s1)),
              (2::BIGINT, 'click',
               (SELECT count(*)::BIGINT FROM s2)),
              (3::BIGINT, 'purchase',
               (SELECT count(*)::BIGINT FROM s3)))
              AS t(step, step_type, n_users)
            ORDER BY step""",
        "top_orders_q3": """
            SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
                   sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(floor(l.l_discount * 100)
                                     AS BIGINT)))::BIGINT
                       AS revenue_units
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-06-01'
              AND l.l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY 1, 2, 3
            ORDER BY revenue_units DESC, o_orderkey LIMIT 10""",
        "local_supplier_revenue": """
            SELECT n_name,
                   sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(floor(l_discount * 100)
                                     AS BIGINT)))::BIGINT
                       AS revenue_units
            FROM customer, orders, lineitem, supplier, nation
            WHERE c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey
              AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '2000-01-01'
            GROUP BY n_name
            ORDER BY revenue_units DESC, n_name""",
        "events_ntile": """
            SELECT event_id, event_type,
                   CAST(floor(value * 100) AS BIGINT) AS value_units,
                   ntile(4) OVER (PARTITION BY event_type
                                  ORDER BY value, event_id)::BIGINT
                       AS tile
            FROM events ORDER BY event_id""",
        "events_retention": """
            WITH f AS (SELECT user_id,
                              date_trunc('week', min(ts)) AS cohort_week
                       FROM events GROUP BY user_id),
            a AS (SELECT DISTINCT user_id,
                         date_trunc('week', ts) AS wk FROM events)
            SELECT f.cohort_week,
                   CAST((epoch_us(a.wk) - epoch_us(f.cohort_week))
                        // (7 * 86400 * 1000000::BIGINT) AS BIGINT)
                       AS week_offset,
                   count(*)::BIGINT AS n_users
            FROM a JOIN f USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2""",
        "lineitem_cube": """
            SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   count(*)::BIGINT AS n_rows,
                   sum(CAST(floor(l_quantity) AS BIGINT))::BIGINT
                       AS sum_units
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY l_returnflag, l_linestatus""",
        "doc_length_extremes": """
            -- nearest-rank p10/p90 per lang, INTEGER ceil rank
            -- (num*n + den - 1) // den, same as doc_length_quantiles
            WITH r AS (
              SELECT lang, n_chars::BIGINT AS v,
                     row_number() OVER (
                         PARTITION BY lang ORDER BY n_chars) AS rn,
                     count(*) OVER (PARTITION BY lang) AS n
              FROM documents),
            b AS (SELECT lang,
                    MAX(CASE WHEN rn = (1*n + 9) // 10 THEN v END) AS lo,
                    MAX(CASE WHEN rn = (9*n + 9) // 10 THEN v END) AS hi
                  FROM r GROUP BY lang)
            SELECT d.doc_id, d.lang, d.n_chars::BIGINT AS value,
                   CASE WHEN d.n_chars < b.lo THEN 'low'
                        ELSE 'high' END AS side
            FROM documents d JOIN b ON d.lang = b.lang
            WHERE d.n_chars < b.lo OR d.n_chars > b.hi
            ORDER BY doc_id""",
        "tfidf_pairs": """
            -- integer TF-IDF: w = tf * ((N*1000) // df), stopword cap
            -- df <= 32 bounds the inverted-index pair fan-out
            WITH tf AS (
              SELECT doc_id, tok, count(*)::BIGINT AS tf FROM (
                SELECT doc_id,
                       unnest(list_filter(regexp_split_to_array(
                           lower(text), '[^a-z0-9]+'),
                           x -> x <> '')) AS tok
                FROM documents) GROUP BY doc_id, tok),
            df AS (SELECT tok, count(*)::BIGINT AS df FROM tf
                   GROUP BY tok),
            n AS (SELECT count(*)::BIGINT AS n FROM documents),
            w AS (SELECT tf.doc_id, tf.tok,
                         tf.tf * ((n.n * 1000) // df.df) AS w
                  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
                  WHERE df.df BETWEEN 2 AND 32)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   sum(a.w * b.w)::BIGINT AS dot
            FROM w a JOIN w b
              ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY 1, 2 ORDER BY dot DESC, doc_a, doc_b LIMIT 50""",
        "dup_gram_stats": """
            WITH base AS (
              SELECT doc_id, list_filter(regexp_split_to_array(
                       lower(text), '[^a-z0-9]+'), x -> x <> '') AS l
              FROM documents),
            toks AS (SELECT doc_id, unnest(l) AS tok,
                            generate_subscripts(l, 1) AS pos
                     FROM base),
            g AS (SELECT doc_id,
                    tok || ' ' || lead(tok, 1) OVER w
                        || ' ' || lead(tok, 2) OVER w
                        || ' ' || lead(tok, 3) OVER w
                        || ' ' || lead(tok, 4) OVER w AS gram
                  FROM toks
                  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
            gg AS (SELECT doc_id, gram FROM g WHERE gram IS NOT NULL),
            nd AS (SELECT gram, count(DISTINCT doc_id) AS ndoc
                   FROM gg GROUP BY gram),
            ng AS (SELECT doc_id, count(*)::BIGINT AS n_grams
                   FROM gg GROUP BY doc_id),
            ndup AS (SELECT gg.doc_id, count(*)::BIGINT AS n_dup
                     FROM gg JOIN nd ON gg.gram = nd.gram
                     WHERE nd.ndoc >= 2 GROUP BY gg.doc_id)
            SELECT d.doc_id,
                   coalesce(ng.n_grams, 0)::BIGINT AS n_grams,
                   coalesce(ndup.n_dup, 0)::BIGINT AS n_dup
            FROM documents d
            LEFT JOIN ng USING (doc_id) LEFT JOIN ndup USING (doc_id)
            ORDER BY d.doc_id""",
        "blocked_jw_scores": """
            -- same-block (lang, n_chars//64) pairs scored by DuckDB's
            -- jaro_winkler kernel over the first 40 chars; blocks
            -- larger than 256 rows are skipped (degenerate-key cap)
            WITH k AS (
              SELECT doc_id,
                     lang || '|' || CAST(n_chars // 64 AS VARCHAR)
                         AS block,
                     substr(text, 1, 40) AS key
              FROM documents),
            sz AS (SELECT block, count(*) AS n FROM k GROUP BY block),
            p AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     CAST(floor(1000000 * jaro_winkler_similarity(
                          a.key, b.key)) AS BIGINT) AS jw_ppm
              FROM k a JOIN k b
                ON a.block = b.block AND a.doc_id < b.doc_id
              JOIN sz ON sz.block = a.block AND sz.n <= 256)
            SELECT doc_a, doc_b, jw_ppm FROM p
            WHERE jw_ppm >= 850000
            ORDER BY doc_a, doc_b""",
        "lineitem_rollup": """
            SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   count(*)::BIGINT AS n_rows,
                   sum(CAST(floor(l_quantity) AS BIGINT))::BIGINT
                       AS sum_units
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY l_returnflag, l_linestatus""",
        "events_running": """
            SELECT event_id, user_id,
                   row_number() OVER w::BIGINT AS run_cnt,
                   sum(CAST(floor(value * 100) AS BIGINT))
                       OVER w::BIGINT AS run_units
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
            ORDER BY event_id""",
        "repetition_stats": """
            WITH base AS (
              SELECT doc_id, list_filter(regexp_split_to_array(
                       lower(text), '[^a-z0-9]+'), x -> x <> '') AS l
              FROM documents),
            toks AS (
              SELECT doc_id, unnest(l) AS tok,
                     generate_subscripts(l, 1) AS pos
              FROM base),
            stats AS (
              SELECT doc_id, count(*)::BIGINT AS n_tok,
                     count(DISTINCT tok)::BIGINT AS n_dist,
                     (sum(length(tok)) + count(*) - 1)::BIGINT
                         AS total_len
              FROM toks GROUP BY doc_id),
            g2 AS (
              SELECT doc_id,
                     tok || ' ' || lead(tok) OVER
                       (PARTITION BY doc_id ORDER BY pos) AS gram
              FROM toks),
            g2c AS (SELECT doc_id, gram, count(*)::BIGINT AS cnt
                    FROM g2 WHERE gram IS NOT NULL
                    GROUP BY doc_id, gram),
            b2 AS (SELECT doc_id, cnt, length(gram)::BIGINT AS glen
                   FROM (SELECT *, row_number() OVER
                           (PARTITION BY doc_id
                            ORDER BY cnt DESC, gram) AS rn FROM g2c)
                   WHERE rn = 1),
            g3 AS (
              SELECT doc_id,
                     tok || ' ' || lead(tok, 1) OVER w
                         || ' ' || lead(tok, 2) OVER w AS gram
              FROM toks
              WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
            g3c AS (SELECT doc_id, gram, count(*)::BIGINT AS cnt
                    FROM g3 WHERE gram IS NOT NULL
                    GROUP BY doc_id, gram),
            b3 AS (SELECT doc_id, cnt, length(gram)::BIGINT AS glen
                   FROM (SELECT *, row_number() OVER
                           (PARTITION BY doc_id
                            ORDER BY cnt DESC, gram) AS rn FROM g3c)
                   WHERE rn = 1)
            SELECT d.doc_id,
                   coalesce((s.n_tok - s.n_dist) * 1000000 // s.n_tok,
                            0)::BIGINT AS dup_token_ppm,
                   coalesce(b2.cnt * b2.glen * 1000000 // s.total_len,
                            0)::BIGINT AS top2gram_ppm,
                   coalesce(b3.cnt * b3.glen * 1000000 // s.total_len,
                            0)::BIGINT AS top3gram_ppm
            FROM documents d
            LEFT JOIN stats s USING (doc_id)
            LEFT JOIN b2 USING (doc_id)
            LEFT JOIN b3 USING (doc_id)
            ORDER BY d.doc_id""",
        "partitioned_write": """
            SELECT lang AS part_key, count(*)::BIGINT AS n_rows,
                   0::BIGINT AS skipped
            FROM documents GROUP BY lang ORDER BY part_key""",
        "knn_triangles": """
            WITH s AS (
              SELECT q.vec_id AS qid, e.vec_id AS vid,
                     list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.embedding::DOUBLE[]) AS cos
              FROM embeddings e, embeddings q
              WHERE e.vec_id != q.vec_id),
            r AS (SELECT qid, vid,
                         row_number() OVER (PARTITION BY qid
                                            ORDER BY cos DESC, vid)
                             AS rank
                  FROM s),
            e AS (SELECT DISTINCT least(qid, vid) AS a,
                                  greatest(qid, vid) AS b
                  FROM r WHERE rank <= 3),
            deg AS (SELECT node, count(*)::BIGINT AS deg FROM (
                     SELECT a AS node FROM e
                     UNION ALL SELECT b FROM e) GROUP BY node),
            o AS (SELECT CASE WHEN da.deg <= db.deg
                              THEN e.a ELSE e.b END AS src,
                         CASE WHEN da.deg <= db.deg
                              THEN e.b ELSE e.a END AS dst
                  FROM e JOIN deg da ON e.a = da.node
                         JOIN deg db ON e.b = db.node),
            w AS (SELECT least(o1.dst, o2.dst) AS a,
                         greatest(o1.dst, o2.dst) AS b
                  FROM o o1 JOIN o o2
                    ON o1.src = o2.src AND o1.dst < o2.dst)
            SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
                   (SELECT count(*) FROM e)::BIGINT AS n_edges,
                   (SELECT count(*) FROM w)::BIGINT AS n_wedges,
                   (SELECT count(*) FROM w JOIN e USING (a, b))::BIGINT
                       AS n_triangles""",
        "graph_pagerank": _pagerank_sql(iters=3),
        "customers_per_region": """
            SELECT r_name,
                   count(*)::BIGINT AS n_customers,
                   CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                        AS BIGINT) AS total_acctbal_cents
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name""",
        "priority_flag_summary": """
            SELECT o_orderpriority, l_returnflag,
                   count(*)::BIGINT AS n_items,
                   min(l_quantity) AS min_qty,
                   max(l_quantity) AS max_qty
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY o_orderpriority, l_returnflag
            ORDER BY o_orderpriority, l_returnflag""",
        "events_topk": """
            WITH r AS (
              SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id
                         ORDER BY value DESC, event_id) AS rank
              FROM events)
            SELECT user_id, event_id, value, rank FROM r
            WHERE rank <= 3 ORDER BY user_id, rank""",
        # ann_lsh / ann_ivf (the APPROXIMATE configurations) /
        # dedup_embedding_lsh / er_clusters / multimodal: not (exactly)
        # SQL-expressible → driver rows-only check; recall-floor /
        # F1 pytest gates in tests/test_dataops.py &
        # tests/test_er_pipeline.py instead. Their bucketing machinery
        # IS exactly oracled via the *_exhaustive configurations above.
    }
