"""Round-5 operator tests: window lag/lead, funnel, cube, length
extremes, TF-IDF sparse pairs, duplicated-gram stats, blocked JW
scoring. Each semantic edge is pinned against a hand-computed or
DuckDB-replayed expectation (the sf-level oracle equivalence is
covered by tools/check_oracles.py / the driver)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl: dict):
    import ray.data as rd
    return rd.from_arrow(pa.table(tbl))


US = 1_000_000


def _ts(secs):
    return pa.array(np.asarray(secs, np.int64) * US).cast(
        pa.timestamp("us"))


# ---------------------------------------------------------------- events

def test_lag_lead_gaps_basic(ray_session):
    from orchid_fst_ray.pipelines.events import lag_lead_gaps
    ev = _ds({"event_id": pa.array([1, 2, 3, 4], pa.int64()),
              "user_id": pa.array([7, 7, 7, 9], pa.int64()),
              "ts": _ts([10, 25, 25, 5])})
    got = lag_lead_gaps(ev).to_pandas()
    # user 7: events 1,2,3 ordered by (ts, id); user 9: single event
    assert list(got["event_id"]) == [1, 2, 3, 4]
    assert list(got["row_num"]) == [1, 2, 3, 1]
    assert list(got["prev_gap_us"]) == [-1, 15 * US, 0, -1]
    assert list(got["next_gap_us"]) == [15 * US, 0, -1, -1]


def test_funnel_strictly_after(ray_session):
    from orchid_fst_ray.pipelines.events import funnel_depths
    # u1 full funnel; u2 click BEFORE view (doesn't count) and at the
    # SAME ts as its later view (ties don't advance); u3 view only
    ev = _ds({"user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
              "ts": _ts([10, 20, 30, 5, 5, 1]),
              "event_type": pa.array(["view", "click", "purchase",
                                      "click", "view", "view"])})
    got = funnel_depths(ev).to_pandas()
    assert list(got["step"]) == [1, 2, 3]
    assert list(got["step_type"]) == ["view", "click", "purchase"]
    assert list(got["n_users"]) == [3, 1, 1]


def test_funnel_ignores_other_types(ray_session):
    from orchid_fst_ray.pipelines.events import funnel_depths
    ev = _ds({"user_id": pa.array([1, 1, 1], pa.int64()),
              "ts": _ts([1, 2, 3]),
              "event_type": pa.array(["view", "error", "click"])})
    got = funnel_depths(ev).to_pandas()
    assert list(got["n_users"]) == [1, 1, 0]


# ------------------------------------------------------------------ cube

def test_cube_matches_duckdb(ray_session):
    import duckdb
    from orchid_fst_ray.pipelines.relational import cube_aggregate
    rng = np.random.default_rng(5)
    t = pa.table({"a": pa.array(rng.choice(["x", "y"], 40)),
                  "b": pa.array(rng.choice(["p", "q", "r"], 40)),
                  "u": pa.array(rng.integers(0, 9, 40), pa.int64())})
    got = (cube_aggregate(_ds({c: t[c] for c in t.column_names}),
                          ["a", "b"], "u").to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True))
    con = duckdb.connect()
    want = con.execute("""
        SELECT coalesce(a,'ALL') AS a, coalesce(b,'ALL') AS b,
               count(*)::BIGINT AS n_rows, sum(u)::BIGINT AS sum_units
        FROM t GROUP BY CUBE (a, b) ORDER BY a, b""").df()
    assert got.values.tolist() == want.values.tolist()
    # 2 keys -> 4 grouping sets; the (b)-only set must exist
    assert ((got["a"] == "ALL") & (got["b"] != "ALL")).any()


# -------------------------------------------------------------- extremes

def test_length_extremes(ray_session):
    from orchid_fst_ray.pipelines.analytics import length_extremes
    vals = list(range(1, 21))                    # 1..20, one group
    ds = _ds({"doc_id": pa.array(range(20), pa.int64()),
              "lang": pa.array(["en"] * 20),
              "n_chars": pa.array(vals, pa.int64())})
    got = length_extremes(ds).to_pandas()
    # nearest-rank p10 of 1..20 = 2, p90 = 18: strict outside
    assert list(got["value"]) == [1, 19, 20]
    assert list(got["side"]) == ["low", "high", "high"]


# ----------------------------------------------------------------- tfidf

def test_tfidf_pairs_exact(ray_session):
    from orchid_fst_ray.pipelines.similarity import tfidf_pairs
    docs = _ds({"doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["apple pear apple", "apple pear",
                                  "plum"])})
    got = tfidf_pairs(docs, n_docs=3, min_df=2, max_df=32,
                      top_n=10).to_pandas()
    # idf(apple)=idf(pear)=(3*1000)//2=1500; w1=(2*1500, 1500),
    # w2=(1500, 1500); dot = 2*1500*1500 + 1500*1500
    assert got.values.tolist() == [[1, 2, 3 * 1500 * 1500]]


def test_tfidf_df_cap_drops_stopword(ray_session):
    from orchid_fst_ray.pipelines.similarity import tfidf_pairs
    docs = _ds({"doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["the cat", "the dog", "the owl"])})
    got = tfidf_pairs(docs, n_docs=3, min_df=2, max_df=2,
                      top_n=10).to_pandas()
    assert len(got) == 0                 # 'the' has df=3 > cap


# ------------------------------------------------------------- dup grams

def test_dup_gram_stats(ray_session):
    from orchid_fst_ray.pipelines.textstats import dup_gram_stats
    shared = "one two three four five"
    docs = _ds({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array([
                    shared + " tail a b c",      # grams 1..5 of 9 toks
                    "lead " + shared,            # shares the 5-gram
                    "totally different words here now and then",
                    "short one"])})              # < 5 tokens
    got = dup_gram_stats(docs, k=5).to_pandas().set_index("doc_id")
    assert got.loc[1, "n_grams"] == 5 and got.loc[1, "n_dup"] == 1
    assert got.loc[2, "n_grams"] == 2 and got.loc[2, "n_dup"] == 1
    assert got.loc[3, "n_dup"] == 0
    assert got.loc[4, "n_grams"] == 0 and got.loc[4, "n_dup"] == 0


# ------------------------------------------------------------ blocked jw

def test_blocked_jw_identical_and_cap(ray_session):
    from orchid_fst_ray.pipelines.er import blocked_pair_scores
    docs = _ds({"doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["hello world", "hello world",
                                  "zzz entirely other"]),
                "lang": pa.array(["en", "en", "en"]),
                "n_chars": pa.array([11, 11, 18], pa.int64())})
    got = blocked_pair_scores(docs).to_pandas()
    assert got.values.tolist() == [[1, 2, 1_000_000]]
    # max_block cap: same input with cap 1 -> block skipped entirely
    got2 = blocked_pair_scores(docs, max_block=1).to_pandas()
    assert len(got2) == 0


def test_blocked_jw_cross_block_never_pairs(ray_session):
    from orchid_fst_ray.pipelines.er import blocked_pair_scores
    docs = _ds({"doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["same text", "same text"]),
                "lang": pa.array(["en", "de"]),
                "n_chars": pa.array([9, 9], pa.int64())})
    assert len(blocked_pair_scores(docs).to_pandas()) == 0


# ---------------------------------------------------------------- q3 join

def test_q3_top_orders_matches_duckdb(ray_session):
    import duckdb
    from orchid_fst_ray.pipelines.relational import q3_top_orders
    sf = "/root/testdata/sf0.001"
    got = q3_top_orders(sf).to_pandas()
    con = duckdb.connect()
    want = con.execute(f"""
        SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
               sum(CAST(floor(l.l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(floor(l.l_discount*100) AS BIGINT)))::BIGINT
                   AS revenue_units
        FROM '{sf}/customer.parquet' c
        JOIN '{sf}/orders.parquet' o ON c.c_custkey = o.o_custkey
        JOIN '{sf}/lineitem.parquet' l ON o.o_orderkey = l.l_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-06-01'
          AND l.l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY 1, 2, 3
        ORDER BY revenue_units DESC, o_orderkey LIMIT 10""").df()
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    assert got["revenue_units"].tolist() == want["revenue_units"].tolist()


# ----------------------------------------------------------- ntile window

def test_value_ntile_uneven_split(ray_session):
    from orchid_fst_ray.pipelines.events import value_ntile
    # 6 rows, one group: NTILE(4) -> buckets of 2,2,1,1
    ev = _ds({"event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
              "event_type": pa.array(["x"] * 6),
              "value": pa.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6])})
    got = value_ntile(ev).to_pandas()
    assert list(got["tile"]) == [1, 1, 2, 2, 3, 4]
    assert list(got["value_units"]) == [10, 20, 30, 40, 50, 60]


def test_value_ntile_matches_duckdb(ray_session):
    import duckdb
    from orchid_fst_ray.pipelines.events import value_ntile
    rng = np.random.default_rng(11)
    n = 200
    ev_t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
        "value": pa.array(rng.random(n))})
    got = value_ntile(_ds({c: ev_t[c] for c in ev_t.column_names})
                      ).to_pandas()
    con = duckdb.connect()
    want = con.execute("""
        SELECT event_id, ntile(4) OVER (PARTITION BY event_type
            ORDER BY value, event_id)::BIGINT AS tile
        FROM ev_t ORDER BY event_id""").df()
    assert got["tile"].tolist() == want["tile"].tolist()


# ------------------------------------------------------------- retention

def test_retention_cohorts(ray_session):
    from orchid_fst_ray.pipelines.events import retention_cohorts
    DAY = 86400
    # Mon 2024-01-01 epoch; u1 active weeks 0,1,3; u2 week 0 only
    base = 1_704_067_200
    ev = _ds({"user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
              "ts": _ts([base, base + 2 * DAY, base + 8 * DAY,
                         base + 22 * DAY, base + 3 * DAY])})
    got = retention_cohorts(ev).to_pandas()
    assert got["week_offset"].tolist() == [0, 1, 3]
    assert got["n_users"].tolist() == [2, 1, 1]


# ------------------------------------------------------------ q5ish join

def test_local_supplier_revenue_matches_duckdb(ray_session):
    import duckdb
    from orchid_fst_ray.pipelines.relational import local_supplier_revenue
    sf = "/root/testdata/sf0.001"
    got = local_supplier_revenue(sf).to_pandas()
    con = duckdb.connect()
    want = con.execute(f"""
        SELECT n_name,
               sum(CAST(floor(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(floor(l_discount*100) AS BIGINT)))::BIGINT
                   AS revenue_units
        FROM '{sf}/customer.parquet' c, '{sf}/orders.parquet' o,
             '{sf}/lineitem.parquet' l, '{sf}/supplier.parquet' s,
             '{sf}/nation.parquet' n
        WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
          AND l.l_suppkey = s.s_suppkey
          AND c.c_nationkey = s.s_nationkey
          AND s.s_nationkey = n.n_nationkey
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '2000-01-01'
        GROUP BY n_name ORDER BY revenue_units DESC, n_name""").df()
    assert got["n_name"].tolist() == want["n_name"].tolist()
    assert got["revenue_units"].tolist() == want["revenue_units"].tolist()


# ------------------------------------------------------------- sampling

def test_weighted_sample_threshold(ray_session):
    from orchid_fst_ray.functions.hashing import poly_hash64
    from orchid_fst_ray.pipelines.sampling import weighted_sample
    ids = np.arange(1000)
    # weight 0 -> never kept; weight >= full -> always kept
    ds = _ds({"doc_id": pa.array(ids, pa.int64()),
              "n_chars": pa.array(
                  np.where(ids % 2 == 0, 0, 5000), pa.int64())})
    got = weighted_sample(ds, full_weight=1000).to_pandas()
    assert (got["doc_id"] % 2 == 1).all() and len(got) == 500
    # mid weight: exact hash-threshold replay
    ds2 = _ds({"doc_id": pa.array(ids, pa.int64()),
               "n_chars": pa.array([250] * 1000, pa.int64())})
    got2 = weighted_sample(ds2, full_weight=1000).to_pandas()
    h = poly_hash64([str(i) for i in ids])
    want = ids[(h % np.uint64(10000)) < np.uint64(2500)]
    assert got2["doc_id"].tolist() == sorted(want.tolist())
