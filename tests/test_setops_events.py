"""Dictionary set operations + event-stream operator tests."""

from __future__ import annotations

import pyarrow as pa
import pytest

from orchid_fst_ray.pipelines.events import sessionize, tumbling_window_stats
from orchid_fst_ray.stages.setops import (
    dict_difference, dict_intersect, dict_union,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sides(ray_session):
    import ray.data as rd
    left = rd.from_arrow(pa.table({
        "key": pa.array(["a", "b", "c", "d"], pa.large_string()),
        "value": pa.array([1, 2, 3, 4], pa.int64())}))
    right = rd.from_arrow(pa.table({
        "key": pa.array(["c", "d", "e"], pa.large_string()),
        "value": pa.array([30, 40, 50], pa.int64())}))
    return left.repartition(3), right.repartition(2)


def _kv(ds):
    df = ds.to_pandas().sort_values("key")
    return list(zip(df["key"], df["value"]))


def test_union_right_wins(sides):
    assert _kv(dict_union(*sides)) == [
        ("a", 1), ("b", 2), ("c", 30), ("d", 40), ("e", 50)]


def test_intersect_left_values(sides):
    assert _kv(dict_intersect(*sides)) == [("c", 3), ("d", 4)]


def test_difference(sides):
    assert _kv(dict_difference(*sides)) == [("a", 1), ("b", 2)]


def test_window_stats_vs_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    ev = rd.read_parquet(f"{SF}/events.parquet")
    got = (tumbling_window_stats(ev).to_pandas()
           .sort_values(["window_start", "event_type"])
           .reset_index(drop=True))
    want = duckdb.sql(f"""
        SELECT date_trunc('minute', ts) AS window_start, event_type,
               count(*) AS n_events, min(value) AS min_value,
               max(value) AS max_value
        FROM '{SF}/events.parquet' GROUP BY 1,2 ORDER BY 1,2""").df()
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert got["min_value"].tolist() == want["min_value"].tolist()
    assert got["max_value"].tolist() == want["max_value"].tolist()


def test_sessionize_vs_bruteforce(ray_session):
    import pyarrow.parquet as pq
    ev = pq.read_table(f"{SF}/events.parquet")
    # brute force: per user sort events, cut on >30min gaps
    rows = sorted(zip(ev["user_id"].to_pylist(), ev["ts"].to_pylist()))
    sessions: dict[tuple, list] = {}
    cur_user, cur_sid, last_ts = None, -1, None
    for u, ts in rows:
        if u != cur_user or (ts - last_ts).total_seconds() > 1800:
            cur_sid = cur_sid + 1 if u == cur_user else 0
            cur_user = u
            sessions[(u, cur_sid)] = []
        sessions[(u, cur_sid)].append(ts)
        last_ts = ts
    import ray.data as rd
    got = sessionize(rd.from_arrow(ev).repartition(4)).to_pandas()
    assert len(got) == len(sessions)
    for _, r in got.iterrows():
        ss = sessions[(r["user_id"], r["session_id"])]
        assert r["n_events"] == len(ss)
        assert r["session_start"] == min(ss)
        assert r["session_end"] == max(ss)


def test_asof_join_vs_bruteforce(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd
    from orchid_fst_ray.pipelines.events import asof_join_prior
    ev = pq.read_table(f"{SF}/events.parquet")
    rows = list(zip(ev["event_id"].to_pylist(), ev["user_id"].to_pylist(),
                    ev["ts"].to_pylist(), ev["event_type"].to_pylist()))
    oracle = {}
    for eid, u, ts, et in rows:
        if et != "purchase":
            continue
        best = None
        for rid, ru, rts, ret in rows:
            if ret == "click" and ru == u and rts < ts:
                if best is None or rts > best[1]:
                    best = (rid, rts)
        if best is not None:
            oracle[eid] = best[0]
    got = asof_join_prior(rd.from_arrow(ev).repartition(4),
                          "purchase", "click").to_pandas()
    got_map = dict(zip(got["event_id"].astype(int),
                       got["prior_id"].astype(int)))
    assert got_map == oracle
