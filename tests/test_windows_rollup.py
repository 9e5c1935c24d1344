"""running_totals (per-group prefix scan) and rollup_aggregate
(grouping sets) vs brute-force replays."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ds(t, parts=4):
    import ray.data as rd
    return rd.from_arrow(t).repartition(parts)


def test_running_totals_matches_brute_with_negatives(ray_session):
    from orchid_fst_ray.pipelines.events import running_totals
    rng = np.random.default_rng(9)
    n = 300
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 12, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 10**9, n),
                       pa.int64()).cast(pa.timestamp("us")),
        "value": pa.array(rng.normal(0, 5, n))})   # negatives matter
    got = running_totals(_ds(t, 5)).to_pandas()
    # brute
    units = np.floor(np.asarray(t["value"]) * 100).astype(np.int64)
    rows = sorted(zip(t["user_id"].to_pylist(),
                      t["ts"].cast(pa.int64()).to_pylist(),
                      t["event_id"].to_pylist(),
                      units.tolist()))
    want = {}
    cur_u, cnt, s = None, 0, 0
    for u, ts, e, v in rows:
        if u != cur_u:
            cur_u, cnt, s = u, 0, 0
        cnt += 1
        s += v
        want[e] = (u, cnt, s)
    got_map = {r.event_id: (r.user_id, r.run_cnt, r.run_units)
               for r in got.itertuples()}
    assert got_map == want
    assert list(got.event_id) == sorted(want)     # sorted contract


def test_rollup_aggregate_matches_brute(ray_session):
    from orchid_fst_ray.pipelines.relational import rollup_aggregate
    rng = np.random.default_rng(2)
    n = 400
    a = np.array(["x", "y", "z"])[rng.integers(0, 3, n)]
    b = np.array(["p", "q"])[rng.integers(0, 2, n)]
    u = rng.integers(-10, 50, n).astype(np.int64)
    t = pa.table({"ka": pa.array(a), "kb": pa.array(b),
                  "units": pa.array(u)})
    got = rollup_aggregate(_ds(t, 4), keys=["ka", "kb"],
                           units_col="units").to_pandas()
    want = {}
    for ai, bi, ui in zip(a, b, u):
        for key in [(ai, bi), (ai, "ALL"), ("ALL", "ALL")]:
            c, s = want.get(key, (0, 0))
            want[key] = (c + 1, s + int(ui))
    got_map = {(r.ka, r.kb): (r.n_rows, r.sum_units)
               for r in got.itertuples()}
    assert got_map == want
    assert len(got) == len(want)                  # no dup level rows
