"""Event-stream operators over the ``events`` table.

The reference has no windows/streaming (SURVEY.md §2.5); tumbling
windows are the dataset-level analogue this engine adds for
training-data telemetry: vectorized timestamp truncation inside
``map_batches`` (pre-aggregation happens per block inside Ray's
aggregate) followed by one groupby shuffle on (window, type).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["running_totals", "tumbling_window_stats", "sessionize",
           "asof_join_prior", "range_join_window", "top_k_per_user",
           "lag_lead_gaps", "funnel_depths", "value_ntile",
           "retention_cohorts"]


def _i64(col, dtype="int64"):
    """Zero-copy-where-possible int pull: combine chunks then
    ``to_numpy`` (the ``to_pylist`` → ``np.asarray`` round-trip boxes
    every value through Python objects)."""
    import numpy as np
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.to_numpy(zero_copy_only=False).astype(dtype, copy=False)


def top_k_per_user(events_ds, k: int = 3, user_col: str = "user_id",
                   val_col: str = "value", id_col: str = "event_id"):
    """→ (user_id, event_id, value, rank): each user's top-``k`` events
    by ``value`` desc (ties → lower event_id), rank 1-based.

    Groupwise top-k without ``map_groups``: ONE sort on the group key
    alone (sorting on a composite (user, value) key could split a
    user's run across range-partition bounds), then each block ranks
    ALL its users in one vectorized lexsort pass."""
    import numpy as np

    def topk(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            # typed empty derived from the INPUT schema — hardcoded
            # dtypes would clash with non-empty blocks on other types
            return t.slice(0, 0).append_column(
                "rank", pa.array([], pa.int64()))
        u = t[user_col].combine_chunks().to_numpy(zero_copy_only=False)
        v = t[val_col].combine_chunks().to_numpy(zero_copy_only=False)
        e = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((e, -v, u))   # primary u, then value desc, id
        u_s = u[order]
        starts = np.concatenate(([0], np.flatnonzero(
            u_s[1:] != u_s[:-1]) + 1))
        counts = np.diff(np.concatenate((starts, [n])))
        rank = np.arange(n) - np.repeat(starts, counts)
        keep = rank < k
        out = t.take(pa.array(order[keep]))
        return out.append_column(
            "rank", pa.array(rank[keep] + 1, pa.int64()))

    return (events_ds.select_columns([user_col, id_col, val_col])
            .sort(user_col)
            .map_batches(topk, batch_size=None, batch_format="pyarrow"))


def tumbling_window_stats(events_ds, ts_col: str = "ts",
                          type_col: str = "event_type",
                          value_col: str = "value",
                          unit: str = "minute"):
    """→ (window_start, event_type, n_events, min_value, max_value)
    per tumbling window. Min/Max (not Sum) keep float results exactly
    order-independent for oracle comparison."""
    from ray.data.aggregate import Count, Max, Min

    def add_window(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": pc.floor_temporal(t[ts_col], unit=unit),
            type_col: t[type_col],
            value_col: t[value_col],
        })

    return (events_ds.select_columns([ts_col, type_col, value_col])
            .map_batches(add_window, batch_format="pyarrow")
            .groupby(["window_start", type_col])
            .aggregate(Count(alias_name="n_events"),
                       Min(value_col, alias_name="min_value"),
                       Max(value_col, alias_name="max_value")))


def sessionize(events_ds, user_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: int = 30):
    """→ (user_id, session_id, n_events, session_start, session_end):
    classic gap-based sessionization. One range-partition sort on the
    user key co-locates each user's events (a composite (user, ts)
    sort key would let a range boundary split one user across blocks);
    each block then orders by ts and cuts sessions vectorized."""
    import numpy as np

    gap_us = np.int64(gap_minutes * 60 * 1_000_000)

    def cut(t: pa.Table) -> pa.Table:
        users = _i64(t[user_col])
        tsv = _i64(t[ts_col].cast(pa.int64()))
        n = len(users)
        if n == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "session_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "session_start": pa.array([], pa.timestamp("us")),
                "session_end": pa.array([], pa.timestamp("us")),
            })
        order = np.lexsort((tsv, users))
        users, tsv = users[order], tsv[order]
        ts_sorted = t[ts_col].cast(pa.timestamp("us")).take(
            pa.array(order))
        new_user = np.concatenate(([True], users[1:] != users[:-1]))
        big_gap = np.concatenate(([True], (tsv[1:] - tsv[:-1]) > gap_us))
        cutpoints = np.flatnonzero(new_user | big_gap)
        ends = np.concatenate((cutpoints[1:], [n]))
        # session ordinal within user = position among the user's
        # cutpoints (cutpoints are user-sorted): arange minus the index
        # of the user's first cutpoint
        cu = users[cutpoints]
        firsts = np.flatnonzero(np.concatenate(
            ([True], cu[1:] != cu[:-1])))
        per_user = np.diff(np.append(firsts, len(cu)))
        sess_id = np.arange(len(cu)) - np.repeat(firsts, per_user)
        return pa.table({
            "user_id": pa.array(cu, pa.int64()),
            "session_id": pa.array(sess_id, pa.int64()),
            "n_events": pa.array(ends - cutpoints, pa.int64()),
            "session_start": ts_sorted.take(pa.array(cutpoints)),
            "session_end": ts_sorted.take(pa.array(ends - 1)),
        })

    return (events_ds.select_columns([user_col, ts_col])
            .sort(user_col)
            .map_batches(cut, batch_size=None, batch_format="pyarrow"))


def asof_join_prior(events_ds, left_type: str, right_type: str,
                    user_col: str = "user_id", ts_col: str = "ts",
                    id_col: str = "event_id"):
    """AS-OF join: for each ``left_type`` event, the LATEST strictly
    prior ``right_type`` event of the same user → (event_id, prior_id).
    Left events with no prior right event are dropped (inner asof).

    Ray Data has no asof join; this is the custom-operator composition
    the engine uses: tag both sides, ONE range-partition sort on the
    user key (equal keys co-locate; ts ordered within the block
    locally), then a linear merge per user run — no hash-join actors,
    no per-group tasks.
    """
    import numpy as np
    import pyarrow.compute as pc

    def tag(ds, kind: int):
        def fn(t: pa.Table) -> pa.Table:
            mask = pc.equal(t["event_type"],
                            left_type if kind == 0 else right_type)
            t = t.filter(mask)
            return pa.table({
                user_col: t[user_col].cast(pa.int64()),
                "_tsv": t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
                id_col: t[id_col].cast(pa.int64()),
                "_kind": pa.array([kind] * t.num_rows, pa.int8()),
            })
        return ds.map_batches(fn, batch_format="pyarrow")

    both = tag(events_ds, 0).union(tag(events_ds, 1))

    def merge(t: pa.Table) -> pa.Table:
        users = _i64(t[user_col])
        tsv = _i64(t["_tsv"])
        ids = _i64(t[id_col])
        kind = _i64(t["_kind"], dtype="int8")
        # order by (user, ts, kind) — kind ascending puts LEFT before
        # RIGHT on ts ties, so an equal-ts right is never visible to a
        # left (prior = strictly earlier, like DuckDB's ASOF l.ts>r.ts)
        n = len(users)
        if n == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "prior_id": pa.array([], pa.int64())})
        order = np.lexsort((kind, tsv, users))
        users, tsv, ids, kind = (users[order], tsv[order],
                                 ids[order], kind[order])
        # vectorized last-prior-right: rights seen strictly before each
        # row (the kind tie-break already excludes equal-ts rights),
        # windowed to the row's own user run
        right_mask = kind == 1
        rights_before = np.cumsum(right_mask) - right_mask
        new_user = np.concatenate(([True], users[1:] != users[:-1]))
        starts = np.flatnonzero(new_user)
        counts = np.diff(np.append(starts, n))
        run_start = np.repeat(starts, counts)
        lefts = np.flatnonzero(~right_mask)
        k = rights_before[lefts]
        valid = k > rights_before[run_start[lefts]]
        right_rows = np.flatnonzero(right_mask)
        lr = right_rows[k[valid] - 1]
        sel_l = lefts[valid]
        strict = tsv[lr] < tsv[sel_l]
        return pa.table({
            "event_id": pa.array(ids[sel_l[strict]], pa.int64()),
            "prior_id": pa.array(ids[lr[strict]], pa.int64()),
        })

    return both.sort(user_col).map_batches(
        merge, batch_size=None, batch_format="pyarrow")


def range_join_window(events_ds, left_type: str, right_type: str,
                      window_minutes: int = 30,
                      user_col: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id"):
    """RANGE join: every (left, right) pair of the same user with
    ``l.ts - window <= r.ts < l.ts`` → (event_id, match_id). The
    second prompt-listed operator Ray Data lacks; same composition as
    :func:`asof_join_prior` — tag, one sort on the user key, per-run
    two-pointer sweep (each right enters/leaves the window once:
    O(n + output))."""
    import numpy as np
    import pyarrow.compute as pc

    win_us = np.int64(window_minutes * 60 * 1_000_000)

    def tag(ds, kind: int):
        def fn(t: pa.Table) -> pa.Table:
            mask = pc.equal(t["event_type"],
                            left_type if kind == 0 else right_type)
            t = t.filter(mask)
            return pa.table({
                user_col: t[user_col].cast(pa.int64()),
                "_tsv": t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
                id_col: t[id_col].cast(pa.int64()),
                "_kind": pa.array([kind] * t.num_rows, pa.int8()),
            })
        return ds.map_batches(fn, batch_format="pyarrow")

    both = tag(events_ds, 0).union(tag(events_ds, 1))

    def merge(t: pa.Table) -> pa.Table:
        users = _i64(t[user_col])
        tsv = _i64(t["_tsv"])
        ids = _i64(t[id_col])
        kind = _i64(t["_kind"], dtype="int8")
        n = len(users)
        if n == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "match_id": pa.array([], pa.int64())})
        order = np.lexsort((kind, tsv, users))
        users, tsv, ids, kind = (users[order], tsv[order],
                                 ids[order], kind[order])
        # vectorized window join: for each left, its window of rights
        # is a contiguous slice [lo, hi) of the user's rights-only run.
        # hi = rights strictly before the left in (user, ts, kind)
        # order (kind tie-break excludes equal-ts rights: r.ts < l.ts);
        # lo comes from a second lexsort over rights + per-left window
        # starts (query ts = l.ts - win, queries first on ties so a
        # right AT the window start stays included).
        right_mask = kind == 1
        rights_before = np.cumsum(right_mask) - right_mask
        new_user = np.concatenate(([True], users[1:] != users[:-1]))
        starts = np.flatnonzero(new_user)
        counts = np.diff(np.append(starts, n))
        run_start = np.repeat(starts, counts)
        lefts = np.flatnonzero(~right_mask)
        base = rights_before[run_start[lefts]]   # user's first right
        hi = rights_before[lefts]                # exclusive upper bound
        right_rows = np.flatnonzero(right_mask)
        r_users = users[right_rows]
        r_ts = tsv[right_rows]
        q_ts = tsv[lefts] - win_us
        m_r, m_q = len(right_rows), len(lefts)
        comb_users = np.concatenate((r_users, users[lefts]))
        comb_ts = np.concatenate((r_ts, q_ts))
        comb_tag = np.concatenate((np.ones(m_r, np.int8),
                                   np.zeros(m_q, np.int8)))
        ord2 = np.lexsort((comb_tag, comb_ts, comb_users))
        pos2 = np.empty(m_r + m_q, dtype=np.int64)
        pos2[ord2] = np.arange(m_r + m_q)
        tag_sorted = comb_tag[ord2]
        rb2 = np.cumsum(tag_sorted == 1) - (tag_sorted == 1)
        lo = rb2[pos2[m_r:]]                     # rights with ts < q_ts
        # (global rights counts: base/hi/lo all count the same global
        # rights-only sequence, so per-user offsets cancel)
        lo = np.maximum(lo, base)
        cnt = np.maximum(hi - lo, 0)
        total = int(cnt.sum())
        if total == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "match_id": pa.array([], pa.int64())})
        sel = cnt > 0
        rep_left = np.repeat(lefts[sel], cnt[sel])
        offsets = np.concatenate(([0], np.cumsum(cnt[sel])[:-1]))
        within = np.arange(total) - np.repeat(offsets, cnt[sel])
        r_idx = np.repeat(lo[sel], cnt[sel]) + within
        return pa.table({
            "event_id": pa.array(ids[rep_left], pa.int64()),
            "match_id": pa.array(ids[right_rows[r_idx]], pa.int64()),
        })

    return both.sort(user_col).map_batches(
        merge, batch_size=None, batch_format="pyarrow")


def running_totals(events_ds, user_col: str = "user_id",
                   ts_col: str = "ts", id_col: str = "event_id",
                   value_col: str = "value"):
    """→ (event_id, user_id, run_cnt, run_units): per-user RUNNING
    count and running integer value sum (``floor(value·100)`` units,
    so the cumulative sums are exact integers the SQL window replay
    hash-matches), ordered by (ts, event_id) within each user.

    The per-group-prefix-scan shape: one range-partition sort on the
    USER KEY ALONE (a composite (user, ts) key could split one user
    across blocks; the single-key sort invariant keeps each user
    whole), then each block lexsorts its users' events and computes
    all cumulative sums in two vectorized passes (global cumsum minus
    the per-segment offset)."""
    import numpy as np

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "run_cnt": pa.array([], pa.int64()),
                "run_units": pa.array([], pa.int64())})
        users = _i64(t[user_col])
        tsv = _i64(t[ts_col].cast(pa.int64()))
        ids = _i64(t[id_col])
        units = np.floor(t[value_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64) * 100
        ).astype(np.int64)
        order = np.lexsort((ids, tsv, users))
        users, ids, units = users[order], ids[order], units[order]
        n = len(users)
        seg = np.concatenate(
            ([0], np.flatnonzero(users[1:] != users[:-1]) + 1))
        lens = np.diff(np.concatenate((seg, [n])))
        # running count: global index minus segment start
        run_cnt = (np.arange(n, dtype=np.int64)
                   - np.repeat(seg, lens) + 1)
        # running sum: global cumsum minus cumsum-before-segment
        # (repeat, not accumulate-max: negative values make the
        # per-segment bases non-monotonic)
        cs = np.cumsum(units)
        run_units = cs - np.repeat(cs[seg] - units[seg], lens)
        return pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "run_cnt": pa.array(run_cnt, pa.int64()),
            "run_units": pa.array(run_units, pa.int64())})

    return (events_ds.select_columns([id_col, user_col, ts_col,
                                      value_col])
            .sort(user_col)
            .map_batches(scan, batch_size=None, batch_format="pyarrow")
            .sort(id_col))


def lag_lead_gaps(events_ds, user_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id"):
    """→ (event_id, user_id, row_num, prev_gap_us, next_gap_us): the
    LAG/LEAD/ROW_NUMBER window pack over ``PARTITION BY user ORDER BY
    (ts, event_id)``. Gaps are exact int64 microseconds to the
    previous/next event of the SAME user; boundary rows (a user's
    first/last event) carry the ``-1`` sentinel instead of NULL so the
    whole result stays integer-exact for the oracle hash.

    Same per-group shape as :func:`running_totals`: one range sort on
    the user key ALONE (keeps each user whole in one block), then a
    vectorized per-block lexsort + shifted-difference scan — no
    per-row Python, no second shuffle beyond the final presentation
    sort on event_id."""
    import numpy as np

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "row_num": pa.array([], pa.int64()),
                "prev_gap_us": pa.array([], pa.int64()),
                "next_gap_us": pa.array([], pa.int64())})
        users = _i64(t[user_col])
        tsv = _i64(t[ts_col].cast(pa.int64()))
        ids = _i64(t[id_col])
        order = np.lexsort((ids, tsv, users))
        users, tsv, ids = users[order], tsv[order], ids[order]
        n = len(users)
        seg = np.concatenate(
            ([0], np.flatnonzero(users[1:] != users[:-1]) + 1))
        lens = np.diff(np.concatenate((seg, [n])))
        row_num = (np.arange(n, dtype=np.int64)
                   - np.repeat(seg, lens) + 1)
        prev_gap = np.empty(n, np.int64)
        prev_gap[1:] = tsv[1:] - tsv[:-1]
        prev_gap[seg] = -1                       # user's first event
        next_gap = np.empty(n, np.int64)
        next_gap[:-1] = tsv[1:] - tsv[:-1]
        next_gap[seg + lens - 1] = -1            # user's last event
        return pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "row_num": pa.array(row_num, pa.int64()),
            "prev_gap_us": pa.array(prev_gap, pa.int64()),
            "next_gap_us": pa.array(next_gap, pa.int64())})

    return (events_ds.select_columns([id_col, user_col, ts_col])
            .sort(user_col)
            .map_batches(scan, batch_size=None, batch_format="pyarrow")
            .sort(id_col))


def funnel_depths(events_ds, steps=("view", "click", "purchase"),
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type"):
    """Ordered-funnel analysis → one row per step:
    ``(step:int64 1-based, step_type, n_users)`` where ``n_users``
    counts users who reached that step: a user reaches step ``i`` if
    an event of type ``steps[i]`` exists STRICTLY AFTER the earliest
    qualifying step-``i-1`` event (the classic min-timestamp funnel;
    equal timestamps do NOT advance the funnel, matching the SQL
    ``ts > prev`` replay).

    100 TB shape: rows are filtered to the step types at the read,
    one range sort on the user key co-locates each user, and every
    block resolves ALL its users' funnels in ``len(steps)`` vectorized
    masked segment-min passes (``np.minimum.reduceat``). The block
    emits only ``len(steps)`` partial counts, so the final aggregate
    is a constant-size groupby — no per-user rows ever shuffle."""
    import numpy as np

    steps = list(steps)
    k = len(steps)
    SENT = np.iinfo(np.int64).max                # "not reached"

    def keep(t: pa.Table) -> pa.Table:
        # index_in does filter + encode in one vectorized pass:
        # non-step types map to null, dropped by the filter
        codes = pc.index_in(t[type_col], value_set=pa.array(steps))
        t = t.append_column("step_code", codes.cast(pa.int8()))
        t = t.filter(pc.is_valid(t["step_code"]))
        return pa.table({user_col: t[user_col],
                         "ts_us": t[ts_col].cast(pa.int64()),
                         "step_code": t["step_code"]})

    def count_depths(t: pa.Table) -> pa.Table:
        out_step = pa.array(np.arange(1, k + 1), pa.int64())
        out_type = pa.array(steps, pa.string())
        if t.num_rows == 0:
            return pa.table({"step": out_step, "step_type": out_type,
                             "n_users": pa.array([0] * k, pa.int64())})
        users = _i64(t[user_col])
        tsv = _i64(t["ts_us"])
        codes = _i64(t["step_code"])
        order = np.lexsort((tsv, users))
        users, tsv, codes = users[order], tsv[order], codes[order]
        n = len(users)
        seg = np.concatenate(
            ([0], np.flatnonzero(users[1:] != users[:-1]) + 1))
        lens = np.diff(np.concatenate((seg, [n])))
        reached = np.full(len(seg), np.iinfo(np.int64).min, np.int64)
        counts = np.zeros(k, np.int64)
        for i in range(k):
            # earliest step-i event strictly after the user's step-i-1
            # time; masked rows poisoned to SENT so reduceat's min
            # ignores them (a user with no qualifying row stays SENT)
            cand = np.where(
                (codes == i) & (tsv > np.repeat(reached, lens)),
                tsv, SENT)
            reached = np.minimum.reduceat(cand, seg)
            counts[i] = int((reached != SENT).sum())
        return pa.table({"step": out_step, "step_type": out_type,
                         "n_users": pa.array(counts, pa.int64())})

    from ray.data.aggregate import Sum
    return (events_ds.select_columns([user_col, ts_col, type_col])
            .map_batches(keep, batch_format="pyarrow")
            .sort(user_col)
            .map_batches(count_depths, batch_size=None,
                         batch_format="pyarrow")
            .groupby(["step", "step_type"])
            .aggregate(Sum("n_users", alias_name="n_users"))
            .map_batches(lambda t: pa.table({
                "step": t["step"].cast(pa.int64()),
                "step_type": t["step_type"].cast(pa.string()),
                "n_users": t["n_users"].cast(pa.int64())}),
                batch_format="pyarrow")
            .sort("step"))


def value_ntile(events_ds, n_tiles: int = 4,
                group_col: str = "event_type", val_col: str = "value",
                id_col: str = "event_id"):
    """NTILE(``n_tiles``) per group → ``(event_id, event_type,
    value_units:int64, tile:int64)``: each event's quantile bucket of
    ``value`` within its event type, with the SQL-standard uneven
    split (the first ``n % n_tiles`` buckets get one extra row),
    ordered by ``(value, event_id)``. ``value_units`` is
    ``floor(value·100)`` so the output is integer-exact; the ORDER BY
    runs on the raw doubles, identical IEEE comparisons both sides.

    Same shape as :func:`running_totals`: one range sort on the GROUP
    key alone, then a block-local lexsort + closed-form bucket
    assignment (no per-row Python)."""
    import numpy as np

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                group_col: pa.array([], pa.string()),
                "value_units": pa.array([], pa.int64()),
                "tile": pa.array([], pa.int64())})
        g = t[group_col].combine_chunks()
        codes = g.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        vals = t[val_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        ids = _i64(t[id_col])
        order = np.lexsort((ids, vals, codes))
        codes_s, ids_s = codes[order], ids[order]
        n = len(codes_s)
        seg = np.concatenate(
            ([0], np.flatnonzero(codes_s[1:] != codes_s[:-1]) + 1))
        lens = np.diff(np.concatenate((seg, [n])))
        r = np.arange(n, dtype=np.int64) - np.repeat(seg, lens)
        m = np.repeat(lens, lens)               # group size per row
        big = m % n_tiles                       # buckets with +1 row
        size_small = m // n_tiles
        size_big = size_small + 1
        cut = big * size_big                    # rows in big buckets
        tile = np.where(
            r < cut, r // np.maximum(size_big, 1),
            big + (r - cut) // np.maximum(size_small, 1)) + 1
        units = np.floor(vals[order] * 100).astype(np.int64)
        return pa.table({
            "event_id": pa.array(ids_s, pa.int64()),
            group_col: g.take(pa.array(order)),
            "value_units": pa.array(units, pa.int64()),
            "tile": pa.array(tile, pa.int64())})

    return (events_ds.select_columns([id_col, group_col, val_col])
            .sort(group_col)
            .map_batches(assign, batch_size=None,
                         batch_format="pyarrow")
            .sort(id_col))


def retention_cohorts(events_ds, user_col: str = "user_id",
                      ts_col: str = "ts"):
    """Weekly cohort retention → ``(cohort_week:timestamp,
    week_offset:int64, n_users:int64)``: users whose FIRST event falls
    in ``cohort_week`` (ISO-Monday truncation) counted as active
    ``week_offset`` weeks later — the classic product-analytics
    retention triangle, over the engine's per-group sort invariant.

    One user-key sort; each block derives its users' first-event
    weeks and DISTINCT (cohort, offset, user) triples vectorized,
    then ships only distinct triples into one bounded groupby
    (cohorts × offsets × active users — the output cardinality)."""
    import numpy as np

    WEEK_US = np.int64(7 * 86400) * np.int64(1_000_000)

    def triples(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "cohort_week": pa.array([], pa.timestamp("us")),
                "week_offset": pa.array([], pa.int64()),
                user_col: pa.array([], pa.int64())})
        users = _i64(t[user_col])
        wk = _i64(pc.floor_temporal(
            t[ts_col].cast(pa.timestamp("us")), unit="week")
            .cast(pa.int64()))
        order = np.lexsort((wk, users))
        users, wk = users[order], wk[order]
        n = len(users)
        seg = np.concatenate(
            ([0], np.flatnonzero(users[1:] != users[:-1]) + 1))
        lens = np.diff(np.concatenate((seg, [n])))
        cohort = np.repeat(wk[seg], lens)       # first week per user
        off = (wk - cohort) // WEEK_US
        key_new = np.concatenate(
            ([True], (users[1:] != users[:-1]) | (wk[1:] != wk[:-1])))
        idx = np.flatnonzero(key_new)           # distinct (user, week)
        return pa.table({
            "cohort_week": pa.array(cohort[idx]).cast(
                pa.timestamp("us")),
            "week_offset": pa.array(off[idx], pa.int64()),
            user_col: pa.array(users[idx], pa.int64())})

    from ray.data.aggregate import Count
    return (events_ds.select_columns([user_col, ts_col])
            .sort(user_col)
            .map_batches(triples, batch_size=None,
                         batch_format="pyarrow")
            .groupby(["cohort_week", "week_offset"])
            .aggregate(Count(alias_name="n_users"))
            .map_batches(lambda t: pa.table({
                "cohort_week": t["cohort_week"].cast(pa.timestamp("us")),
                "week_offset": t["week_offset"].cast(pa.int64()),
                "n_users": t["n_users"].cast(pa.int64())}),
                batch_format="pyarrow")
            .sort(["cohort_week", "week_offset"]))
