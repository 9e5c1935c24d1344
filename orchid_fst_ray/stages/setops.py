"""Dataset-level set operations on dictionaries — the reference's
automaton combinators (Union/Intersect/Not, automaton.h:104-304,
SURVEY.md §2.4 Q6) re-expressed over whole key sets:

    Union     = concat + keyed dedup        (last/max value wins)
    Intersect = co-group, present in both   (semi-join semantics)
    Difference= co-group, left only         (anti-join semantics)

All three run as ONE range-partition sort over the tagged union of
both inputs + a vectorized per-block pass — no hash-join actor pools,
and equal keys are co-located by the sort. Values follow the
reference's duplicate-key rule (last wins = the right side on Union).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["dict_union", "dict_intersect", "dict_difference"]


def _tagged(ds, key_col: str, value_col: str | None, side: int):
    def fn(t: pa.Table) -> pa.Table:
        cols = {
            "key": t[key_col].cast(pa.large_string()),
            "_side": pa.array([side] * t.num_rows, pa.int8()),
        }
        cols["value"] = (t[value_col].cast(pa.int64()) if value_col
                         else pa.nulls(t.num_rows, pa.int64()))
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def _combine(left, right, key_col: str, value_col: str | None, mode: str):
    """Inputs should be key-unique per side (pre-aggregate upstream);
    with duplicate keys on one side the surviving value among those
    duplicates is unspecified."""
    both = (_tagged(left, key_col, value_col, 0)
            .union(_tagged(right, key_col, value_col, 1)))

    def block(t: pa.Table) -> pa.Table:
        # vectorized: run boundaries per key, one scatter per side to
        # find each run's left/right row, then a single take — no
        # Python touches a row
        n = t.num_rows
        if n == 0:
            cols = {"key": pa.array([], pa.large_string())}
            if value_col:
                cols["value"] = pa.array([], pa.int64())
            return pa.table(cols)
        from orchid_fst_ray.functions.runs import run_bounds
        bounds = run_bounds(t["key"])
        n_runs = len(bounds) - 1
        run_id = np.repeat(np.arange(n_runs), np.diff(bounds))
        sides = np.asarray(t["_side"].to_pylist(), dtype=np.int8)
        idx = np.arange(n, dtype=np.int64)
        pos_l = np.full(n_runs, -1, dtype=np.int64)
        pos_r = np.full(n_runs, -1, dtype=np.int64)
        lm, rm = sides == 0, sides == 1
        pos_l[run_id[lm]] = idx[lm]   # last write wins == reference's
        pos_r[run_id[rm]] = idx[rm]   # duplicate-insert last-wins rule
        has_l, has_r = pos_l >= 0, pos_r >= 0
        if mode == "union":
            keep = has_l | has_r
            # right value wins on conflict (fst.cpp:180-189)
            chosen = np.where(has_r, pos_r, pos_l)
        elif mode == "intersect":
            keep = has_l & has_r
            chosen = pos_l
        else:  # difference
            keep = has_l & ~has_r
            chosen = pos_l
        sel = t.take(pa.array(chosen[keep]))
        cols = {"key": sel["key"].combine_chunks().cast(
            pa.large_string())}
        if value_col:
            cols["value"] = sel["value"].combine_chunks().cast(
                pa.int64())
        return pa.table(cols)

    # sort on the key ALONE: a composite (key, _side) sort key would
    # let a range boundary split one key's rows across blocks
    return both.sort("key").map_batches(
        block, batch_size=None, batch_format="pyarrow")


def dict_union(left, right, key_col: str = "key",
               value_col: str | None = "value"):
    """Keys in either input; on conflict the RIGHT value wins."""
    return _combine(left, right, key_col, value_col, "union")


def dict_intersect(left, right, key_col: str = "key",
                   value_col: str | None = "value"):
    """Keys present in both inputs; LEFT values."""
    return _combine(left, right, key_col, value_col, "intersect")


def dict_difference(left, right, key_col: str = "key",
                    value_col: str | None = "value"):
    """Keys present in left but not right; LEFT values."""
    return _combine(left, right, key_col, value_col, "difference")
