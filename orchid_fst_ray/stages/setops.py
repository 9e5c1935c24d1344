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
        keys = t["key"].to_pylist()
        sides = np.asarray(t["_side"].to_pylist(), dtype=np.int8)
        vals = t["value"].to_pylist()
        out_k, out_v = [], []
        n = len(keys)
        s = 0
        while s < n:
            e = s
            while e < n and keys[e] == keys[s]:
                e += 1
            seg = sides[s:e]
            has_l = bool((seg == 0).any())
            has_r = bool((seg == 1).any())
            keep = ((mode == "union" and (has_l or has_r))
                    or (mode == "intersect" and has_l and has_r)
                    or (mode == "difference" and has_l and not has_r))
            if keep:
                out_k.append(keys[s])
                # value: right side wins on union (reference's
                # duplicate-insert last-wins, fst.cpp:180-189);
                # intersect/difference keep the left value
                pick_side = 1 if (mode == "union" and has_r) else 0
                idx = s + int(np.nonzero(seg == pick_side)[0][-1])
                out_v.append(vals[idx])
            s = e
        cols = {"key": pa.array(out_k, pa.large_string())}
        if value_col:
            cols["value"] = pa.array(out_v, pa.int64())
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
