"""Distributed sorts re-expressing the reference's lfsort semantics.

The reference's ``LargeFileSorter`` (large_file_sorter.cpp:44-158:
hash-split → per-file in-memory sort → k-way heap merge) is superseded
wholesale by ``ds.sort`` — Ray Data's sample → range-partition →
per-partition sort. What we preserve is its *semantics*:

- sort on the **trimmed** line but emit the **original** line
  (large_file_sorter.cpp:229-241, the ``std::multimap`` projection);
- optional empty-line drop (``:330-333``, flag-controlled);
- stable per-key multiset order via an explicit id tiebreak (a
  distributed sort has no stable insertion order to lean on).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["sort_by_trimmed"]


def sort_by_trimmed(ds, col: str = "text", id_col: str | None = None,
                    drop_empty: bool = False):
    """Sort by ``trim(col)`` (+ ``id_col`` tiebreak), output original
    columns in that order. One range-partition shuffle; the derived key
    column is dropped after the sort so downstream moves no extra bytes.
    """

    def add_key(t: pa.Table) -> pa.Table:
        key = pc.utf8_trim_whitespace(pc.cast(t[col], pa.large_string()))
        return t.append_column("_sort_key", key)

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    if drop_empty:
        keyed = keyed.map_batches(
            lambda t: t.filter(pc.not_equal(t["_sort_key"], "")),
            batch_format="pyarrow")
    keys = ["_sort_key"] + ([id_col] if id_col else [])
    out = keyed.sort(keys)
    return out.map_batches(lambda t: t.drop_columns(["_sort_key"]),
                           batch_format="pyarrow")
