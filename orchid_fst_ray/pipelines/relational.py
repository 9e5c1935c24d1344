"""Relational helpers: the map-side BROADCAST JOIN pattern.

The engine's rule for joins whose small side fits comfortably in the
object store (dimension tables, lookup maps): ship the small side ONCE
via ``ray.put`` and join inside ``map_batches`` with Arrow's C++ hash
join — zero shuffle of the big side, versus an all-to-all exchange for
a distributed hash join. This is the 100 TB fact-table⋈dimension shape
(TPC-H customer⋈nation⋈region here).
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["broadcast_join", "merge_join", "customers_per_region"]


def broadcast_join(big_ds, small_table: pa.Table, keys,
                   join_type: str = "inner",
                   concurrency=(1, 8)):
    """``big_ds ⋈ small_table`` on ``keys`` — small side broadcast via
    ``ray.put`` once, per-batch Arrow hash join (C++), no shuffle.

    The small side is rebuilt into each actor's heap in ``__init__``
    (once per actor, not per batch)."""
    import ray
    keys = [keys] if isinstance(keys, str) else list(keys)
    ref = ray.put(small_table)

    class Join:
        def __init__(self, ref):
            import ray as _ray
            self.small = _ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.join(self.small.slice(0, 0), keys=keys,
                              join_type=join_type)
            return t.join(self.small, keys=keys, join_type=join_type)

    return big_ds.map_batches(Join, fn_constructor_args=(ref,),
                              batch_format="pyarrow",
                              concurrency=concurrency, num_cpus=1)


def customers_per_region(sf_dir: str):
    """customer ⋈ nation ⋈ region (both dimension sides broadcast) →
    (r_name, n_customers, total_acctbal): the fact⋈dim⋈dim rollup.
    Reads only the join/aggregate columns."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    # dimension sides are tiny: pre-join them on the driver (one Arrow
    # hash join over ≤ a few hundred rows), then broadcast the result
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"])
    dim = nation.join(region, keys="n_regionkey",
                      right_keys="r_regionkey", join_type="inner")
    dim = dim.select(["n_nationkey", "r_name"])

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_nationkey", "c_acctbal"])
    # money as integer cents: the distributed sum is then EXACT and
    # independent of partial-sum order (a float sum would be hash-flaky)
    joined = broadcast_join(
        cust.map_batches(lambda t: pa.table({
            "n_nationkey": t["c_nationkey"].cast(pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(
                pc.cast(t["c_acctbal"], pa.float64()), 100.0),
                round_mode="half_towards_infinity"),  # == DuckDB round()
                pa.int64()),
        }), batch_format="pyarrow"),
        pa.table({"n_nationkey": dim["n_nationkey"].cast(pa.int64()),
                  "r_name": dim["r_name"].cast(pa.string())}),
        keys="n_nationkey")

    agg = (joined.groupby("r_name")
           .aggregate(Count(alias_name="n_customers"),
                      Sum("cents", alias_name="total_acctbal_cents")))
    return agg.map_batches(lambda t: pa.table({
        "r_name": t["r_name"].cast(pa.string()),
        "n_customers": t["n_customers"].cast(pa.int64()),
        "total_acctbal_cents": t["total_acctbal_cents"].cast(pa.int64()),
    }), batch_format="pyarrow").sort("r_name")


def merge_join(left_ds, right_ds, on, join_type: str = "inner"):
    """Distributed equi-join for TWO LARGE sides (when neither fits a
    :func:`broadcast_join`): tag each side, null-pad to one unified
    schema, union, co-locating ``sort`` on the key, then one in-block
    Arrow hash join per sorted block.

    Correctness rests on the engine's verified sort invariant: Ray's
    range-partitioned sort never splits rows of one key value across
    blocks, so after the union-sort every key's left AND right rows
    co-reside in one block and the block-local join is complete — for
    inner and all outer types (a key's non-matching side is absent
    from every OTHER block too). ONE all-to-all exchange total,
    versus two for a classic partitioned hash join.

    Requirements: the key column(s) share names and types on both
    sides (rename upstream via ``Dataset.rename_columns``); non-key
    column names must be disjoint."""
    import numpy as np
    import pyarrow.compute as pc

    on = [on] if isinstance(on, str) else list(on)
    ls, rs = left_ds.schema(), right_ds.schema()
    ltypes = dict(zip(ls.names, ls.types))
    rtypes = dict(zip(rs.names, rs.types))
    for k in on:
        if k not in ltypes or k not in rtypes:
            raise ValueError(f"join key {k!r} missing on one side")
        if ltypes[k] != rtypes[k]:
            raise ValueError(f"join key {k!r} type mismatch: "
                             f"{ltypes[k]} vs {rtypes[k]}")
    lcols = [c for c in ls.names if c not in on]
    rcols = [c for c in rs.names if c not in on]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"non-key columns collide: {sorted(overlap)} "
                         "(rename upstream)")
    types = {**ltypes, **rtypes}
    ordered = on + lcols + rcols

    def pad(side: int):
        own = set(on + (lcols if side == 0 else rcols))

        def fn(t: pa.Table) -> pa.Table:
            cols = {c: (t[c] if c in own
                        else pa.nulls(t.num_rows, types[c]))
                    for c in ordered}
            cols["__side"] = pa.array(
                np.full(t.num_rows, side, np.int8))
            return pa.table(cols)

        return fn

    u = (left_ds.map_batches(pad(0), batch_format="pyarrow")
         .union(right_ds.map_batches(pad(1), batch_format="pyarrow"))
         .sort(on))

    def merge(t: pa.Table) -> pa.Table:
        is_left = pc.equal(t["__side"], 0)
        lt = t.filter(is_left).select(on + lcols)
        rt = t.filter(pc.invert(is_left)).select(on + rcols)
        return lt.join(rt, keys=on, join_type=join_type)

    return u.map_batches(merge, batch_size=None,
                         batch_format="pyarrow")
