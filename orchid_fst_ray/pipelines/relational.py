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

__all__ = ["broadcast_join", "merge_join", "bloom_semijoin",
           "cube_aggregate",
           "bloom_antijoin", "rollup_aggregate",
           "customers_per_region", "q3_top_orders",
           "local_supplier_revenue"]


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


def bloom_semijoin(probe_ds, keys_ds, key: str, n_bits: int = 1 << 20,
                   n_hashes: int = 4, keys_unique: bool = True):
    """EXACT distributed semi-join ``probe_ds ⋉ keys_ds`` for a key
    side too large to broadcast as a set: a Bloom filter of the keys
    (fixed ``n_bits`` regardless of key count) is broadcast once and
    prunes the probe stream inside ``map_batches``; the survivors —
    typically a small fraction of the probe side — then take the ONE
    co-locating :func:`merge_join` exchange for exact verification.
    Bloom filters have no false negatives, so the result is exact;
    false positives only cost verify traffic (rate ≈ 0.39**n_hashes
    at the canonical ``n_bits ≈ 1.44 · n_hashes · n_keys`` sizing).

    The 100 TB shape this buys: a naive semi-join shuffles the WHOLE
    probe side; broadcasting the key set needs O(n_keys) memory per
    worker. The bloom is O(n_bits) per worker — chosen, not data-
    dependent — and the shuffle shrinks to the survivor stream.

    Build cost: each key block folds to one ``n_bits``-wide partial
    filter OR-ed on the driver — O(num_blocks · n_bits/8) driver
    bytes, bounded by the fixed filter size, not by key count.

    ``keys_unique=False`` dedups the key side first (an inner join
    against duplicate keys would multiply probe rows)."""
    hits, _misses, keys_only = _bloom_split(
        probe_ds, keys_ds, key, n_bits, n_hashes, keys_unique)
    return merge_join(hits, keys_only, on=key)


def bloom_antijoin(probe_ds, keys_ds, key: str, n_bits: int = 1 << 20,
                   n_hashes: int = 4):
    """EXACT distributed anti-join ``probe_ds ▷ keys_ds`` (rows of the
    probe side whose key does NOT appear in the key side) — the
    complement of :func:`bloom_semijoin`, with the asymmetry flipped
    in its favor: a Bloom MISS is definitive (no false negatives), so
    most probe rows are emitted straight from the streaming prefilter
    with zero shuffle; only the Bloom HITS — true matches plus the
    small false-positive stream — take the one co-locating
    ``left anti`` :func:`merge_join` exchange to decide which hits
    were spurious. Exchange volume ≈ |true matches| + fp·|probe|.

    Unlike the semi-join (one consumer), this needs BOTH the hit and
    miss streams, which are two lineages over ``probe_ds`` — so the
    probe side is materialized ONCE into the object store first;
    each stream then re-runs only the cheap per-row Bloom check over
    the shared blocks, not the upstream read/transform plan."""
    hits, misses, keys_only = _bloom_split(
        probe_ds.materialize(), keys_ds, key, n_bits, n_hashes,
        keys_unique=True)
    rescued = merge_join(hits, keys_only, on=key,
                         join_type="left anti")
    return misses.union(rescued)


def _bloom_split(probe_ds, keys_ds, key: str, n_bits: int,
                 n_hashes: int, keys_unique: bool):
    """Shared Bloom machinery: build the filter over ``keys_ds[key]``
    (per-block partials OR-ed on the driver — O(n_bits) bytes, never
    key-count-dependent), broadcast it once via ``ray.put``, and
    return (hit rows, miss rows, the key-only Dataset for downstream
    verification) — hits/misses are lazy streams sharing the one
    broadcast filter."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    from orchid_fst_ray.functions.hashing import (hash64_pairs,
                                                  poly_hash64)

    if n_bits & (n_bits - 1):
        raise ValueError("n_bits must be a power of two")
    mask = np.uint64(n_bits - 1)
    seeds = np.arange(1, n_hashes + 1).astype(np.uint64) * np.uint64(
        0x9E3779B97F4A7C15)

    def _key_hashes(col) -> np.ndarray:
        arr = col.combine_chunks() if isinstance(
            col, pa.ChunkedArray) else col
        if pa.types.is_integer(arr.type):
            return arr.cast(pa.int64()).to_numpy(
                zero_copy_only=False).astype(np.uint64)
        return poly_hash64(arr)

    words = n_bits // 64

    def build_partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(words, np.uint64)
        if t.num_rows:
            h = _key_hashes(t[key])
            for s in seeds:
                idx = hash64_pairs(h, np.full(len(h), s)) & mask
                np.bitwise_or.at(bits, (idx >> np.uint64(6)).astype(
                    np.int64), np.uint64(1) << (idx & np.uint64(63)))
        return pa.table({"bloom": pa.array([bits.tobytes()],
                                           pa.large_binary())})

    parts = keys_ds.select_columns([key]).map_batches(
        build_partial, batch_format="pyarrow").take_all()
    bloom = np.zeros(words, np.uint64)
    for r in parts:
        bloom |= np.frombuffer(r["bloom"], np.uint64)
    ref = ray.put(bloom)

    class Probe:
        def __init__(self, want_hits: bool) -> None:
            self.bits = ray.get(ref)            # once per actor
            self.want_hits = want_hits

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            h = _key_hashes(t[key])
            hit = np.ones(len(h), bool)
            for s in seeds:
                idx = hash64_pairs(h, np.full(len(h), s)) & mask
                word = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
                hit &= (word >> (idx & np.uint64(63))) & np.uint64(1) > 0
            return t.filter(pa.array(hit if self.want_hits else ~hit))

    hits = probe_ds.map_batches(Probe, fn_constructor_args=(True,),
                                batch_format="pyarrow",
                                concurrency=(1, 8), num_cpus=1)
    misses = probe_ds.map_batches(Probe, fn_constructor_args=(False,),
                                  batch_format="pyarrow",
                                  concurrency=(1, 8), num_cpus=1)

    keys_only = keys_ds.select_columns([key])
    if not keys_unique:
        def first(t: pa.Table) -> pa.Table:
            arr = t[key].combine_chunks()
            return pa.table({key: pc.unique(arr)})
        # block-local unique → one groupby-count collapses the rest;
        # re-pin the key type (Ray's groupby may widen string →
        # large_string, which would trip merge_join's type check)
        from ray.data.aggregate import Count
        ktype = dict(zip(keys_ds.schema().names,
                         keys_ds.schema().types))[key]
        keys_only = (keys_only.map_batches(first, batch_format="pyarrow")
                     .groupby(key).aggregate(Count(alias_name="__n"))
                     .drop_columns(["__n"])
                     .map_batches(
                         lambda t, _ty=ktype: pa.table(
                             {key: t[key].cast(_ty)}),
                         batch_format="pyarrow"))
    return hits, misses, keys_only


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


def rollup_aggregate(ds, keys: list, units_col: str,
                     all_label: str = "ALL"):
    """GROUPING-SETS rollup ``(k1, k2, …) → (k1, …) → () `` in ONE
    pass over the data: the finest level takes the only data-sized
    groupby (per-block Arrow partial counts first — the combiner
    discipline), and every coarser level is derived from the FINEST
    AGGREGATE, which is group-cardinality-sized, not data-sized.
    Rolled-up key columns carry ``all_label``. Output:
    ``(*keys, n_rows:int64, sum_units:int64)``, finest→coarsest,
    each level sorted by its keys."""
    finest = _finest_aggregate(ds, keys, units_col)
    return _grouping_sets(
        finest, keys,
        [tuple(keys[:lvl]) for lvl in range(len(keys) - 1, -1, -1)],
        all_label)


def cube_aggregate(ds, keys: list, units_col: str,
                   all_label: str = "ALL"):
    """GROUP BY CUBE over ``keys`` — every one of the ``2**k``
    grouping sets — with the same one-data-pass discipline as
    :func:`rollup_aggregate`: the finest level takes the only
    data-sized groupby, and each of the ``2**k - 1`` coarser sets is
    derived from the FINEST AGGREGATE (group-cardinality-sized).
    Output schema matches rollup: ``(*keys, n_rows, sum_units)`` with
    rolled-up key columns carrying ``all_label``."""
    if len(keys) > 4:
        raise ValueError("cube over >4 keys explodes to >16 sets; "
                         "pick a rollup or explicit grouping sets")
    finest = _finest_aggregate(ds, keys, units_col)
    # all proper subsets, richest first, key order preserved
    subsets = sorted(
        (tuple(k for i, k in enumerate(keys) if mask & (1 << i))
         for mask in range((1 << len(keys)) - 2, -1, -1)),
        key=len, reverse=True)
    return _grouping_sets(finest, keys, subsets, all_label)


def _finest_aggregate(ds, keys, units_col):
    """(count, sum) per full key tuple — the single data-sized pass
    shared by rollup and cube: per-block Arrow partial aggregates
    (the combiner discipline) ahead of one groupby shuffle over the
    bounded group-key space."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(
            t.select(keys + [units_col]), keys).aggregate(
                [([], "count_all"), (units_col, "sum")])
        cols = {k: agg[k].cast(pa.string()) for k in keys}
        cols["n_rows"] = agg["count_all"].cast(pa.int64())
        cols["sum_units"] = agg[f"{units_col}_sum"].cast(pa.int64())
        return pa.table(cols)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(keys)
            .aggregate(Sum("n_rows", alias_name="n_rows"),
                       Sum("sum_units", alias_name="sum_units"))
            .map_batches(lambda t: pa.table(
                {k: t[k].cast(pa.string()) for k in keys}
                | {"n_rows": t["n_rows"].cast(pa.int64()),
                   "sum_units": t["sum_units"].cast(pa.int64())}),
                batch_format="pyarrow")
            .materialize())           # group-cardinality-sized


def _grouping_sets(finest, keys, subsets, all_label):
    """Union the finest aggregate with one derived level per subset
    (each a groupby over the group-cardinality-sized finest table)."""
    from ray.data.aggregate import Sum

    levels = [finest.sort(keys)]
    src = finest
    for kept in subsets:
        kept = list(kept)

        def relabel(t: pa.Table, _kept=tuple(kept)) -> pa.Table:
            cols = {}
            for k in keys:
                cols[k] = (t[k].cast(pa.string()) if k in _kept
                           else pa.array([all_label] * t.num_rows,
                                         pa.string()))
            cols["n_rows"] = t["n_rows"].cast(pa.int64())
            cols["sum_units"] = t["sum_units"].cast(pa.int64())
            return pa.table(cols)

        lvl_ds = src.map_batches(relabel, batch_format="pyarrow")
        if kept:
            lvl_ds = (lvl_ds.groupby(kept)
                      .aggregate(Sum("n_rows", alias_name="n_rows"),
                                 Sum("sum_units",
                                     alias_name="sum_units"))
                      .map_batches(lambda t, _kept=tuple(kept):
                                   pa.table(
                          {k: (t[k].cast(pa.string()) if k in _kept
                               else pa.array([all_label] * t.num_rows,
                                             pa.string()))
                           for k in keys}
                          | {"n_rows": t["n_rows"].cast(pa.int64()),
                             "sum_units":
                                 t["sum_units"].cast(pa.int64())}),
                          batch_format="pyarrow")
                      .sort(kept))
        else:
            # grand total: fold the (tiny) finest aggregate
            import ray
            tot_n = tot_s = 0
            for part in ray.get(src.to_arrow_refs()):
                if part.num_rows:
                    import pyarrow.compute as pc
                    tot_n += pc.sum(part["n_rows"]).as_py()
                    tot_s += pc.sum(part["sum_units"]).as_py()
            import ray.data
            lvl_ds = ray.data.from_arrow(pa.table(
                {k: pa.array([all_label], pa.string()) for k in keys}
                | {"n_rows": pa.array([tot_n], pa.int64()),
                   "sum_units": pa.array([tot_s], pa.int64())}))
        levels.append(lvl_ds)
    out = levels[0]
    for l in levels[1:]:
        out = out.union(l)
    return out


def q3_top_orders(sf_dir: str, segment: str = "BUILDING",
                  cutoff: str = "1998-06-01", top_n: int = 10):
    """TPC-H-Q3-style shipping-priority query → the ``top_n`` orders
    by revenue among ``segment`` customers, ordered before ``cutoff``
    with line items shipped after it:
    ``(o_orderkey, o_orderdate, o_orderpriority, revenue_units)``.
    Revenue is the exact integer
    ``Σ floor(extendedprice·100) · (100 − floor(discount·100))`` so
    the distributed sum is partial-order independent and the DuckDB
    oracle replays it value-for-value (the double products inside the
    floors are computed identically on both sides).

    The three-table join, composed scale-first: the customer
    dimension is filtered to the segment and BROADCAST (``ray.put``
    of a key array — no shuffle of the orders side); lineitem is
    date-pruned at the read and pre-aggregated per orderkey (one
    groupby); the surviving per-order revenue table meets the
    filtered orders side in ONE :func:`merge_join`; the final top-n
    is a cardinality-bounded descending sort."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    cut = pa.scalar(np.datetime64(cutoff, "us"), pa.timestamp("us"))

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    keys = cust.filter(pc.equal(cust["c_mktsegment"], segment))
    keys_ref = ray.put(keys["c_custkey"].combine_chunks().cast(
        pa.int64()))

    def filter_orders(t: pa.Table) -> pa.Table:
        # stateless broadcast lookup: ray.get from the local object
        # store is free per task — an actor pool here would pay ~3 s
        # of spin-up to filter a dimension-bounded stream (measured)
        keys = ray.get(keys_ref)
        m = pc.and_(
            pc.less(t["o_orderdate"].cast(pa.timestamp("us")), cut),
            pc.is_in(t["o_custkey"].cast(pa.int64()), value_set=keys))
        t = t.filter(m)
        return pa.table({
            "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            "o_orderdate": t["o_orderdate"].cast(pa.timestamp("us")),
            "o_orderpriority": t["o_orderpriority"].cast(pa.string())})

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"]).map_batches(
        filter_orders, batch_format="pyarrow")

    def li_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(
            t["l_shipdate"].cast(pa.timestamp("us")), cut))
        price_c = pc.cast(pc.floor(pc.multiply(pc.cast(
            t["l_extendedprice"], pa.float64()), 100.0)), pa.int64())
        disc_c = pc.cast(pc.floor(pc.multiply(pc.cast(
            t["l_discount"], pa.float64()), 100.0)), pa.int64())
        rev = pc.multiply(price_c, pc.subtract(pa.scalar(100), disc_c))
        agg = pa.TableGroupBy(pa.table(
            {"o_orderkey": t["l_orderkey"].cast(pa.int64()),
             "rev": rev}), ["o_orderkey"]).aggregate([("rev", "sum")])
        return pa.table({"o_orderkey": agg["o_orderkey"],
                         "revenue_units": agg["rev_sum"].cast(pa.int64())})

    li_rev = (rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("revenue_units", alias_name="revenue_units"))
        .map_batches(lambda t: pa.table({
            "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            "revenue_units": t["revenue_units"].cast(pa.int64())}),
            batch_format="pyarrow"))

    return (merge_join(orders, li_rev, on="o_orderkey")
            .sort(["revenue_units", "o_orderkey"],
                  descending=[True, False])
            .limit(top_n)
            .map_batches(lambda t: t.select(
                ["o_orderkey", "o_orderdate", "o_orderpriority",
                 "revenue_units"]), batch_format="pyarrow"))


def local_supplier_revenue(sf_dir: str, date_lo: str = "1996-01-01",
                           date_hi: str = "2000-01-01"):
    """TPC-H-Q5-style multi-join → revenue per nation from line items
    whose CUSTOMER and SUPPLIER share that nation:
    ``(n_name, revenue_units:int64)``, revenue desc (n_name tiebreak).
    Integer revenue units as in :func:`q3_top_orders`.

    The join chain, tier by tier: orders⋈customer is KEY-TO-KEY on a
    table that is data-sized at TPC-H scale, so it takes a
    :func:`merge_join` (NOT a broadcast — customer grows with SF);
    lineitem⋈orders is the second merge_join; the supplier→nation and
    nation-name maps are genuinely cardinality-bounded (suppliers per
    nation, 25 nations) and broadcast. Equality of customer and
    supplier nation is a vectorized filter after the supplier map
    lookup — no third exchange."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo = pa.scalar(np.datetime64(date_lo, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"), pa.timestamp("us"))

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table({
            "o_custkey": t["c_custkey"].cast(pa.int64()),
            "c_nationkey": t["c_nationkey"].cast(pa.int64())}),
        batch_format="pyarrow")

    def ord_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"].cast(pa.timestamp("us")),
                             lo),
            pc.less(t["o_orderdate"].cast(pa.timestamp("us")), hi)))
        return pa.table({
            "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            "o_custkey": t["o_custkey"].cast(pa.int64())})

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        ord_prep, batch_format="pyarrow")

    ord_nat = merge_join(orders, cust, on="o_custkey").map_batches(
        lambda t: t.select(["o_orderkey", "c_nationkey"]),
        batch_format="pyarrow")

    def li_prep(t: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.floor(pc.multiply(pc.cast(
            t["l_extendedprice"], pa.float64()), 100.0)), pa.int64())
        disc_c = pc.cast(pc.floor(pc.multiply(pc.cast(
            t["l_discount"], pa.float64()), 100.0)), pa.int64())
        return pa.table({
            "o_orderkey": t["l_orderkey"].cast(pa.int64()),
            "l_suppkey": t["l_suppkey"].cast(pa.int64()),
            "rev": pc.multiply(price_c,
                               pc.subtract(pa.scalar(100), disc_c))})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"]).map_batches(li_prep,
                                            batch_format="pyarrow")

    joined = merge_join(li, ord_nat, on="o_orderkey")

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    sk = supp["s_suppkey"].combine_chunks().cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    sn = supp["s_nationkey"].combine_chunks().cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    order_s = np.argsort(sk)
    nk = nation["n_nationkey"].combine_chunks().cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    names = nation["n_name"].to_pylist()
    name_of = dict(zip(nk.tolist(), names))
    ref = ray.put((sk[order_s], sn[order_s], name_of))

    def local_only(t: pa.Table) -> pa.Table:
        # stateless broadcast lookup (ray.get is free per task; an
        # actor pool pays spin-up for nothing here, as in q3)
        if t.num_rows == 0:
            return pa.table({"n_name": pa.array([], pa.string()),
                             "rev": pa.array([], pa.int64())})
        sk, sn, name_of = ray.get(ref)
        # dense nationkey -> name lookup (25 nations): one fancy
        # index per batch instead of a per-row dict walk
        name_lut = np.empty(max(name_of) + 1, dtype=object)
        for k, v in name_of.items():
            name_lut[k] = v
        supp_keys = t["l_suppkey"].combine_chunks().to_numpy(
            zero_copy_only=False)
        pos = np.searchsorted(sk, supp_keys)
        s_nat = sn[np.clip(pos, 0, len(sn) - 1)]
        c_nat = t["c_nationkey"].combine_chunks().to_numpy(
            zero_copy_only=False)
        keep = (sk[np.clip(pos, 0, len(sk) - 1)]
                == supp_keys) & (s_nat == c_nat)
        idx = np.flatnonzero(keep)
        nat = s_nat[idx]
        names_arr = pa.array(name_lut[nat], pa.string())
        agg = pa.TableGroupBy(pa.table({
            "n_name": names_arr,
            "rev": t["rev"].take(pa.array(idx))}),
            ["n_name"]).aggregate([("rev", "sum")])
        return pa.table({"n_name": agg["n_name"],
                         "rev": agg["rev_sum"].cast(pa.int64())})

    return (joined.map_batches(local_only, batch_format="pyarrow")
            .groupby("n_name")
            .aggregate(Sum("rev", alias_name="revenue_units"))
            .map_batches(lambda t: pa.table({
                "n_name": t["n_name"].cast(pa.string()),
                "revenue_units": t["revenue_units"].cast(pa.int64())}),
                batch_format="pyarrow")
            .sort(["revenue_units", "n_name"],
                  descending=[True, False]))
