"""Iterative graph analytics over an edge-list Dataset: fixed-point
integer PageRank.

Power iteration is the canonical "wide step per round" workload: every
round attaches each edge's source rank to the edge and re-aggregates
by destination. The engine keeps the per-round cost at ONE narrow
groupby when the rank table fits the broadcast gate (the common case —
node tables are orders of magnitude smaller than edge tables) and
falls back to the sort-merge join exchange when it doesn't — the same
size-gated pattern as the dedup verification paths.

All arithmetic is FIXED-POINT INTEGER (``scale`` units per unit of
rank, damping 85/100, per-edge contribution ``rank*85 //
(100*outdeg)``): integer sums are associative, so the distributed
result is bit-identical regardless of partial-sum order — which is
what lets a DuckDB oracle replay the whole iteration value-for-value
(a float PageRank's hash would depend on reduction order).
Dangling-node mass (no out-edges) is dropped, matching the oracle; the
symmetrized graphs this engine builds have none.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["pagerank_int", "triangle_count"]


def pagerank_int(edges_ds, iters: int = 3, scale: int = 1_000_000,
                 damping_pct: int = 85,
                 broadcast_max_bytes: int = 256 << 20):
    """``edges_ds(src:string, dst:string)`` (distinct directed edges)
    → ``(node:string, rank:int64)`` after ``iters`` rounds of damped
    power iteration in fixed-point integers.

    ``rank_0 = scale``;
    ``rank_{i+1}(v) = base + Σ_{(u,v)∈E} rank_i(u)·d // (100·odeg(u))``
    with ``base = (100-d)·scale // 100`` — exact integer arithmetic
    end-to-end.

    Scale shape: out-degrees and the node list are computed once (two
    narrow groupbys over per-block partial counts); each round then
    broadcasts the (node, rank, odeg) table via ``ray.put`` when it
    fits ``broadcast_max_bytes`` and streams the edge list through ONE
    ``map_batches`` + per-block partial-sum combiner + one small
    groupby — the edge list is never re-sorted or re-shuffled. Above
    the gate, the round uses the :func:`merge_join` exchange instead
    (edges sorted by src once per round). Hub destinations (every node
    pointing at one page) are absorbed by the per-block combiner
    before the shuffle."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from orchid_fst_ray.pipelines.relational import merge_join

    if not (0 < damping_pct < 100):
        raise ValueError("damping_pct must be in (0, 100)")
    base = (100 - damping_pct) * scale // 100

    # the edge list is consumed iters+2 times (odeg, nodes, one scan
    # per round); pin it in the object store ONCE so its upstream
    # lineage doesn't re-execute per consumption — blocks spill under
    # pressure, the driver never sees them
    edges_ds = edges_ds.materialize()

    def state_partial(t: pa.Table) -> pa.Table:
        """One pass builds BOTH the node list and the out-degrees:
        every endpoint contributes a node row, src endpoints carry
        odeg-weight 1, dst endpoints 0 — so the single groupby Sum
        yields (node, odeg) with odeg=0 for pure sinks, replacing the
        previous two-groupby + left-outer-merge-join setup (4 fewer
        Dataset executions of pure fixed overhead per call)."""
        src = t["src"].combine_chunks().cast(pa.large_string())
        dst = t["dst"].combine_chunks().cast(pa.large_string())
        agg = pa.TableGroupBy(pa.table({
            "node": pa.concat_arrays([src, dst]),
            "odeg": pa.array(np.concatenate([
                np.ones(len(src), np.int64),
                np.zeros(len(dst), np.int64)]))}),
            "node").aggregate([("odeg", "sum")])
        return pa.table({"node": agg["node"].cast(pa.large_string()),
                         "odeg": agg["odeg_sum"].cast(pa.int64())})

    def _norm(cols):
        # Ray's groupby may hand back string OR large_string blocks;
        # pin the join key type so merge_join's type check holds.
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t["node"].cast(pa.large_string()),
                **{c: t[c].cast(pa.int64()) for c in cols}})
        return fn

    def init(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"].cast(pa.large_string()),
            "rank": pa.array(np.full(t.num_rows, scale, np.int64)),
            "odeg": pc.fill_null(t["odeg"], 0).cast(pa.int64())})

    state = (edges_ds.map_batches(state_partial, batch_format="pyarrow")
             .groupby("node").aggregate(Sum("odeg", alias_name="odeg"))
             .map_batches(init, batch_format="pyarrow"))

    def contrib_partial(t: pa.Table, lookup=None) -> pa.Table:
        """edges (+rank/odeg of src) → per-block partial dst sums."""
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.large_string()),
                             "s": pa.array([], pa.int64())})
        if lookup is not None:
            keys, ranks, odegs = lookup
            pos = np.searchsorted(keys, t["src"].combine_chunks()
                                  .cast(pa.large_string())
                                  .to_numpy(zero_copy_only=False))
            r, o = ranks[pos], odegs[pos]
        else:
            r = t["rank"].combine_chunks().to_numpy(
                zero_copy_only=False)
            o = t["odeg"].combine_chunks().to_numpy(
                zero_copy_only=False)
        c = np.zeros(t.num_rows, np.int64)
        live = o > 0
        c[live] = (r[live] * damping_pct) // (100 * o[live])
        agg = pa.TableGroupBy(pa.table({
            "node": t["dst"].combine_chunks().cast(pa.large_string()),
            "c": pa.array(c)}), "node").aggregate([("c", "sum")])
        return pa.table({"node": agg["node"].cast(pa.large_string()),
                         "s": agg["c_sum"].cast(pa.int64())})

    def _pull_sorted(ds):
        tbl = pa.concat_tables(
            t for t in ray.get(ds.to_arrow_refs()) if t.num_rows)
        keys = tbl["node"].combine_chunks().cast(pa.large_string())
        order = pc.sort_indices(keys)
        out = [keys.take(order).to_numpy(zero_copy_only=False)]
        idx = order.to_numpy()
        for c in tbl.column_names:
            if c != "node":
                out.append(tbl[c].combine_chunks().to_numpy(
                    zero_copy_only=False)[idx])
        return out

    for i in range(iters):
        # materialize the (node-table-sized) state in the OBJECT
        # STORE, decide the round's plan from its size — only the
        # under-gate branch ever pulls it to the driver
        state = state.materialize()
        if state.size_bytes() <= broadcast_max_bytes:
            # size-gated driver round: rank table is node-sized (and
            # under the gate), so the per-edge attach reads a
            # broadcast lookup and the rank update happens driver-side
            # — ZERO sort exchanges per round
            keys_np, odegs, ranks = _pull_sorted(
                state.map_batches(lambda t: t.select(
                    ["node", "odeg", "rank"]), batch_format="pyarrow"))
            ref = ray.put((keys_np, ranks, odegs))

            class Attach:
                def __init__(self) -> None:
                    self.lookup = ray.get(ref)

                def __call__(self, t: pa.Table) -> pa.Table:
                    return contrib_partial(t, self.lookup)

            sums = edges_ds.map_batches(Attach, batch_format="pyarrow",
                                        concurrency=(1, 8), num_cpus=1)
            # each block's partial is already node-bounded (≤ the
            # gated state size); fold the partials driver-side with
            # searchsorted instead of paying a groupby sort exchange
            new_rank = np.full(len(keys_np), base, np.int64)
            # ray.get ONE ref at a time: only a single node-bounded
            # partial is ever resident on the driver (getting the full
            # ref list at once would pin O(num_blocks × state) heap)
            for part_ref in sums.to_arrow_refs():
                part = ray.get(part_ref)
                if part.num_rows == 0:
                    continue
                pos = np.searchsorted(
                    keys_np, part["node"].combine_chunks().to_numpy(
                        zero_copy_only=False))
                np.add.at(new_rank, pos,
                          part["s"].combine_chunks().to_numpy(
                              zero_copy_only=False))
            state = ray.data.from_arrow(pa.table({
                "node": pa.array(keys_np, pa.large_string()),
                "rank": pa.array(new_rank),
                "odeg": pa.array(odegs)}))
        else:                            # rank table too big: exchange
            er = merge_join(
                edges_ds.map_batches(
                    lambda t: pa.table({
                        "node": t["src"].combine_chunks().cast(
                            pa.large_string()),
                        "dst": t["dst"].combine_chunks().cast(
                            pa.large_string())}),
                    batch_format="pyarrow"),
                state, on="node")
            sums = er.map_batches(
                lambda t: contrib_partial(pa.table({
                    "src": t["node"], "dst": t["dst"],
                    "rank": t["rank"], "odeg": t["odeg"]})),
                batch_format="pyarrow")
            total = (sums.groupby("node")
                     .aggregate(Sum("s", alias_name="s"))
                     .map_batches(_norm(["s"]), batch_format="pyarrow"))
            # nodes with no in-edges still get `base`
            state = merge_join(state.drop_columns(["rank"]), total,
                               on="node", join_type="left outer")
            state = state.map_batches(lambda t: pa.table({
                "node": t["node"].cast(pa.large_string()),
                "rank": pc.add(pc.fill_null(t["s"], 0).cast(pa.int64()),
                               base),
                "odeg": t["odeg"].cast(pa.int64()),
            }), batch_format="pyarrow")

    return (state.drop_columns(["odeg"])
            .map_batches(lambda t: pa.table({
                "node": t["node"].cast(pa.string()),
                "rank": t["rank"].cast(pa.int64())}),
                batch_format="pyarrow")
            .sort("node"))


def triangle_count(edges_ds, broadcast_max_bytes: int = 256 << 20):
    """Distributed triangle counting over a canonical undirected edge
    list ``(a:int64, b:int64)`` (``a < b``, distinct) → ONE row
    ``(n_nodes, n_edges, n_wedges, n_triangles)``, all exact int64.

    The classic degree-ordered orientation: every edge points from its
    lower-(degree, id) endpoint to the higher one, so each triangle
    has exactly ONE apex whose two out-edges form the counted wedge —
    and out-degrees are bounded by O(sqrt(m)) on any graph, which is
    what keeps hub nodes from exploding the wedge stage (a hub's
    edges mostly point AT it).

    Stages: (1) degree table via per-block partial counts + one
    narrow groupby; (2) orientation — the (node, deg) table is
    broadcast when it fits ``broadcast_max_bytes`` (node tables are
    ~sqrt-of-edge-table sized), else two :func:`merge_join`
    exchanges attach degrees; (3) one co-locating sort on ``src``,
    per-block CSR wedge expansion (the same ``_run_triangle_indices``
    kernel the ER candidate stage uses); (4) wedges ⋈ edges
    merge-join — a closed wedge IS a triangle, each counted once."""
    import ray
    from ray.data.aggregate import Sum

    from orchid_fst_ray.pipelines.relational import merge_join
    from orchid_fst_ray.stages.candidates import _run_triangle_indices

    edges_ds = edges_ds.materialize()     # consumed 4x below
    n_edges = edges_ds.count()

    def deg_partial(t: pa.Table) -> pa.Table:
        both = np.concatenate([
            t["a"].combine_chunks().to_numpy(zero_copy_only=False),
            t["b"].combine_chunks().to_numpy(zero_copy_only=False)])
        nodes, cnt = np.unique(both, return_counts=True)
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "deg": pa.array(cnt.astype(np.int64))})

    deg = (edges_ds.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("deg", alias_name="deg"))
           .map_batches(lambda t: pa.table({
               "node": t["node"].cast(pa.int64()),
               "deg": t["deg"].cast(pa.int64())}),
               batch_format="pyarrow")
           .materialize())
    n_nodes = deg.count()

    def _orient_with(lookup):
        nodes_np, deg_np = lookup

        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"src": pa.array([], pa.int64()),
                                 "dst": pa.array([], pa.int64())})
            a = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
            b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
            da = deg_np[np.searchsorted(nodes_np, a)]
            db = deg_np[np.searchsorted(nodes_np, b)]
            # a < b canonical, so (deg, id) order == deg order with
            # a-wins ties
            a_first = (da < db) | ((da == db))
            src = np.where(a_first, a, b)
            dst = np.where(a_first, b, a)
            return pa.table({"src": pa.array(src, pa.int64()),
                             "dst": pa.array(dst, pa.int64())})
        return fn

    if deg.size_bytes() <= broadcast_max_bytes:
        tbl = pa.concat_tables(
            t for t in ray.get(deg.to_arrow_refs()) if t.num_rows)
        nodes_np = tbl["node"].combine_chunks().to_numpy(
            zero_copy_only=False)
        order = np.argsort(nodes_np)
        lookup = (nodes_np[order],
                  tbl["deg"].combine_chunks().to_numpy(
                      zero_copy_only=False)[order])
        ref = ray.put(lookup)

        class Orient:
            def __init__(self) -> None:
                self.fn = _orient_with(ray.get(ref))

            def __call__(self, t: pa.Table) -> pa.Table:
                return self.fn(t)

        oriented = edges_ds.map_batches(Orient, batch_format="pyarrow",
                                        concurrency=(1, 8), num_cpus=1)
    else:
        # attach degrees with two exchanges (rename key per side)
        ea = merge_join(
            edges_ds.map_batches(lambda t: pa.table({
                "node": t["a"].cast(pa.int64()),
                "b": t["b"].cast(pa.int64())}), batch_format="pyarrow"),
            deg.map_batches(lambda t: pa.table({
                "node": t["node"].cast(pa.int64()),
                "da": t["deg"].cast(pa.int64())}),
                batch_format="pyarrow"),
            on="node")
        eab = merge_join(
            ea.map_batches(lambda t: pa.table({
                "a": t["node"].cast(pa.int64()),
                "node": t["b"].cast(pa.int64()),
                "da": t["da"].cast(pa.int64())}),
                batch_format="pyarrow"),
            deg.map_batches(lambda t: pa.table({
                "node": t["node"].cast(pa.int64()),
                "db": t["deg"].cast(pa.int64())}),
                batch_format="pyarrow"),
            on="node")

        def orient2(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"src": pa.array([], pa.int64()),
                                 "dst": pa.array([], pa.int64())})
            a = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
            b = t["node"].combine_chunks().to_numpy(
                zero_copy_only=False)
            da = t["da"].combine_chunks().to_numpy(
                zero_copy_only=False)
            db = t["db"].combine_chunks().to_numpy(
                zero_copy_only=False)
            a_first = (da < db) | (da == db)
            return pa.table({
                "src": pa.array(np.where(a_first, a, b), pa.int64()),
                "dst": pa.array(np.where(a_first, b, a), pa.int64())})

        oriented = eab.map_batches(orient2, batch_format="pyarrow")

    def wedges(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        import pyarrow.compute as pc
        idx = pc.sort_indices(t, sort_keys=[("src", "ascending"),
                                            ("dst", "ascending")])
        src = t["src"].take(idx).to_numpy(zero_copy_only=False)
        dst = t["dst"].take(idx).to_numpy(zero_copy_only=False)
        bounds = np.concatenate(
            ([0], np.flatnonzero(src[1:] != src[:-1]) + 1,
             [len(src)])).astype(np.int64)
        i, j = _run_triangle_indices(bounds)
        if not len(i):
            return empty
        # dst sorted within each src run → wedge (v, w) is canonical
        return pa.table({"a": pa.array(dst[i], pa.int64()),
                         "b": pa.array(dst[j], pa.int64())})

    wedge_ds = (oriented.sort("src")
                .map_batches(wedges, batch_size=None,
                             batch_format="pyarrow")
                .materialize())
    n_wedges = wedge_ds.count()
    closed = merge_join(wedge_ds,
                        edges_ds.map_batches(
                            lambda t: t.append_column(
                                "__hit", pa.array(
                                    np.ones(t.num_rows, np.int8))),
                            batch_format="pyarrow"),
                        on=["a", "b"])
    n_tri = closed.count()
    return ray.data.from_arrow(pa.table({
        "n_nodes": pa.array([n_nodes], pa.int64()),
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_wedges": pa.array([n_wedges], pa.int64()),
        "n_triangles": pa.array([n_tri], pa.int64())}))
