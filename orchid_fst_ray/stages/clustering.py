"""Transitive clustering: connected components as iterative min-label
propagation (groupby-aggregate), SURVEY.md §7 stage 7.

The reference has no clustering operator — the fuzzy query plays the
similarity-join role one probe at a time (SURVEY.md §2.5); transitive
closure over scored pairs is the dataset-level analogue this engine
adds.

Algorithm (hash-partitioned, driver controls iterations):
  labels₀(node) = min(node, min neighbor)   [∪ self-labels for seeds]
  repeat: msgs = edges⋈labels (label flows along each edge) ∪ labels
          labelsᵢ₊₁ = groupby(node).min(label)
  until Σ label-hash stable (min-propagation is monotone, so an
  unchanged aggregate ⇒ fixpoint). Converges in ≤ diameter iterations.

Seeding every node (``nodes_ds``) makes the final labels dataset the
*complete assignment* — singletons label themselves — so no outer join
against the docs table is needed downstream.

Skew notes: Ray Data's built-in ``Min`` aggregate pre-combines per
block before the shuffle (the salted two-phase pattern of SURVEY.md
§4.2 is only needed for mega-components whose message fan-in exceeds a
partition; the per-block combine handles moderate skew). Join inputs
are passed through ``compact_nonempty`` because hash-shuffled
aggregates can emit schema-less empty blocks that break pyarrow joins.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data.aggregate import Min

from orchid_fst_ray.functions.blocks import compact_nonempty

__all__ = ["connected_components", "union_find_components"]

_EDGE_SCHEMA = pa.schema([("src", pa.string()), ("dst", pa.string())])
_LABEL_SCHEMA = pa.schema([("node", pa.string()), ("label", pa.string())])


def _min_label_agg(ds, salt_partitions: int | None = None):
    """groupby(node).min(label), optionally SALTED two-phase
    (SURVEY.md §4.2): phase 1 aggregates on (node, salt=hash(label)%S)
    so a mega-component's fan-in spreads over S reducers; phase 2
    reduces the ≤S partials per node. Ray's per-block pre-combine
    already handles moderate skew — salting is for components whose
    message fan-in exceeds a single reducer's memory."""
    if not salt_partitions:
        return (ds.groupby("node")
                .aggregate(Min("label", alias_name="label"))
                .map_batches(_cast_labels, batch_format="pyarrow"))

    def add_salt(t: pa.Table) -> pa.Table:
        from orchid_fst_ray.functions.hashing import hash64
        import numpy as np
        salt = hash64(t["label"]) % np.uint64(salt_partitions)
        return pa.table({"node": t["node"].cast(pa.string()),
                         "label": t["label"].cast(pa.string()),
                         "_salt": pa.array(salt, pa.uint64())})

    partial = (ds.map_batches(add_salt, batch_format="pyarrow")
               .groupby(["node", "_salt"])
               .aggregate(Min("label", alias_name="label")))
    return (partial.groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .map_batches(_cast_labels, batch_format="pyarrow"))


def connected_components(edges_ds, node_a: str = "url_a",
                         node_b: str = "url_b",
                         nodes_ds=None, node_col: str = "url",
                         num_partitions: int = 16,
                         max_iters: int = 25,
                         driver_threshold: int = 2_000_000,
                         salt_partitions: int | None = None):
    """edges(node_a, node_b) [+ optional nodes(node_col) seeds] →
    (url, cluster_id); cluster_id = lexicographic min node of the
    component. Seeded nodes with no edges come back as singletons.
    Driver loop with materialized per-iteration labels.

    Small-graph fast path: when the SYMMETRIZED edge list has at most
    ``driver_threshold`` rows (~2M rows ≈ 1M pairs collects in a few
    seconds / a few hundred MB) it is solved with driver-side
    union-find and the labels broadcast back over the seeds via
    ``ray.put`` — zero shuffles instead of 2 per iteration. The
    near-dup edge set is orders of magnitude smaller than the doc set,
    but at 10^12-doc scale it still exceeds any driver, so the
    distributed min-label loop below remains the path there.
    """
    import ray.data as rd

    edges = compact_nonempty(
        edges_ds
        .select_columns([node_a, node_b])
        .map_batches(lambda t: pa.table({
            "src": pa.concat_arrays([
                t[node_a].combine_chunks().cast(pa.string()),
                t[node_b].combine_chunks().cast(pa.string())]),
            "dst": pa.concat_arrays([
                t[node_b].combine_chunks().cast(pa.string()),
                t[node_a].combine_chunks().cast(pa.string())]),
        }), batch_format="pyarrow"),
        schema=_EDGE_SCHEMA, max_blocks=num_partitions)

    seeds = None
    if nodes_ds is not None:
        seeds = nodes_ds.select_columns([node_col]).map_batches(
            lambda t: pa.table({
                "node": t[node_col].cast(pa.string()),
                "label": t[node_col].cast(pa.string()),
            }), batch_format="pyarrow")

    n_edges = edges.count()
    if n_edges == 0:
        if seeds is None:
            return rd.from_arrow(_LABEL_SCHEMA.empty_table()).map_batches(
                _rename_out, batch_format="pyarrow")
        return compact_nonempty(seeds, schema=_LABEL_SCHEMA).map_batches(
            _rename_out, batch_format="pyarrow")

    if n_edges <= driver_threshold:
        return _driver_components(edges, seeds)

    # The propagation loop runs over EDGE ENDPOINTS ONLY — seeds that
    # never appear in an edge are singletons and cannot change label,
    # so they skip the loop entirely and merge back in one final
    # aggregate. At web scale most docs are singletons; keeping them
    # out of the per-iteration shuffles is the difference between the
    # loop scaling with |edges| vs |docs|.
    base = (edges
            .groupby("src")
            .aggregate(Min("dst", alias_name="label"))
            .map_batches(lambda t: pa.table({
                "node": t["src"].cast(pa.string()),
                "label": pa.compute.min_element_wise(
                    t["src"].cast(pa.string()),
                    t["label"].cast(pa.string())),
            }), batch_format="pyarrow"))
    labels = compact_nonempty(base, schema=_LABEL_SCHEMA,
                              max_blocks=num_partitions)

    prev_sig = None
    converged = False
    for _ in range(max_iters):
        sig = _label_signature(labels)
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
        # messages: neighbor labels flow along edges — a SORT-MERGE
        # join (tag, sort on src, in-block Arrow hash join) + a
        # sorted-run min: two task-based sorts per iteration instead of
        # a hash-join reducer pool + hash aggregate. The pointer-jump
        # edges (label→node, distance doubling) ride the SAME round:
        # one union, one sort, one merge — O(log diameter) rounds at
        # half the stage count of a separate jump pass.
        label_edges = labels.map_batches(_label_to_edges,
                                         batch_format="pyarrow")
        round_edges = edges.union(label_edges)
        if salt_partitions:
            msgs = _messages_sort_merge(round_edges, labels)
            labels = compact_nonempty(
                _min_label_agg(msgs.union(labels), salt_partitions),
                schema=_LABEL_SCHEMA, max_blocks=num_partitions)
        else:
            labels = compact_nonempty(
                _propagate_once(round_edges, labels),
                schema=_LABEL_SCHEMA, max_blocks=num_partitions)
    if not converged:
        import warnings
        warnings.warn(
            f"connected_components: label propagation did not reach its "
            f"fixpoint within max_iters={max_iters}; labels may split "
            f"components. Raise max_iters (graph diameter > "
            f"2^{max_iters}).", RuntimeWarning)
    if seeds is not None:
        merged = (labels.union(seeds).groupby("node")
                  .aggregate(Min("label", alias_name="label"))
                  .map_batches(_cast_labels, batch_format="pyarrow"))
        labels = compact_nonempty(merged, schema=_LABEL_SCHEMA)
    return labels.map_batches(_rename_out, batch_format="pyarrow")


def _label_to_edges(t: pa.Table) -> pa.Table:
    """(node, label) → pointer-jump edges (src=label, dst=node)."""
    return pa.table({"src": t["label"].cast(pa.string()),
                     "dst": t["node"].cast(pa.string())})


def _messages_sort_merge(edges, labels):
    """edges(src,dst) ⋈ labels(node,label) on src → (node=dst, label):
    tagged union + ONE sort on the key + per-run fan-out (each run has
    exactly one label row)."""
    import numpy as np

    e_tag = edges.map_batches(lambda t: pa.table({
        "key": t["src"].cast(pa.string()),
        "dst": t["dst"].cast(pa.string()),
        "label": pa.nulls(t.num_rows, pa.string()),
    }), batch_format="pyarrow")
    l_tag = labels.map_batches(lambda t: pa.table({
        "key": t["node"].cast(pa.string()),
        "dst": pa.nulls(t.num_rows, pa.string()),
        "label": t["label"].cast(pa.string()),
    }), batch_format="pyarrow")

    def merge(t: pa.Table) -> pa.Table:
        # The co-locating sort puts every row of a key in ONE block, so
        # an in-block Arrow C++ hash join reproduces the per-run scan
        # with zero Python per-row work. Labels are node-unique (they
        # come from a min aggregate), so the join fans each edge out to
        # exactly one message.
        import pyarrow.compute as pc
        labels_t = t.filter(pc.is_valid(t["label"])).select(
            ["key", "label"])
        edges_t = t.filter(pc.is_valid(t["dst"])).select(["key", "dst"])
        if labels_t.num_rows == 0 or edges_t.num_rows == 0:
            return _LABEL_SCHEMA.empty_table()
        joined = edges_t.join(labels_t, keys="key", join_type="inner")
        return pa.table({
            "node": joined["dst"].combine_chunks().cast(pa.string()),
            "label": joined["label"].combine_chunks().cast(pa.string())})

    return e_tag.union(l_tag).sort("key").map_batches(
        merge, batch_size=None, batch_format="pyarrow")


def _min_sorted_runs(ds):
    """groupby(node).min(label) via sort + per-run min (labels are
    strings; runs are small)."""

    def reduce(t: pa.Table) -> pa.Table:
        # Equal nodes are co-located by the sort, so a per-block Arrow
        # hash aggregate (C++) replaces the per-run Python min scan.
        if t.num_rows == 0:
            return _LABEL_SCHEMA.empty_table()
        agg = pa.TableGroupBy(t.select(["node", "label"]),
                              "node").aggregate([("label", "min")])
        return pa.table({
            "node": agg["node"].combine_chunks().cast(pa.string()),
            "label": agg["label_min"].combine_chunks().cast(pa.string())})

    return ds.sort("node").map_batches(
        reduce, batch_size=None, batch_format="pyarrow")


def _propagate_once(edges, labels):
    """One min-label iteration: sort-merge message join + sorted-run
    min combine."""
    msgs = _messages_sort_merge(edges, labels)
    return _min_sorted_runs(msgs.union(labels))


def _driver_components(edges, seeds):
    """Small-graph path: union-find on the driver, labels broadcast to
    a per-batch dict lookup over the seeds (no shuffle)."""
    import ray
    import ray.data as rd
    pairs = []
    for b in edges.iter_batches(batch_format="pyarrow"):
        pairs.extend(zip(b["src"].to_pylist(), b["dst"].to_pylist()))
    labels = union_find_components(pairs)
    if seeds is None:
        t = pa.table({
            "url": pa.array(sorted(labels), pa.string()),
            "cluster_id": pa.array(
                [labels[k] for k in sorted(labels)], pa.string())})
        return rd.from_arrow(t)
    ref = ray.put(labels)

    class Assign:
        def __init__(self, ref):
            self.labels = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            urls = t["node"].to_pylist()
            lab = self.labels
            return pa.table({
                "url": pa.array(urls, pa.string()),
                "cluster_id": pa.array(
                    [lab.get(u, u) for u in urls], pa.string())})

    return seeds.map_batches(Assign, fn_constructor_args=(ref,),
                             batch_format="pyarrow",
                             concurrency=(1, 8), num_cpus=1)


def _cast_labels(t: pa.Table) -> pa.Table:
    return pa.table({"node": t["node"].cast(pa.string()),
                     "label": t["label"].cast(pa.string())})


def _rename_out(t: pa.Table) -> pa.Table:
    return pa.table({"url": t["node"].cast(pa.string()),
                     "cluster_id": t["label"].cast(pa.string())})


def _label_signature(labels_ds) -> int:
    """Cheap convergence check: xor-sum of (node,label) hashes via a
    per-batch partial reduce (no driver materialization of labels)."""
    from orchid_fst_ray.functions.hashing import hash64, hash64_pairs
    import numpy as np

    def sig_batch(t: pa.Table) -> pa.Table:
        h = hash64_pairs(hash64(t["node"]), hash64(t["label"]))
        x = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
        return pa.table({"sig": pa.array([int(x)], pa.uint64())})

    parts = labels_ds.map_batches(sig_batch, batch_format="pyarrow")
    acc = 0
    for b in parts.iter_batches(batch_format="pyarrow"):
        for v in b["sig"].to_pylist():
            acc ^= v
    return acc


def union_find_components(pairs: list[tuple]) -> dict:
    """Driver-side union-find — test oracle and small-result path only."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {x: find(x) for x in parent} | {
        x: find(x) for pair in pairs for x in pair}
