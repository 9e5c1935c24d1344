"""Transitive clustering: connected components as iterative min-label
propagation (groupby-aggregate), SURVEY.md §7 stage 7.

The reference has no clustering operator — the fuzzy query plays the
similarity-join role one probe at a time (SURVEY.md §2.5); transitive
closure over scored pairs is the dataset-level analogue this engine
adds.

Algorithm (hash-partitioned, driver controls iterations):
  labels₀(node) = node
  repeat: msgs = edges⋈labels (both directions) ∪ labels
          labelsᵢ₊₁ = groupby(node).min(label)
  until Σ label-hash stable (min-propagation is monotone, so an
  unchanged aggregate ⇒ fixpoint). Converges in ≤ diameter iterations.

Skew notes: Ray Data's built-in ``Min`` aggregate pre-combines per
block before the shuffle (the salted two-phase pattern of SURVEY.md
§4.2 is only needed for mega-components whose message fan-in exceeds a
partition; the per-block combine handles moderate skew). ``num_partitions``
sizes the hash join.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Min

__all__ = ["connected_components", "union_find_components"]


def connected_components(edges_ds, node_a: str = "url_a",
                         node_b: str = "url_b",
                         num_partitions: int = 16,
                         max_iters: int = 25):
    """edges(node_a, node_b) → (url, cluster_id) for every node that
    appears in an edge; cluster_id = lexicographic min node of the
    component. Driver loop with materialized per-iteration labels."""
    edges = (edges_ds
             .select_columns([node_a, node_b])
             .map_batches(lambda t: pa.table({
                 "src": pa.concat_arrays([
                     t[node_a].combine_chunks().cast(pa.string()),
                     t[node_b].combine_chunks().cast(pa.string())]),
                 "dst": pa.concat_arrays([
                     t[node_b].combine_chunks().cast(pa.string()),
                     t[node_a].combine_chunks().cast(pa.string())]),
             }), batch_format="pyarrow")
             ).materialize()

    if edges.count() == 0:
        # empty-edge guard: hash joins on schema-less empty blocks fail
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "cluster_id": pa.array([], pa.string())}))

    labels = (edges
              .groupby("src")
              .aggregate(Min("dst", alias_name="label"))
              .map_batches(lambda t: pa.table({
                  "node": t["src"].cast(pa.string()),
                  "label": pa.compute.min_element_wise(
                      t["src"].cast(pa.string()),
                      t["label"].cast(pa.string())),
              }), batch_format="pyarrow")
              ).materialize()

    prev_sig = None
    for _ in range(max_iters):
        sig = _label_signature(labels)
        if sig == prev_sig:
            break
        prev_sig = sig
        # messages: neighbor labels flow along edges
        msgs = edges.join(labels, join_type="inner",
                          num_partitions=num_partitions,
                          on=("src",), right_on=("node",))
        msgs = msgs.map_batches(lambda t: pa.table({
            "node": t["dst"].cast(pa.string()),
            "label": t["label"].cast(pa.string()),
        }), batch_format="pyarrow")
        combined = msgs.union(labels)
        labels = (combined.groupby("node")
                  .aggregate(Min("label", alias_name="label"))
                  ).materialize()
    return labels.map_batches(lambda t: pa.table({
        "url": t["node"].cast(pa.string()),
        "cluster_id": t["label"].cast(pa.string()),
    }), batch_format="pyarrow")


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
