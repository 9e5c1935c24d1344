"""Transitive clustering: connected components over scored pairs,
SURVEY.md §7 stage 7.

The reference has no clustering operator — the fuzzy query plays the
similarity-join role one probe at a time (SURVEY.md §2.5); transitive
closure over scored pairs is the dataset-level analogue this engine
adds.

Two paths:

- **driver union-find** under ``driver_threshold`` symmetrized edge
  rows: collect, solve, broadcast the labels (zero shuffles).
- **BSP min-label propagation** above it — raw Ray tasks, the one spot
  the Dataset API genuinely can't serve: an iterative join needs BOTH
  sides co-partitioned by the SAME key split across EVERY round, and
  Ray Data's sample-based range sort re-derives boundaries per sort.
  Edges are hash-partitioned by ``hash(src) % n`` ONCE; each round is

      join wave   A_j: (edge bucket j ∪ routed pointer-jump edges)
                  ⋈ labels_j (Arrow C++ hash join), then a per-task
                  COMBINER (min label per dst) so at most one row per
                  (task, node) crosses the wire — mega-component
                  fan-in is bounded by n, no salting needed;
      exchange    combiner output routed by hash(dst) % n
                  (num_returns=n object refs, never via the driver);
      reduce wave B_k: min(old labels_k, incoming) per node, COUNT
                  CHANGES, and emit next round's pointer-jump edges
                  (label → node, routed by hash(label) % n).

  Pointer jumping keeps rounds O(log diameter); the change count makes
  convergence detection free (labels are monotone non-increasing, so
  zero changes ⇒ global fixpoint — no signature pass, no confirm
  round of shuffles).

Labels and messages hash the same way everywhere, so a node's label
row, its incoming messages and its pointer-jump target all live in one
bucket by construction. Per-round cost: 2n short tasks + one bounded
exchange — at 10^9 edges the wave compute dominates; at test scale the
round overhead is milliseconds, not multi-stage sort scheduling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


from orchid_fst_ray.functions.blocks import compact_nonempty

__all__ = ["connected_components", "union_find_components"]

_EDGE_SCHEMA = pa.schema([("src", pa.string()), ("dst", pa.string())])
_LABEL_SCHEMA = pa.schema([("node", pa.string()), ("label", pa.string())])


def _empty(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def _trace(label: str, t0: list) -> None:
    """Phase-boundary timing, printed only when GRAFT_CC_TRACE is set
    (perf forensics; zero cost otherwise)."""
    import os
    import time
    if os.environ.get("GRAFT_CC_TRACE"):
        now = time.time()
        print(f"[cc-trace] {label}: +{now - t0[0]:.3f}s", flush=True)
        t0[0] = now


def _bucket_of(col, n: int) -> np.ndarray:
    """Routing hash straight off the Arrow string BUFFERS: the first 8
    and last 8 bytes of each value plus its length, mixed with
    hash64_pairs — ~25x faster than objectifying the column for a
    siphash (this runs inside EVERY BSP wave task; the objectifying
    hash was half the task's wall). A collision only skews bucket
    load, never correctness: all routing goes through this one
    function, so co-partitioning stays consistent across rounds."""
    from orchid_fst_ray.functions.hashing import hash64_pairs
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = arr.cast(pa.large_string())
    m = len(arr)
    offs = np.frombuffer(arr.buffers()[1], np.int64,
                         count=arr.offset + m + 1)[arr.offset:]
    data_buf = arr.buffers()[2]
    data = (np.frombuffer(data_buf, np.uint8) if data_buf is not None
            else np.zeros(0, np.uint8))
    if len(data) == 0:
        # Degenerate block: every value empty/null → the data buffer is
        # zero-length (or absent) and the clipped gathers below would
        # index -1 into it. The `live` mask already zeroes gathered
        # bytes for empty values, so a 1-byte dummy leaves all real
        # hashes unchanged.
        data = np.zeros(1, np.uint8)
    starts = offs[:-1]
    lens = (offs[1:] - starts).astype(np.uint64)
    first8 = np.zeros(m, np.uint64)
    last8 = np.zeros(m, np.uint64)
    ends = offs[1:]
    with np.errstate(over="ignore"):
        for k in range(8):
            live = lens > k
            idx_f = np.minimum(starts + k, ends - 1)
            idx_b = np.maximum(ends - 1 - k, starts)
            byte_f = data[np.clip(idx_f, 0, len(data) - 1)].astype(
                np.uint64)
            byte_b = data[np.clip(idx_b, 0, len(data) - 1)].astype(
                np.uint64)
            first8 |= np.where(live, byte_f, np.uint64(0)) << np.uint64(
                8 * k)
            last8 |= np.where(live, byte_b, np.uint64(0)) << np.uint64(
                8 * k)
    h = hash64_pairs(first8, hash64_pairs(last8, lens))
    return (h % np.uint64(n)).astype(np.int64)


def _split_by_bucket(t: pa.Table, col: str, n: int) -> list[pa.Table]:
    if t.num_rows == 0:
        return [t] * n
    b = _bucket_of(t[col], n)
    order = np.argsort(b, kind="stable")
    sorted_t = t.take(pa.array(order))
    bounds = np.searchsorted(b[order], np.arange(n + 1))
    return [sorted_t.slice(bounds[k], bounds[k + 1] - bounds[k])
            for k in range(n)]


def connected_components(edges_ds, node_a: str = "url_a",
                         node_b: str = "url_b",
                         nodes_ds=None, node_col: str = "url",
                         num_partitions: int = 16,
                         max_iters: int = 25,
                         driver_threshold: int = 200_000,
                         salt_partitions: int | None = None):
    """edges(node_a, node_b) [+ optional nodes(node_col) seeds] →
    (url, cluster_id); cluster_id = lexicographic min node of the
    component. Seeded nodes with no edges come back as singletons.

    ``salt_partitions`` is accepted for API stability but no longer
    changes the plan: the per-task combiner in the BSP join wave
    already bounds any node's message fan-in to ``num_partitions``
    rows, which is what two-phase salting bought.
    """
    import time

    import ray.data as rd

    _t = [time.time()]
    # ONE narrow projection materialize; the 2x-rows symmetric table is
    # built INSIDE the per-block route task (BSP path) or lazily
    # (driver path) instead of making its own object-store round trip
    # as a standalone dataset pass + compaction shuffle.
    pairs = edges_ds.select_columns([node_a, node_b]).materialize()
    n_edges = 2 * pairs.count()       # count is metadata after materialize

    def _symmetrize(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.concat_arrays([
                t[node_a].combine_chunks().cast(pa.string()),
                t[node_b].combine_chunks().cast(pa.string())]),
            "dst": pa.concat_arrays([
                t[node_b].combine_chunks().cast(pa.string()),
                t[node_a].combine_chunks().cast(pa.string())]),
        })

    seeds = None
    if nodes_ds is not None:
        seeds = nodes_ds.select_columns([node_col]).map_batches(
            lambda t: pa.table({
                "node": t[node_col].cast(pa.string()),
                "label": t[node_col].cast(pa.string()),
            }), batch_format="pyarrow")

    _trace("project+count", _t)
    if n_edges == 0:
        if seeds is None:
            return rd.from_arrow(_empty(_LABEL_SCHEMA)).map_batches(
                _rename_out, batch_format="pyarrow")
        return compact_nonempty(seeds, schema=_LABEL_SCHEMA).map_batches(
            _rename_out, batch_format="pyarrow")

    if n_edges <= driver_threshold:
        edges = compact_nonempty(
            pairs.map_batches(_symmetrize, batch_format="pyarrow"),
            schema=_EDGE_SCHEMA, max_blocks=num_partitions)
        return _driver_components(edges, seeds)

    # bucket count targets ~200k directed edge rows per bucket (the
    # edges table above holds both directions — a single-threaded
    # wave task handles 200k rows in ~0.3 s), capped at
    # num_partitions: every BSP wave launches 2n single-core tasks
    # with one synchronization, so oversizing n on a tiny graph pays
    # pure wave latency. num_partitions stays the SKEW/CAPACITY
    # ceiling: huge graphs still fan out to the full cluster.
    n = max(2, min(num_partitions, -(-n_edges // 200_000)))

    # Seeds that never appear in an edge are singletons and cannot
    # change label, so they skip the loop entirely and merge back in
    # ONE routed task wave: the BSP's label buckets are already
    # hash-partitioned by node, so seeds are split with the same hash
    # and min-merged per bucket — no Dataset groupby shuffle. Routing
    # depends only on nodes_ds, so it is SUBMITTED before the wave
    # loop and runs on the CPUs the n-bucket waves leave idle; only
    # the final min-merge waits for the converged labels.
    seed_routed: list = []
    if seeds is not None:
        import ray

        route_s = ray.remote(_route_seeds_task)
        seed_refs = [ref for bundle in
                     seeds.materialize().iter_internal_ref_bundles()
                     for ref, meta in bundle.blocks if meta.num_rows]
        seed_routed = [route_s.options(num_returns=n).remote(ref, n)
                       for ref in seed_refs]
        _trace("seed route submit", _t)

    label_refs = _bsp_components(pairs, n, max_iters,
                                 node_a=node_a, node_b=node_b,
                                 seed_routed=seed_routed)
    _trace("bsp_components", _t)
    labels = rd.from_arrow_refs(label_refs)
    return labels.map_batches(_rename_out, batch_format="pyarrow")


# ------------------------------------------------------- BSP propagation

def _route_pairs_task(t: pa.Table, node_a: str, node_b: str,
                      n: int) -> list[pa.Table]:
    """Symmetrize one raw pairs block and split it by hash(src) % n.
    Fusing the 2x-rows symmetric table into the route task keeps it
    out of the object store as a standalone dataset: each directed
    copy is written exactly once, already bucketed."""
    sym = pa.table({
        "src": pa.concat_arrays([
            t[node_a].combine_chunks().cast(pa.string()),
            t[node_b].combine_chunks().cast(pa.string())]),
        "dst": pa.concat_arrays([
            t[node_b].combine_chunks().cast(pa.string()),
            t[node_a].combine_chunks().cast(pa.string())]),
    })
    return _split_by_bucket(sym, "src", n)


def _concat_task(schema: pa.Schema, *parts: pa.Table) -> pa.Table:
    live = [p for p in parts if p.num_rows]
    return pa.concat_tables(live) if live else _empty(schema)


# The loop runs DICT-ENCODED: node strings are translated to dense
# int64 ids once up front (3 task waves), every propagation round then
# joins/aggregates 16-byte rows with modulo routing (id % n IS the
# owner bucket — no hashing at all inside the loop), and ids translate
# back to strings once at the end (2 waves + concat). String kernels
# were the loop's whole cost profile: hash joins over varlen url keys
# burned 5-10x the CPU of the int64 equivalents and shipped 60-80 B
# rows where the int loop ships 16 B.
#
# id = local_rank * n + bucket, where bucket = _bucket_of(node) — an
# arbitrary (NOT order-preserving) bijection. Min-label propagation
# only needs SOME total order to converge, and the decode pass
# restores the user-facing semantics (cluster_id = lexicographic min
# node string of the component) with one per-component string min —
# ids never leak out of _bsp_components.
#
# All wave kernels run ``use_threads=False``: a wave task reserves ONE
# Ray CPU, and letting Arrow fan a join/groupby onto its
# process-global pool (sized by whatever task first touched it — 32
# threads after a busy Ray Data session) had n concurrent wave tasks
# × pool-size threads thrashing: measured 5-8x more CPU burned per
# join for a 4-6x wall regression. Single-threaded kernels keep
# one-task-one-core true at every cluster size — wave parallelism
# comes from the n buckets, not from intra-task pools.

_EDGE_I64 = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
_LABEL_I64 = pa.schema([("node", pa.int64()), ("label", pa.int64())])
_VOCAB_SCHEMA = pa.schema([("v", pa.string())])
_REQ_SCHEMA = pa.schema([("dst", pa.string())])
_ANS_SCHEMA = pa.schema([("id", pa.int64())])
_STATE_SCHEMA = pa.schema([("src_id", pa.int64()), ("pos", pa.int64())])
_DEC_SCHEMA = pa.schema([("node", pa.string()), ("label_id", pa.int64())])


def _i64(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.to_numpy(zero_copy_only=False)


def _split_by_mod(t: pa.Table, col: str, n: int) -> list[pa.Table]:
    """Split an int64-keyed table by ``key % n`` — exact ownership, no
    hash: id = rank * n + bucket, so id % n recovers the bucket."""
    if t.num_rows == 0:
        return [t] * n
    b = _i64(t[col]) % n
    order = np.argsort(b, kind="stable")
    st = t.take(pa.array(order))
    bounds = np.searchsorted(b[order], np.arange(n + 1))
    return [st.slice(bounds[k], bounds[k + 1] - bounds[k])
            for k in range(n)]


def _encode_local_task(n: int, b: int, *parts: pa.Table):
    """Bucket b of the string edges (concatenated inline from its
    routed parts — fusing the concat layer saves one full write+read
    of every bucket) → its vocab (distinct srcs, in pc.unique's
    arbitrary-but-stable order), the src-id/row-order state, and
    per-owner dst lookup requests. Every node appears as src in
    exactly its own bucket (edges are symmetrized and routed by
    hash(src)), so dst ids are resolved by one request/answer exchange
    instead of broadcasting vocabularies."""
    import pyarrow.compute as pc
    edge_bucket = _concat_task(_EDGE_SCHEMA, *parts)
    if edge_bucket.num_rows == 0:
        return ([_empty(_VOCAB_SCHEMA), _empty(_STATE_SCHEMA)]
                + [_empty(_REQ_SCHEMA)] * n)
    srcs = edge_bucket["src"].combine_chunks().cast(pa.string())
    vocab = pc.unique(srcs)
    src_id = (_i64(pc.index_in(srcs, value_set=vocab).cast(pa.int64()))
              * n + b)
    owner = _bucket_of(edge_bucket["dst"], n)
    order = np.argsort(owner, kind="stable").astype(np.int64)
    dst_sorted = (edge_bucket["dst"].combine_chunks().cast(pa.string())
                  .take(pa.array(order)))
    bounds = np.searchsorted(owner[order], np.arange(n + 1))
    reqs = [pa.table({"dst": dst_sorted.slice(
        bounds[k], bounds[k + 1] - bounds[k])}) for k in range(n)]
    state = pa.table({"src_id": pa.array(src_id, pa.int64()),
                      "pos": pa.array(order, pa.int64())})
    return [pa.table({"v": vocab}), state] + reqs


def _encode_answer_task(vocab_table: pa.Table, n: int, o: int,
                        *reqs: pa.Table):
    """Owner bucket o answers id lookups: id = rank-in-vocab * n + o."""
    import pyarrow.compute as pc
    vocab = vocab_table["v"].combine_chunks()
    outs = []
    for r in reqs:
        if r.num_rows == 0:
            outs.append(_empty(_ANS_SCHEMA))
            continue
        rank = pc.index_in(r["dst"].combine_chunks(), value_set=vocab)
        if rank.null_count:
            # must survive python -O: a dst every one of whose edges
            # routed elsewhere would silently mis-encode
            raise RuntimeError(
                "BSP encode: dst node missing from its owner bucket's "
                "vocabulary — routing invariant violated")
        outs.append(pa.table({
            "id": pa.array(_i64(rank.cast(pa.int64())) * n + o,
                           pa.int64())}))
    return outs


def _encode_finish_task(state: pa.Table, *answers: pa.Table):
    """Zip the per-owner id answers back into original row order →
    the bucket's int64 edge table, PLUS the bucket's initial labels
    labels₀(src) = min(src, min dst over src's edges) — fused here so
    the edge bucket isn't re-read by a separate init layer."""
    m = state.num_rows
    if m == 0:
        return [_empty(_EDGE_I64), _empty(_LABEL_I64)]
    ids = np.concatenate([_i64(a["id"]) for a in answers if a.num_rows])
    dst_id = np.empty(m, np.int64)
    dst_id[_i64(state["pos"])] = ids
    edge_bucket = pa.table({"src": state["src_id"],
                            "dst": pa.array(dst_id, pa.int64())})
    agg = pa.TableGroupBy(edge_bucket, "src",
                          use_threads=False).aggregate([("dst", "min")])
    src = _i64(agg["src"])
    lab = np.minimum(src, _i64(agg["dst_min"]))
    labels0 = pa.table({"node": pa.array(src, pa.int64()),
                        "label": pa.array(lab, pa.int64())})
    return [edge_bucket, labels0]


def _join_wave_task(edge_bucket: pa.Table, labels_j: pa.Table, n: int,
                    *jump_parts: pa.Table) -> list[pa.Table]:
    """Messages for one bucket: (edges ∪ pointer-jump edges) ⋈ labels,
    combined to min label per destination, routed by dst % n."""
    edges = _concat_task(_EDGE_I64, edge_bucket, *jump_parts)
    if edges.num_rows == 0 or labels_j.num_rows == 0:
        return [_empty(_LABEL_I64)] * n
    lab = labels_j.rename_columns(["src", "label"])
    j = edges.join(lab, keys="src", join_type="inner",
                   use_threads=False)
    msgs = pa.table({"node": j["dst"].combine_chunks(),
                     "label": j["label"].combine_chunks()})
    # combiner: ≤ one row per (task, node) crosses the exchange
    agg = pa.TableGroupBy(msgs, "node",
                          use_threads=False).aggregate([("label", "min")])
    combined = pa.table({"node": agg["node"].combine_chunks(),
                         "label": agg["label_min"].combine_chunks()})
    return _split_by_mod(combined, "node", n)


def _reduce_wave_task(old_labels: pa.Table, n: int, *msg_parts: pa.Table):
    """New labels for one bucket + change count + routed pointer-jump
    edges for the next round. Returns (labels, changed, route_0..n-1)."""
    allm = _concat_task(_LABEL_I64, old_labels, *msg_parts)
    if allm.num_rows == 0:
        return [_empty(_LABEL_I64), 0] + [_empty(_EDGE_I64)] * n
    agg = pa.TableGroupBy(allm, "node",
                          use_threads=False).aggregate([("label", "min")])
    node = _i64(agg["node"])
    lab = _i64(agg["label_min"])
    order = np.argsort(node, kind="stable")
    node, lab = node[order], lab[order]
    # message dsts are edge endpoints, whose label rows live in this
    # same bucket — node sets match, so sorted arrays align 1:1
    old_node = _i64(old_labels["node"])
    old_order = np.argsort(old_node, kind="stable")
    if len(node) != len(old_node):
        # must survive python -O: a misaligned node set would yield a
        # silently wrong change count (and a wrong fixpoint decision)
        raise RuntimeError(
            "BSP reduce wave: message node set diverged from the "
            f"bucket's label set ({len(node)} vs {len(old_node)} "
            "nodes) — routing invariant violated")
    changed = int((lab != _i64(old_labels["label"])[old_order]).sum())
    jmask = lab != node
    jump_edges = pa.table({"src": pa.array(lab[jmask], pa.int64()),
                           "dst": pa.array(node[jmask], pa.int64())})
    new = pa.table({"node": pa.array(node, pa.int64()),
                    "label": pa.array(lab, pa.int64())})
    return [new, changed] + _split_by_mod(jump_edges, "src", n)


def _decode_emit_task(labels_int: pa.Table, vocab_table: pa.Table,
                      n: int) -> list[pa.Table]:
    """node_id → node string via the bucket's own vocab; rows routed
    to the label id's owner bucket for the component-min resolve."""
    if labels_int.num_rows == 0:
        return [_empty(_DEC_SCHEMA)] * n
    vocab = vocab_table["v"].combine_chunks()
    node_str = vocab.take(pa.array(_i64(labels_int["node"]) // n))
    t = pa.table({"node": node_str,
                  "label_id": labels_int["label"]})
    return _split_by_mod(t, "label_id", n)


def _decode_resolve_task(n: int, *parts: pa.Table) -> list[pa.Table]:
    """All members of a component arrive at its label id's owner:
    cluster_id = min node STRING per component (the user-facing
    semantics the arbitrary-order ids abstracted away), then the final
    string rows route back to hash(node) buckets — the partitioning
    the seed merge relies on."""
    import pyarrow.compute as pc
    allt = _concat_task(_DEC_SCHEMA, *parts)
    if allt.num_rows == 0:
        return [_empty(_LABEL_SCHEMA)] * n
    agg = pa.TableGroupBy(allt, "label_id",
                          use_threads=False).aggregate([("node", "min")])
    idx = pc.index_in(allt["label_id"].combine_chunks(),
                      value_set=agg["label_id"].combine_chunks())
    cluster = agg["node_min"].combine_chunks().take(idx)
    out = pa.table({
        "node": allt["node"].combine_chunks().cast(pa.string()),
        "label": cluster.cast(pa.string())})
    return _split_by_bucket(out, "node", n)


def _route_seeds_task(t: pa.Table, n: int) -> list[pa.Table]:
    return _split_by_bucket(_cast_labels(t), "node", n)


def _merge_seed_bucket_task(*parts: pa.Table):
    """Min label per node over (BSP bucket labels ∪ same-bucket
    seeds): edge nodes keep their component label (always ≤ the
    seed's self-label), seed-only nodes become singletons."""
    allr = _concat_task(_LABEL_SCHEMA, *parts)
    if allr.num_rows == 0:
        return _empty(_LABEL_SCHEMA)
    agg = pa.TableGroupBy(allr, "node",
                          use_threads=False).aggregate([("label", "min")])
    return pa.table({
        "node": agg["node"].combine_chunks().cast(pa.string()),
        "label": agg["label_min"].combine_chunks().cast(pa.string())})


def _bsp_components(pairs_ds, n: int, max_iters: int,
                    node_a: str = "src", node_b: str = "dst",
                    seed_routed: list | None = None):
    """``pairs_ds`` must be a MATERIALIZED narrow (node_a, node_b)
    dataset; symmetrization happens inside the route tasks.
    ``seed_routed``: per-seed-block lists of n routed seed refs
    (hash(node) % n — the same split as the label buckets); when
    given, the seed min-merge fuses into the decode's final layer."""
    import os
    import time

    import ray
    import ray.data as rd

    _t = [time.time()]
    _force = bool(os.environ.get("GRAFT_CC_TRACE"))

    route = ray.remote(_route_pairs_task)
    concat = ray.remote(_concat_task)
    enc_local = ray.remote(_encode_local_task)
    enc_answer = ray.remote(_encode_answer_task)
    enc_finish = ray.remote(_encode_finish_task)
    join_wave = ray.remote(_join_wave_task)
    reduce_wave = ray.remote(_reduce_wave_task)
    dec_emit = ray.remote(_decode_emit_task)
    dec_resolve = ray.remote(_decode_resolve_task)

    block_refs = [ref for bundle in pairs_ds.iter_internal_ref_bundles()
                  for ref, meta in bundle.blocks if meta.num_rows]
    routed = [route.options(num_returns=n).remote(ref, node_a, node_b, n)
              for ref in block_refs]
    # dict-encode: vocab per bucket, dst ids via request/answer
    # exchange; the routed parts concat INSIDE enc_local and labels₀
    # comes fused out of enc_finish — two fewer sequential task layers
    # (each layer was a full serialize/deserialize of every bucket).
    enc = [enc_local.options(num_returns=2 + n).remote(
        n, b, *[r[b] for r in routed]) for b in range(n)]
    vocabs = [enc[b][0] for b in range(n)]
    answers = [enc_answer.options(num_returns=n).remote(
        vocabs[o], n, o, *[enc[b][2 + o] for b in range(n)])
        for o in range(n)]
    fin = [enc_finish.options(num_returns=2).remote(
        enc[b][1], *[answers[o][b] for o in range(n)])
        for b in range(n)]
    buckets = [fin[b][0] for b in range(n)]
    labels = [fin[b][1] for b in range(n)]
    jump: list[list] = [[] for _ in range(n)]
    if _force:                      # barrier only in forensics mode
        ray.wait(labels, num_returns=len(labels))
        _trace(f"route+encode+init (n={n})", _t)

    converged = False
    for _w in range(max_iters):
        a_out = [join_wave.options(num_returns=n).remote(
            buckets[j], labels[j], n, *jump[j]) for j in range(n)]
        b_out = [reduce_wave.options(num_returns=2 + n).remote(
            labels[k], n, *[a_out[j][k] for j in range(n)])
            for k in range(n)]
        labels = [b_out[k][0] for k in range(n)]
        jump = [[b_out[k][2 + m] for k in range(n)] for m in range(n)]
        changed = sum(ray.get([b_out[k][1] for k in range(n)]))
        _trace(f"wave {_w} (changed={changed})", _t)
        if changed == 0:
            converged = True
            break
    if not converged:
        import warnings
        warnings.warn(
            f"connected_components: label propagation did not reach its "
            f"fixpoint within max_iters={max_iters}; labels may split "
            f"components. Raise max_iters (graph diameter > "
            f"2^{max_iters}).", RuntimeWarning)
    # decode: per-component lexicographic-min node string, rows routed
    # back to hash(node) buckets (the partitioning the seed merge and
    # downstream consumers rely on)
    emitted = [dec_emit.options(num_returns=n).remote(
        labels[k], vocabs[k], n) for k in range(n)]
    resolved = [dec_resolve.options(num_returns=n).remote(
        n, *[emitted[j][k] for j in range(n)]) for k in range(n)]
    if seed_routed:
        # fused final layer: the per-bucket concat of resolved parts
        # and the seed min-merge are ONE task (seed-only nodes become
        # singletons; edge nodes keep their component label)
        merge = ray.remote(_merge_seed_bucket_task)
        final = [merge.remote(*[resolved[o][k] for o in range(n)],
                              *[r[k] for r in seed_routed])
                 for k in range(n)]
    else:
        final = [concat.remote(_LABEL_SCHEMA,
                               *[resolved[o][k] for o in range(n)])
                 for k in range(n)]
    if _force:
        ray.wait(final, num_returns=len(final))
        _trace("decode", _t)
    return final        # per-bucket refs, hash-partitioned by node


# --------------------------------------------------------- small helpers

def _driver_components(edges, seeds):
    """Small-graph path: union-find on the driver, labels broadcast to
    a per-batch dict lookup over the seeds. Output is one row per
    DISTINCT url (duplicate seed urls — recrawls of the same page —
    collapse, matching the BSP path's per-node semantics), so the
    assign map is followed by one narrow (url, cluster_id) sort +
    run-take."""
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

    assigned = seeds.map_batches(Assign, fn_constructor_args=(ref,),
                                 batch_format="pyarrow",
                                 concurrency=(1, 8), num_cpus=1)

    def first_per_url(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        from orchid_fst_ray.functions.runs import run_bounds
        bounds = run_bounds(t["url"])
        return t.take(pa.array(bounds[:-1]))

    return assigned.sort("url").map_batches(
        first_per_url, batch_size=None, batch_format="pyarrow")


def _cast_labels(t: pa.Table) -> pa.Table:
    return pa.table({"node": t["node"].cast(pa.string()),
                     "label": t["label"].cast(pa.string())})


def _rename_out(t: pa.Table) -> pa.Table:
    return pa.table({"url": t["node"].cast(pa.string()),
                     "cluster_id": t["label"].cast(pa.string())})


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
