"""Distributed FST dictionary: build per-partition FSTs from a Dataset and
query them (match / prefix / range / fuzzy) as Dataset transforms.

Ray-Data-first re-expression of the reference's ``ofst map|set`` build
(fst_cmd.cpp:116-167: external sort → streaming sorted insert → FST file)
and query CLI (fst_cmd.cpp:183-388): the global external sort
(large_file_sorter.cpp) becomes ``ds.sort(key)`` — Ray Data's sample +
range-partition + per-partition sort supersedes lfsort's hash-split/k-way
merge — and the single FST file becomes one FST *per sorted partition*,
each a ``(part_lo, part_hi, fst:binary, n_keys)`` row. The partition
range bounds enable partition pruning for prefix/range/exact queries,
playing the role the mmap'd global structure plays in the reference.

Scale notes (100 TB design):
- the build touches only the key/value columns (prune at read).
- partition count follows Ray's sort partitioning; each builder batch is
  one whole sorted block (``batch_size=None``) so builder memory is
  bounded by block size, mirroring the reference's dump-while-build
  memory bound (fst.h:16-22).
- queries ship the *query spec* to the FST partitions (small → broadcast
  by closure), never the reverse; only matching rows come back.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

import ray.data

from orchid_fst_ray.fst import (
    Bound, Fst, FstBuilder, PrefixAutomaton, StrAutomaton, fuzzy_automaton,
)

__all__ = ["build_dictionary", "search_dictionary",
           "search_dictionary_many", "FstSearcherPool", "dictionary_items"]

INDEX_SCHEMA = pa.schema([
    ("part_lo", pa.large_string()),
    ("part_hi", pa.large_string()),
    ("fst", pa.large_binary()),
    ("n_keys", pa.int64()),
    ("n_nodes", pa.int64()),
    ("n_arcs", pa.int64()),
])


def build_dictionary(ds: "ray.data.Dataset", key_col: str = "key",
                     value_col: str | None = None,
                     dedup_last: bool = True) -> "ray.data.Dataset":
    """Sort ``ds`` by ``key_col`` and build one minimal-acyclic FST per
    sorted partition. Returns the FST *index* dataset (INDEX_SCHEMA).

    ``dedup_last``: equal keys keep the last value (the reference's
    duplicate-insert semantics, fst.cpp:180-189) — applied within each
    partition; use a prior ``groupby(key).max/last`` for a global
    guarantee when duplicates may straddle partition bounds.
    """
    cols = [key_col] + ([value_col] if value_col else [])
    sorted_ds = ds.select_columns(cols).sort(key_col)

    has_output = value_col is not None

    def build(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table([], schema=INDEX_SCHEMA)
        keys = batch[key_col].to_pylist()
        values = (batch[value_col].to_pylist() if has_output
                  else None)
        b = FstBuilder(has_output=has_output)
        # sorted within the partition by construction; insert_many applies
        # last-wins on equal keys via the builder itself
        b.insert_many(keys, values)
        fst = b.finish()
        return pa.table({
            "part_lo": [keys[0]], "part_hi": [keys[-1]],
            "fst": [fst.to_bytes()], "n_keys": [fst.n_keys],
            "n_nodes": [fst.n_nodes], "n_arcs": [fst.n_arcs],
        }, schema=INDEX_SCHEMA)

    return sorted_ds.map_batches(build, batch_size=None,
                                 batch_format="pyarrow")


def _result_table(pairs, has_output: bool) -> pa.Table:
    keys = [k for k, _ in pairs]
    if has_output:
        vals = np.fromiter((v for _, v in pairs), dtype=np.uint64,
                           count=len(keys))
        return pa.table({"key": pa.array(keys, pa.large_string()),
                         "value": pa.array(vals)})
    return pa.table({"key": pa.array(keys, pa.large_string())})


class _Searcher:
    """Per-partition query executor: deserializes the partition FST and
    streams matches for the query spec. Used as a stateless batch fn
    (deserialization is one zero-copy numpy view per partition)."""

    def __init__(self, kind: str, params: dict[str, Any],
                 has_output: bool) -> None:
        self.kind = kind
        self.params = params
        self.has_output = has_output

    def prunes(self, lo: str, hi: str) -> bool:
        """True if a partition with key range [lo, hi] cannot match."""
        p = self.params
        if self.kind == "match":
            return all(k < lo or k > hi for k in p["keys"])
        if self.kind == "prefix":
            pre = p["prefix"]
            return hi < pre or lo[:len(pre)] > pre
        if self.kind == "range":
            mn, mx = p.get("min_key"), p.get("max_key")
            if mn is not None and hi < mn:
                return True
            if mx is not None and lo > mx:
                return True
        return False

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[tuple[str, int]] = []
        p = self.params
        for row in range(batch.num_rows):
            lo = batch["part_lo"][row].as_py()
            hi = batch["part_hi"][row].as_py()
            if self.prunes(lo, hi):
                continue
            fst = Fst.from_bytes(batch["fst"][row].as_py())
            if self.kind == "match":
                for k in p["keys"]:
                    v = fst.get(k)
                    if v is not None:
                        out.append((k, v))
            elif self.kind == "prefix":
                out.extend(fst.search(PrefixAutomaton(p["prefix"])))
            elif self.kind == "range":
                out.extend(fst.search(
                    min_bound=Bound(p.get("min_key"), p.get("min_inclusive", True))
                    if p.get("min_key") is not None else None,
                    max_bound=Bound(p.get("max_key"), p.get("max_inclusive", True))
                    if p.get("max_key") is not None else None))
            elif self.kind == "fuzzy":
                aut = fuzzy_automaton(p["query"], p["d"],
                                      p.get("same_prefix_len", 0),
                                      p.get("damerau", False))
                out.extend(fst.search(aut))
            elif self.kind == "all":
                out.extend(fst.items())
            else:  # pragma: no cover
                raise ValueError(f"unknown query kind {self.kind}")
        return _result_table(out, self.has_output)


def search_dictionary(index_ds: "ray.data.Dataset", kind: str,
                      has_output: bool = True,
                      **params: Any) -> "ray.data.Dataset":
    """Run one query over the FST index dataset, distributed: each index
    row (one partition's FST) is probed independently; results union to a
    ``key[, value]`` dataset. Because partitions are range-disjoint and
    each emits in lexicographic order, a final ``sort("key")`` (done by
    callers that need global order) is cheap and skew-free.

    kinds: ``match`` (keys=[...]), ``prefix`` (prefix=...),
    ``range`` (min_key/max_key/min_inclusive/max_inclusive),
    ``fuzzy`` (query, d, same_prefix_len=0, damerau=False), ``all``.
    """
    fn = _Searcher(kind, params, has_output)
    return index_ds.map_batches(fn, batch_format="pyarrow")


def dictionary_items(index_ds: "ray.data.Dataset",
                     has_output: bool = True) -> "ray.data.Dataset":
    """Stream every (key, value) of the dictionary in partition order."""
    return search_dictionary(index_ds, "all", has_output=has_output)


class FstSearcherPool:
    """Stateful actor-pool searcher (SURVEY.md §2.3 T4): the partition
    FSTs are deserialized ONCE per actor in ``__init__`` (broadcast via
    ``ray.put`` — the object store plays the reference's mmap role,
    output_stream_util.cpp:47-66) and every batch of query strings runs
    automaton∩FST traversal against all partitions.

    Scale note: this broadcasts the whole index to each actor — right
    for dictionary-sized indexes probed by MANY queries. When the index
    itself is huge, shard the queries × index-partitions product with a
    join on partition ranges instead. Each query is range-pruned
    against every partition's [part_lo, part_hi] (the same predicate
    the sharded path uses), so ``match``/``prefix``/prefixed-``fuzzy``
    probes touch only the partitions that can match; ``probes`` /
    ``pruned`` counters record the split per actor.
    """

    def __init__(self, index_ref, kind: str, params: dict,
                 has_output: bool) -> None:
        import ray
        self.fsts = [(lo, hi, Fst.from_bytes(b))
                     for lo, hi, b in ray.get(index_ref)]
        self.kind = kind
        self.params = params
        self.has_output = has_output
        # observability: probes actually run vs skipped by the
        # [part_lo, part_hi] range prune (same predicate the sharded
        # path uses) — per-actor lifetime counters
        self.probes = 0
        self.pruned = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        from orchid_fst_ray.fst import fuzzy_automaton
        from orchid_fst_ray.fst.batch_fuzzy import batch_fuzzy_matches
        p = self.params
        out_q: list[str] = []
        out_k: list[str] = []
        out_v: list[int] = []
        queries = batch["query"].to_pylist()
        from orchid_fst_ray.fst.batch_fuzzy import MAX_BATCH_D
        if (self.kind == "fuzzy" and not p.get("same_prefix_len", 0)
                and p.get("d", 2) <= MAX_BATCH_D):
            # prefix-less fuzzy can't range-prune; run the whole query
            # batch through each partition FST level-synchronously
            for lo, hi, fst in self.fsts:
                self.probes += len(queries)
                qi, mv, mk = batch_fuzzy_matches(
                    fst, queries, p.get("d", 2), p.get("damerau", False),
                    return_keys=True)
                out_q.extend(queries[i] for i in qi.tolist())
                out_k.extend(mk)
                out_v.extend(mv.tolist())
            return self._result(out_q, out_k, out_v)
        for q in queries:
            if self.kind == "fuzzy":
                aut = fuzzy_automaton(q, p.get("d", 2),
                                      p.get("same_prefix_len", 0),
                                      p.get("damerau", False))
            elif self.kind == "prefix":
                aut = PrefixAutomaton(q)
            elif self.kind == "match":
                aut = StrAutomaton(q)
            else:  # pragma: no cover
                raise ValueError(f"unsupported batch query kind {self.kind}")
            for lo, hi, fst in self.fsts:
                if _query_prunes(self.kind, p, q, lo, hi):
                    self.pruned += 1
                    continue
                self.probes += 1
                for k, v in fst.search(aut):
                    out_q.append(q)
                    out_k.append(k)
                    out_v.append(v)
        return self._result(out_q, out_k, out_v)

    def _result(self, out_q, out_k, out_v) -> pa.Table:
        cols = {"query": pa.array(out_q, pa.large_string()),
                "key": pa.array(out_k, pa.large_string())}
        if self.has_output:
            cols["value"] = pa.array(out_v, pa.uint64())
        return pa.table(cols)


def search_dictionary_many(index_ds, queries_ds, kind: str = "fuzzy",
                           has_output: bool = True,
                           concurrency=(1, 8), batch_size: int = 256,
                           broadcast_max_bytes: int = 256 * 2 ** 20,
                           **params):
    """Probe MANY query strings against the dictionary with an actor
    pool: ``queries_ds`` has a ``query`` column; output is
    ``(query, key[, value])`` rows for every hit.

    Two execution paths, chosen by total index size:

    - **broadcast** (index ≤ ``broadcast_max_bytes``): the FST blobs go
      to the object store once (``ray.put``) and every searcher actor
      probes all partitions — right for dictionary-sized indexes hit by
      many queries.
    - **sharded** (bigger indexes): the index NEVER crosses the driver.
      Queries fan out to (partition, query) rows — pruned by each
      partition's [part_lo, part_hi] key range where the query kind
      allows — and ONE sort on the partition key co-locates each FST
      blob with its query group; every blob is deserialized once per
      block and probed against its co-located queries.
    """
    import pyarrow.compute as pc
    import ray

    # validate the kind BEFORE choosing an execution path: otherwise a
    # bigger-than-broadcast index would turn an unsupported kind into a
    # runtime error chosen implicitly by index size
    if kind not in ("fuzzy", "prefix", "match"):
        raise ValueError(
            f"search_dictionary_many supports kinds 'fuzzy', 'prefix' "
            f"and 'match' (got {kind!r}); for 'range'/'all' queries use "
            "search_dictionary, which needs no per-query probe string")

    # both paths scan the index more than once (size probe + ranges +
    # blobs); pin the blocks in the object store so a lazily-built
    # index isn't recomputed per pass (spillable, never driver memory)
    index_ds = index_ds.materialize()

    sizes = index_ds.map_batches(
        lambda t: pa.table({"b": pa.array(
            [int(pc.sum(pc.binary_length(t["fst"])).as_py() or 0)],
            pa.int64())}), batch_format="pyarrow")
    nbytes = sum(r["b"] for r in sizes.take_all())

    if nbytes <= broadcast_max_bytes:
        # blobs travel WITH their [part_lo, part_hi] ranges so each
        # actor can reuse the sharded path's per-query range prune
        blobs = [(r["part_lo"], r["part_hi"], r["fst"]) for r in
                 index_ds.select_columns(
                     ["part_lo", "part_hi", "fst"]).take_all()]
        ref = ray.put(blobs)
        return queries_ds.map_batches(
            FstSearcherPool,
            fn_constructor_args=(ref, kind, params, has_output),
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, num_cpus=1)
    return _search_many_sharded(index_ds, queries_ds, kind, has_output,
                                params)


def _query_prunes(kind: str, params: dict, q: str, lo: str,
                  hi: str) -> bool:
    """True when query ``q`` cannot match a partition spanning
    [lo, hi]. Mirrors _Searcher.prunes per query string."""
    if kind == "match":
        return q < lo or q > hi
    if kind == "prefix":
        return hi < q or lo[:len(q)] > q
    if kind == "fuzzy":
        spl = params.get("same_prefix_len", 0)
        if spl > 0:
            pre = q[:spl]
            return hi < pre or lo[:len(pre)] > pre
    return False


def _search_many_sharded(index_ds, queries_ds, kind: str,
                         has_output: bool, params: dict):
    """queries × index-partition-ranges join: only the O(partitions)
    RANGE LIST (two strings per partition, not the blobs) touches the
    driver; blobs move through one co-locating sort."""
    ranges = sorted(
        (r["part_lo"], r["part_hi"])
        for r in index_ds.select_columns(["part_lo", "part_hi"])
        .take_all())

    def expand(t: pa.Table) -> pa.Table:
        out_p, out_q = [], []
        for q in t["query"].to_pylist():
            for lo, hi in ranges:
                if not _query_prunes(kind, params, q, lo, hi):
                    out_p.append(lo)
                    out_q.append(q)
        return pa.table({
            "part": pa.array(out_p, pa.large_string()),
            "query": pa.array(out_q, pa.large_string()),
            "fst": pa.nulls(len(out_p), pa.large_binary()),
        })

    def tag_index(t: pa.Table) -> pa.Table:
        return pa.table({
            "part": t["part_lo"].cast(pa.large_string()),
            "query": pa.nulls(t.num_rows, pa.large_string()),
            "fst": t["fst"].cast(pa.large_binary()),
        })

    q_tag = queries_ds.map_batches(expand, batch_format="pyarrow")
    i_tag = index_ds.map_batches(tag_index, batch_format="pyarrow")

    def probe(t: pa.Table) -> pa.Table:
        from orchid_fst_ray.functions.runs import run_bounds
        out_q: list[str] = []
        out_k: list[str] = []
        out_v: list[int] = []
        if t.num_rows:
            queries = t["query"].to_pylist()
            blobs = t["fst"].to_pylist()
            aut_cache: dict[str, Any] = {}
            bounds = run_bounds(t["part"])
            from orchid_fst_ray.fst.batch_fuzzy import MAX_BATCH_D
            batched = (kind == "fuzzy"
                       and not params.get("same_prefix_len", 0)
                       and params.get("d", 2) <= MAX_BATCH_D)
            for s, e in zip(bounds[:-1], bounds[1:]):
                blob = next((blobs[i] for i in range(s, e)
                             if blobs[i] is not None), None)
                if blob is None:
                    continue
                fst = Fst.from_bytes(blob)
                if batched:
                    # all co-located queries of this partition walk
                    # the blob level-synchronously
                    from orchid_fst_ray.fst.batch_fuzzy import (
                        batch_fuzzy_matches)
                    grp = [queries[i] for i in range(s, e)
                           if queries[i] is not None]
                    qi, mv, mk = batch_fuzzy_matches(
                        fst, grp, params.get("d", 2),
                        params.get("damerau", False), return_keys=True)
                    out_q.extend(grp[i] for i in qi.tolist())
                    out_k.extend(mk)
                    out_v.extend(mv.tolist())
                    continue
                for i in range(s, e):
                    q = queries[i]
                    if q is None:
                        continue
                    aut = aut_cache.get(q)
                    if aut is None:
                        if kind == "fuzzy":
                            aut = fuzzy_automaton(
                                q, params.get("d", 2),
                                params.get("same_prefix_len", 0),
                                params.get("damerau", False))
                        elif kind == "prefix":
                            aut = PrefixAutomaton(q)
                        elif kind == "match":
                            aut = StrAutomaton(q)
                        else:  # pragma: no cover
                            raise ValueError(
                                f"unsupported batch query kind {kind}")
                        aut_cache[q] = aut
                    for k, v in fst.search(aut):
                        out_q.append(q)
                        out_k.append(k)
                        out_v.append(v)
        cols = {"query": pa.array(out_q, pa.large_string()),
                "key": pa.array(out_k, pa.large_string())}
        if has_output:
            cols["value"] = pa.array(
                np.asarray(out_v, dtype=np.uint64), pa.uint64())
        return pa.table(cols)

    return q_tag.union(i_tag).sort("part").map_batches(
        probe, batch_size=None, batch_format="pyarrow")
