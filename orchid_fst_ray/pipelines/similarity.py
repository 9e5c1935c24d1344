"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once
via ``ray.put``; each batch performs one float64 matmul and emits its
*local* top-k per query (a combiner), so the final groupby(query) merge
only sees ``num_batches × k`` rows per query instead of the full table
(pre-aggregation before the shuffle, SURVEY.md §4.2).

Scale path: random-hyperplane LSH bucketing (``lsh_ann_topk``) — probe
only buckets whose signature is within ``multiprobe`` bits of the
query's, trading recall for a ~``2^bits``-fold candidate reduction.
An IVF variant (``ivf_ann_topk``) uses deterministic k-means centroids
computed on a driver-side sample and probes the ``n_probe`` nearest
cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from orchid_fst_ray.pipelines.dedup import _vec_matrix

__all__ = ["ann_topk", "lsh_ann_topk", "ivf_ann_topk", "collect_queries",
           "knn_edges", "tfidf_pairs"]


def collect_queries(ds, query_ids: list[int], vec_col: str = "embedding",
                    id_col: str = "vec_id"):
    """(ids, unit-norm query matrix) for the given query ids.

    The query side is tiny by definition; one filtered pass over the
    (id, vec) columns collects it driver-side for the broadcast."""
    import pyarrow.compute as pc
    want = pa.array(query_ids, pa.int64())
    parts = []
    for b in (ds.select_columns([id_col, vec_col])
              .iter_batches(batch_format="pyarrow")):
        hit = b.filter(pc.is_in(b[id_col].cast(pa.int64()), value_set=want))
        if hit.num_rows:
            parts.append(hit)
    t = pa.concat_tables(parts)
    ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
    m = _vec_matrix(t[vec_col])
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return ids, m / n[:, None]


def _local_topk_table(qids, ids, cos, k, exclude_self=True):
    """Per-batch combiner: for each query, keep its local top-k rows."""
    out_q, out_id, out_cos = [], [], []
    for qi, q in enumerate(qids):
        c = cos[:, qi]
        mask = ids != q if exclude_self else np.ones(len(ids), bool)
        idx = np.nonzero(mask)[0]
        if len(idx) == 0:
            continue
        # top-k by (cos desc, id asc): argsort on (-cos, id)
        sel = idx[np.lexsort((ids[idx], -c[idx]))[:k]]
        out_q.extend([q] * len(sel))
        out_id.extend(ids[sel].tolist())
        out_cos.extend(c[sel].tolist())
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "vec_id": pa.array(out_id, pa.int64()),
        "cos": pa.array(out_cos, pa.float64()),
    })


def _final_topk(pairs_ds, k: int):
    """groupby(query) merge of local top-k lists → global (rank ≤ k)."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "vec_id", "rank", "cos"]]

    return pairs_ds.groupby("query_id").map_groups(
        merge, batch_format="pandas")


def ann_topk(ds, query_ids: list[int], k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact brute-force cosine top-k for each query id.

    → (query_id, vec_id, rank, cos), rank 1..k by cosine desc (vec_id
    tiebreak), the query row itself excluded.
    """
    import ray
    qids, qmat = collect_queries(ds, query_ids, vec_col, id_col)
    ref = ray.put((qids, qmat))

    class BatchTopK:
        def __init__(self, ref, k):
            self.qids, self.qmat = ray.get(ref)
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
            m = _vec_matrix(t[vec_col])
            n = np.linalg.norm(m, axis=1)
            n[n == 0] = 1.0
            cos = (m / n[:, None]) @ self.qmat.T
            return _local_topk_table(self.qids, ids, cos, self.k)

    local = ds.select_columns([id_col, vec_col]).map_batches(
        BatchTopK, fn_constructor_args=(ref, k),
        batch_format="pyarrow", concurrency=(1, 8), num_cpus=1)
    return _final_topk(local, k)


def _hyperplanes(dim: int, bits: int, seed: int = 0xA11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bits, dim))


def _signatures(unit: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (unit @ planes.T) > 0
    sig = np.zeros(len(unit), dtype=np.uint64)
    for b in range(planes.shape[0]):
        sig |= bits[:, b].astype(np.uint64) << np.uint64(b)
    return sig


def lsh_ann_topk(ds, query_ids: list[int], k: int = 10, bits: int = 8,
                 multiprobe: int = 1, vec_col: str = "embedding",
                 id_col: str = "vec_id", seed: int = 0xA11):
    """Approximate top-k: random-hyperplane signatures; a vector is a
    candidate for a query iff their signatures differ in ≤ ``multiprobe``
    bits. Same output schema as :func:`ann_topk` (recall < 1 by design,
    measured in tests)."""
    import ray
    qids, qmat = collect_queries(ds, query_ids, vec_col, id_col)
    planes = _hyperplanes(qmat.shape[1], bits, seed)
    qsig = _signatures(qmat, planes)
    ref = ray.put((qids, qmat, qsig))

    class BatchLsh:
        def __init__(self, ref, planes, k, multiprobe):
            self.qids, self.qmat, self.qsig = ray.get(ref)
            self.planes = planes
            self.k = k
            self.multiprobe = multiprobe

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
            m = _vec_matrix(t[vec_col])
            n = np.linalg.norm(m, axis=1)
            n[n == 0] = 1.0
            unit = m / n[:, None]
            sig = _signatures(unit, self.planes)
            out = []
            for qi, q in enumerate(self.qids):
                x = np.bitwise_xor(sig, self.qsig[qi])
                ham = np.array([bin(int(v)).count("1") for v in x])
                cand = np.nonzero((ham <= self.multiprobe) & (ids != q))[0]
                if len(cand) == 0:
                    continue
                cos = unit[cand] @ self.qmat[qi]
                sel = cand[np.lexsort((ids[cand], -cos))[:self.k]]
                cs = unit[sel] @ self.qmat[qi]
                out.append(pa.table({
                    "query_id": pa.array([q] * len(sel), pa.int64()),
                    "vec_id": pa.array(ids[sel], pa.int64()),
                    "cos": pa.array(cs, pa.float64()),
                }))
            if not out:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "cos": pa.array([], pa.float64())})
            return pa.concat_tables(out)

    local = ds.select_columns([id_col, vec_col]).map_batches(
        BatchLsh, fn_constructor_args=(ref, planes, k, multiprobe),
        batch_format="pyarrow", concurrency=(1, 8), num_cpus=1)
    return _final_topk(local, k)


def ivf_ann_topk(ds, query_ids: list[int], k: int = 10, n_cells: int = 16,
                 n_probe: int = 4, sample_n: int = 2048, iters: int = 8,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 seed: int = 0x1FF):
    """IVF: deterministic k-means over a driver-side sample → each batch
    keeps only vectors whose nearest centroid is among each query's
    ``n_probe`` closest cells. Same output schema as :func:`ann_topk`."""
    import ray
    qids, qmat = collect_queries(ds, query_ids, vec_col, id_col)

    sample = ds.select_columns([vec_col]).limit(sample_n)
    sm = np.vstack([_vec_matrix(b[vec_col]) for b in
                    sample.iter_batches(batch_format="pyarrow")])
    sn = np.linalg.norm(sm, axis=1)
    sn[sn == 0] = 1.0
    sm = sm / sn[:, None]
    rng = np.random.RandomState(seed)
    cent = sm[rng.choice(len(sm), size=min(n_cells, len(sm)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sm @ cent.T, axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                v = sm[mask].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
    q_cells = np.argsort(-(qmat @ cent.T), axis=1)[:, :n_probe]
    ref = ray.put((qids, qmat, cent, q_cells))

    class BatchIvf:
        def __init__(self, ref, k):
            self.qids, self.qmat, self.cent, self.q_cells = ray.get(ref)
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
            m = _vec_matrix(t[vec_col])
            n = np.linalg.norm(m, axis=1)
            n[n == 0] = 1.0
            unit = m / n[:, None]
            cell = np.argmax(unit @ self.cent.T, axis=1)
            out = []
            for qi, q in enumerate(self.qids):
                cand = np.nonzero(
                    np.isin(cell, self.q_cells[qi]) & (ids != q))[0]
                if len(cand) == 0:
                    continue
                cos = unit[cand] @ self.qmat[qi]
                sel = cand[np.lexsort((ids[cand], -cos))[:self.k]]
                out.append(pa.table({
                    "query_id": pa.array([q] * len(sel), pa.int64()),
                    "vec_id": pa.array(ids[sel], pa.int64()),
                    "cos": pa.array(unit[sel] @ self.qmat[qi], pa.float64()),
                }))
            if not out:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "cos": pa.array([], pa.float64())})
            return pa.concat_tables(out)

    local = ds.select_columns([id_col, vec_col]).map_batches(
        BatchIvf, fn_constructor_args=(ref, k),
        batch_format="pyarrow", concurrency=(1, 8), num_cpus=1)
    return _final_topk(local, k)


def knn_edges(ds, k: int = 3, vec_col: str = "embedding",
              id_col: str = "vec_id",
              broadcast_max_bytes: int = 256 * 2 ** 20):
    """Undirected k-NN graph over the embedding column → canonical
    DISTINCT edges ``(a:int64, b:int64)`` with ``a < b``: each vector
    contributes edges to its ``k`` nearest neighbors by cosine (ties
    cos desc, id asc — the ``ann_topk`` contract).

    DECLARED BASELINE PATH: the full unit-norm matrix is broadcast
    once via ``ray.put`` (size-gated at ``broadcast_max_bytes``) and
    each batch does one (batch × all) matmul — the same small-side
    baseline as ``dedup.embedding_dup_pairs`` brute. Above the gate
    the scale path is the LSH-bucketed neighbor generator
    (``lsh_ann_topk`` / ``embedding_dup_pairs_lsh``); this function
    raises rather than silently degrading."""
    import ray

    mats, idl = [], []
    for t in ray.get(ds.select_columns([id_col, vec_col])
                     .to_arrow_refs()):
        if t.num_rows:
            idl.append(np.asarray(t[id_col].to_pylist(), np.int64))
            mats.append(_vec_matrix(t[vec_col]))
    ids_all = np.concatenate(idl)
    m = np.vstack(mats)
    if m.nbytes > broadcast_max_bytes:
        raise ValueError(
            f"knn_edges baseline gate: matrix {m.nbytes}B > "
            f"{broadcast_max_bytes}B — use the LSH neighbor path")
    order = np.argsort(ids_all)
    ids_all, m = ids_all[order], m[order]
    nrm = np.linalg.norm(m, axis=1)
    nrm[nrm == 0] = 1.0
    ref = ray.put((ids_all, m / nrm[:, None]))

    class Neighbors:
        def __init__(self) -> None:
            self.ids, self.unit = ray.get(ref)    # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"a": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64())})
            bids = np.asarray(t[id_col].to_pylist(), np.int64)
            bm = _vec_matrix(t[vec_col])
            n = np.linalg.norm(bm, axis=1)
            n[n == 0] = 1.0
            cos = (bm / n[:, None]) @ self.unit.T
            # exclude self; stable argsort on -cos keeps the
            # id-ascending column order on ties (= cos desc, id asc)
            self_pos = np.searchsorted(self.ids, bids)
            cos[np.arange(len(bids)), self_pos] = -np.inf
            nb = np.argsort(-cos, axis=1, kind="stable")[:, :k]
            src = np.repeat(bids, nb.shape[1])
            dst = self.ids[nb.ravel()]
            # when k >= n the -inf self column is still selected into
            # the top-k slice; drop self-loops so a < b always holds
            keep = src != dst
            src, dst = src[keep], dst[keep]
            a = np.minimum(src, dst)
            b = np.maximum(src, dst)
            # block-local dedup; cross-block repeats collapse below
            # (packed-key shortcut needs BOTH bounds: a negative id
            # sign-extends in (a << 32) | b and collides keys)
            if len(a) and int(a.min()) >= 0 and int(b.max()) < (1 << 31):
                key = (a << np.int64(32)) | b
                _, first = np.unique(key, return_index=True)
            else:      # id range too wide for the packed-key shortcut
                _, first = np.unique(np.stack([a, b], axis=1), axis=0,
                                     return_index=True)
            return pa.table({"a": pa.array(a[first], pa.int64()),
                             "b": pa.array(b[first], pa.int64())})

    edges = ds.select_columns([id_col, vec_col]).map_batches(
        Neighbors, batch_format="pyarrow", concurrency=(1, 8),
        num_cpus=1)

    def block_unique(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return t.group_by(["a", "b"]).aggregate([])

    # one co-locating sort, then block-local distinct is global
    # distinct (equal keys never split across sorted blocks)
    return (edges.sort(["a", "b"])
            .map_batches(block_unique, batch_size=None,
                         batch_format="pyarrow"))


def tfidf_pairs(docs_ds, n_docs: int, id_col: str = "doc_id",
                text_col: str = "text", min_df: int = 2,
                max_df: int = 32, idf_scale: int = 1000,
                top_n: int = 50):
    """SPARSE similarity join: top-``top_n`` document pairs by
    integer TF-IDF dot product → ``(doc_a, doc_b, dot:int64)``,
    ``doc_a < doc_b``, ties broken by ``(doc_a, doc_b)``.

    Weights are exact integers so the DuckDB oracle replays them
    value-for-value: ``w(doc, tok) = tf · ((n_docs · idf_scale) //
    df)`` (integer-floor idf — no float log). Tokens with
    ``df < min_df`` contribute nothing to any pair; tokens with
    ``df > max_df`` are DROPPED — the prefix-filtering/stopword cap
    that bounds the inverted-index fan-out (a stopword shared by every
    document would otherwise emit O(N²) pairs).

    100 TB shape: per-block (doc, token, tf) partials shrink each
    block to its distinct pairs; ONE co-locating sort on the token key
    (the engine's verified each-key-whole-in-one-block invariant, as
    in ``inverted_index``); each block then expands its tokens'
    posting lists into weighted pairs fully vectorized (the same
    repeat/cumsum triangular construction as ``range_join_window`` —
    per-token fan-out is capped at ``max_df·(max_df-1)/2``); finally
    one groupby shuffle on the (doc_a, doc_b) key sums the dots and a
    descending sort takes the global top-``top_n``."""
    from orchid_fst_ray.pipelines.textstats import _explode_tokens

    def tf_partial(t: pa.Table) -> pa.Table:
        flat, row, _ = _explode_tokens(t[text_col])
        empty = pa.table({"token": pa.array([], pa.large_string()),
                          "doc_id": pa.array([], pa.int64()),
                          "tf": pa.array([], pa.int64())})
        if len(flat) == 0:
            return empty
        ids = t[id_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)[row]
        agg = pa.TableGroupBy(
            pa.table({"token": flat, "doc_id": pa.array(ids)}),
            ["token", "doc_id"]).aggregate([([], "count_all")])
        return pa.table({"token": agg["token"],
                         "doc_id": agg["doc_id"].cast(pa.int64()),
                         "tf": agg["count_all"].cast(pa.int64())})

    def expand_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "prod": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        codes = t["token"].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["doc_id"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        tf = t["tf"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        # order by (token, doc_id) so pairs come out doc_a < doc_b
        order = np.lexsort((ids, codes))
        codes, ids, tf = codes[order], ids[order], tf[order]
        n = len(codes)
        seg = np.concatenate(
            ([0], np.flatnonzero(codes[1:] != codes[:-1]) + 1))
        lens = np.diff(np.concatenate((seg, [n])))
        df_row = np.repeat(lens, lens)           # df per row
        w = tf * ((np.int64(n_docs) * idf_scale) // df_row)
        keep_row = (df_row >= min_df) & (df_row <= max_df)
        # triangular fan-out: row r pairs with the (seg_end - r - 1)
        # rows after it in the same (kept) segment
        seg_end = np.repeat(seg + lens, lens)
        rights = np.where(keep_row,
                          seg_end - np.arange(n) - 1, 0)
        total = int(rights.sum())
        if total == 0:
            return empty
        rep_left = np.repeat(np.arange(n), rights)
        offsets = np.concatenate(([0], np.cumsum(rights)[:-1]))
        within = np.arange(total) - np.repeat(offsets, rights)
        right = rep_left + 1 + within
        return pa.table({
            "doc_a": pa.array(ids[rep_left], pa.int64()),
            "doc_b": pa.array(ids[right], pa.int64()),
            "prod": pa.array(w[rep_left] * w[right], pa.int64())})

    def block_topn(t: pa.Table) -> pa.Table:
        # groupby output blocks hold disjoint (doc_a, doc_b) keys, so
        # block-local top-n is a lossless combiner: the final sort
        # sees ≤ blocks·top_n rows instead of the full pair table
        out = pa.table({
            "doc_a": t["doc_a"].cast(pa.int64()),
            "doc_b": t["doc_b"].cast(pa.int64()),
            "dot": t["dot"].cast(pa.int64())})
        if out.num_rows <= top_n:
            return out
        d = out["dot"].combine_chunks().to_numpy(zero_copy_only=False)
        a = out["doc_a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = out["doc_b"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.lexsort((b, a, -d))[:top_n]
        return out.take(pa.array(np.sort(keep)))

    from ray.data.aggregate import Sum
    return (docs_ds.select_columns([id_col, text_col])
            .map_batches(tf_partial, batch_format="pyarrow")
            .sort("token")
            .map_batches(expand_pairs, batch_size=None,
                         batch_format="pyarrow")
            .groupby(["doc_a", "doc_b"])
            .aggregate(Sum("prod", alias_name="dot"))
            .map_batches(block_topn, batch_size=None,
                         batch_format="pyarrow")
            .sort(["dot", "doc_a", "doc_b"],
                  descending=[True, False, False])
            .limit(top_n))
