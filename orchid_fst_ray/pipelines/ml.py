"""Distributed iterative ML over embedding columns: fixed-point
Lloyd's k-means.

The engine's iterative-algorithm pattern (same family as
``pipelines/graphs.pagerank_int``): all arithmetic is FIXED-POINT
INTEGER — embeddings quantize to ``floor(x * scale)`` int64 once, and
every centroid update is an integer sum + floor division — so the
distributed result is bit-identical regardless of partial-sum order,
which is what lets an unrolled DuckDB CTE replay the whole iteration
value-for-value (float k-means would drift with reduction order and
could never carry an exact oracle).

Scale shape per iteration: centroids are a k×dim int64 matrix —
broadcast once via ``ray.put`` — and the data makes ONE streaming
``map_batches`` pass emitting per-block partial (cluster, count,
coordinate-sum) rows; the driver folds blocks×k tiny rows in exact
Python ints (no int64 overflow however many rows a cluster holds).
No shuffle anywhere: the only all-to-all in the whole algorithm is
the optional final sort of assignments.

Reference attribution: the reference engine has no ML surface; this
operator exists for the training-data-pipeline tier (clustering
embeddings for data curation / IVF cell assignment — the same cells
``pipelines/similarity.ann_topk_ivf`` probes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["kmeans_fixedpoint"]


def _quantize(col, scale: int) -> np.ndarray:
    """list<float> column → (n, dim) int64 matrix of
    ``floor(float64(x) * scale)`` — float32→float64 widening and one
    double multiply, so DuckDB's ``floor(CAST(x AS DOUBLE) * scale)``
    reproduces every cell exactly."""
    from orchid_fst_ray.pipelines.dedup import _vec_matrix
    return np.floor(_vec_matrix(col) * scale).astype(np.int64)


def kmeans_fixedpoint(ds, vec_col: str = "embedding",
                      id_col: str = "vec_id", k: int = 8,
                      iters: int = 2, scale: int = 1_000_000):
    """→ (vec_id:int64, cluster:int64) after ``iters`` Lloyd rounds.

    - init: the ``k`` vectors with the smallest ids, cluster id =
      id-rank (deterministic; a k-means++ init would need a sequential
      sampling pass and breaks SQL replay).
    - assign: argmin over clusters of the integer squared L2 distance,
      ties → smallest cluster id (numpy argmin == SQL
      ``row_number() ORDER BY dist, cid``).
    - update: centroid coordinate = floor(Σ qx / count) in exact
      integer arithmetic; an EMPTY cluster keeps its previous
      centroid.
    """
    import ray

    if k < 1 or iters < 0:
        raise ValueError("k >= 1 and iters >= 0 required")

    slim = ds.select_columns([id_col, vec_col]).materialize()

    # init: per-block k-smallest-id combiner, then a driver fold of
    # blocks×k candidate rows — no global sort for a k-row seed
    def local_topk(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        idx = pc.sort_indices(t, sort_keys=[(id_col, "ascending")])
        return t.take(idx[:k])

    cand = pa.concat_tables(
        b for b in ray.get(
            slim.map_batches(local_topk, batch_format="pyarrow")
            .to_arrow_refs())
        if b.num_rows)
    order = np.argsort(cand[id_col].combine_chunks().to_numpy(
        zero_copy_only=False))[:k]
    seeds = cand.take(pa.array(order))
    centroids = _quantize(seeds[vec_col], scale)     # (k, dim) int64
    if len(centroids) < k:
        raise ValueError(f"k={k} exceeds dataset rows {len(centroids)}")
    dim = centroids.shape[1]

    def _assign(Q: np.ndarray, C: np.ndarray) -> np.ndarray:
        # (n, k) integer squared distances; chunk n to bound the
        # n×k×dim temp. argmin's first-match tie-break == smallest cid
        out = np.empty(len(Q), np.int64)
        step = max(1, (1 << 22) // max(1, C.shape[0] * C.shape[1]))
        for s in range(0, len(Q), step):
            d = Q[s:s + step, None, :] - C[None, :, :]
            out[s:s + step] = np.argmin((d * d).sum(axis=2), axis=1)
        return out

    for _ in range(iters):
        ref = ray.put(centroids)

        class Partial:
            def __init__(self) -> None:
                self.C = ray.get(ref)            # once per actor

            def __call__(self, t: pa.Table) -> pa.Table:
                if t.num_rows == 0:
                    return pa.table({
                        "cid": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                        "sums": pa.array([], pa.large_binary())})
                Q = _quantize(t[vec_col], scale)
                a = _assign(Q, self.C)
                cids, inv, cnt = np.unique(a, return_inverse=True,
                                           return_counts=True)
                sums = np.zeros((len(cids), Q.shape[1]), np.int64)
                np.add.at(sums, inv, Q)
                return pa.table({
                    "cid": pa.array(cids, pa.int64()),
                    "cnt": pa.array(cnt.astype(np.int64)),
                    "sums": pa.array([r.tobytes() for r in sums],
                                     pa.large_binary())})

        # driver fold of blocks×k partial rows in EXACT Python ints
        # (a cluster summing 1e12 quantized coords would overflow
        # int64; arbitrary-precision here costs k×dim ops per block)
        tot_cnt = [0] * k
        tot_sum = [[0] * dim for _ in range(k)]
        for part in ray.get(
                slim.map_batches(Partial, batch_format="pyarrow",
                                 concurrency=(1, 8), num_cpus=1)
                .to_arrow_refs()):
            if part.num_rows == 0:
                continue
            pc_ = part["cid"].to_pylist()
            pn = part["cnt"].to_pylist()
            for row_i, (cid, n_) in enumerate(zip(pc_, pn)):
                tot_cnt[cid] += n_
                srow = np.frombuffer(part["sums"][row_i].as_py(),
                                     np.int64)
                ts = tot_sum[cid]
                for d_ in range(dim):
                    ts[d_] += int(srow[d_])
        new_c = centroids.copy()
        for c in range(k):
            if tot_cnt[c] > 0:
                new_c[c] = [s // tot_cnt[c] for s in tot_sum[c]]
        centroids = new_c

    ref = ray.put(centroids)

    class Assign:
        def __init__(self) -> None:
            self.C = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "cluster": pa.array([], pa.int64())})
            Q = _quantize(t[vec_col], scale)
            return pa.table({
                id_col: t[id_col].cast(pa.int64()),
                "cluster": pa.array(_assign(Q, self.C), pa.int64())})

    return (slim.map_batches(Assign, batch_format="pyarrow",
                             concurrency=(1, 8), num_cpus=1)
            .sort(id_col))
