"""Fixed-point k-means (pipelines/ml.py): parity with a local numpy
replay of the exact integer recurrence, empty-cluster handling, arg
validation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _emb_table(n: int = 60, dim: int = 5, seed: int = 11) -> pa.Table:
    rng = np.random.default_rng(seed)
    # three separated blobs + noise, float32 like the parquet column
    centers = rng.normal(0, 3, (3, dim))
    vecs = (centers[np.arange(n) % 3]
            + rng.normal(0, 0.3, (n, dim))).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))})


def _kmeans_numpy(tbl: pa.Table, k: int, iters: int,
                  scale: int = 1_000_000) -> dict[int, int]:
    ids = np.asarray(tbl["vec_id"].to_pylist())
    vecs = np.asarray(tbl["embedding"].to_pylist(), np.float32)
    Q = np.floor(vecs.astype(np.float64) * scale).astype(np.int64)
    order = np.argsort(ids)
    C = Q[order[:k]].copy()

    def assign(C_):
        d = Q[:, None, :] - C_[None, :, :]
        return np.argmin((d * d).sum(axis=2), axis=1)

    for _ in range(iters):
        a = assign(C)
        for c in range(k):
            m = a == c
            if m.any():
                # exact integer floor division, like the engine
                C[c] = [int(s) // int(m.sum())
                        for s in Q[m].sum(axis=0, dtype=np.int64)]
    return dict(zip(ids.tolist(), assign(C).tolist()))


def _ds(tbl, parts=4):
    import ray.data as rd
    return rd.from_arrow(tbl).repartition(parts)


@pytest.mark.parametrize("k,iters", [(3, 2), (4, 0), (7, 3)])
def test_kmeans_matches_numpy(ray_session, k, iters):
    from orchid_fst_ray.pipelines.ml import kmeans_fixedpoint
    tbl = _emb_table()
    got = kmeans_fixedpoint(_ds(tbl), k=k, iters=iters).to_pandas()
    want = _kmeans_numpy(tbl, k, iters)
    assert dict(zip(got["vec_id"], got["cluster"])) == want
    assert list(got["vec_id"]) == sorted(want)


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    """Two seed vectors coincide → one cluster goes empty on round 1
    (ties assign to the smaller cid); its centroid must persist and
    the run must still match the numpy replay."""
    from orchid_fst_ray.pipelines.ml import kmeans_fixedpoint
    vecs = [[0.0, 0.0], [0.0, 0.0], [5.0, 5.0], [5.1, 5.0],
            [0.1, 0.0], [4.9, 5.1]]
    tbl = pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32()))})
    got = kmeans_fixedpoint(_ds(tbl, 2), k=2, iters=2).to_pandas()
    want = _kmeans_numpy(tbl, 2, 2)
    assert dict(zip(got["vec_id"], got["cluster"])) == want


def test_kmeans_k_exceeds_rows(ray_session):
    from orchid_fst_ray.pipelines.ml import kmeans_fixedpoint
    tbl = _emb_table(n=3)
    with pytest.raises(ValueError):
        kmeans_fixedpoint(_ds(tbl, 1), k=5, iters=1)
