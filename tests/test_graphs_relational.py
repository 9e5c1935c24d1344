"""Tests for pagerank_int (pipelines/graphs.py) and bloom_semijoin
(pipelines/relational.py).

Pagerank parity model: a tiny numpy replay of the exact fixed-point
recurrence; both the gated broadcast branch and the forced exchange
branch (broadcast_max_bytes=0) must match it node-for-node.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _edges_ds(pairs):
    import ray.data as rd
    src, dst = zip(*pairs)
    return rd.from_arrow(pa.table({
        "src": pa.array(src, pa.string()),
        "dst": pa.array(dst, pa.string())}))


def _pagerank_numpy(pairs, iters=3, scale=1_000_000, damping=85):
    nodes = sorted({n for e in pairs for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    odeg = np.zeros(len(nodes), np.int64)
    for s, _ in pairs:
        odeg[idx[s]] += 1
    rank = np.full(len(nodes), scale, np.int64)
    base = (100 - damping) * scale // 100
    for _ in range(iters):
        nxt = np.full(len(nodes), base, np.int64)
        for s, d in pairs:
            nxt[idx[d]] += (rank[idx[s]] * damping) // (100 * odeg[idx[s]])
        rank = nxt
    return dict(zip(nodes, rank.tolist()))


PAIRS = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),
         ("a", "c"), ("c", "b"), ("d", "a"), ("a", "d")]


@pytest.mark.parametrize("gate", [256 << 20, 0],
                         ids=["broadcast", "exchange"])
def test_pagerank_matches_numpy(ray_session, gate):
    from orchid_fst_ray.pipelines.graphs import pagerank_int
    got = pagerank_int(_edges_ds(PAIRS), iters=3,
                       broadcast_max_bytes=gate).to_pandas()
    want = _pagerank_numpy(PAIRS)
    assert dict(zip(got["node"], got["rank"])) == want
    assert list(got["node"]) == sorted(want)  # sorted output contract


def test_pagerank_sink_node(ray_session):
    # 'z' has no out-edges: contributes nothing, still receives base
    pairs = [("a", "z"), ("b", "z"), ("a", "b"), ("b", "a")]
    from orchid_fst_ray.pipelines.graphs import pagerank_int
    got = pagerank_int(_edges_ds(pairs), iters=2).to_pandas()
    want = _pagerank_numpy(pairs, iters=2)
    assert dict(zip(got["node"], got["rank"])) == want


def _ds(table):
    import ray.data as rd
    return rd.from_arrow(table)


def test_bloom_semijoin_exact_with_forced_false_positives(ray_session):
    """n_bits=64 at 40 keys saturates the filter — false positives are
    guaranteed; the merge-join verify must still yield the exact
    semi-join."""
    from orchid_fst_ray.pipelines.relational import bloom_semijoin
    probe = pa.table({
        "k": pa.array(list(range(200)), pa.int64()),
        "v": pa.array([f"p{i}" for i in range(200)])})
    keys = pa.table({"k": pa.array(list(range(0, 200, 5)), pa.int64())})
    out = bloom_semijoin(_ds(probe), _ds(keys), key="k",
                         n_bits=64, n_hashes=2).to_pandas()
    assert sorted(out["k"]) == list(range(0, 200, 5))
    assert set(out.columns) == {"k", "v"}


def test_bloom_semijoin_string_keys_and_dup_keyside(ray_session):
    from orchid_fst_ray.pipelines.relational import bloom_semijoin
    probe = pa.table({"k": pa.array(["a", "b", "c", "d", "e"]),
                      "v": pa.array([1, 2, 3, 4, 5], pa.int64())})
    keys = pa.table({"k": pa.array(["b", "d", "b", "d", "zz"])})
    out = bloom_semijoin(_ds(probe), _ds(keys), key="k",
                         keys_unique=False).to_pandas()
    # dup keys must NOT multiply probe rows
    assert sorted(zip(out["k"], out["v"])) == [("b", 2), ("d", 4)]


def test_bloom_antijoin_exact_with_forced_false_positives(ray_session):
    """Saturated filter (n_bits=64, 40 keys): most non-members Bloom-hit
    and must be rescued by the left-anti verify; semi ∪ anti must
    partition the probe side exactly."""
    from orchid_fst_ray.pipelines.relational import (bloom_antijoin,
                                                     bloom_semijoin)
    probe = pa.table({
        "k": pa.array(list(range(200)), pa.int64()),
        "v": pa.array([f"p{i}" for i in range(200)])})
    keys = pa.table({"k": pa.array(list(range(0, 200, 5)), pa.int64())})
    anti = bloom_antijoin(_ds(probe), _ds(keys), key="k",
                          n_bits=64, n_hashes=2).to_pandas()
    want = [i for i in range(200) if i % 5 != 0]
    assert sorted(anti["k"]) == want
    semi = bloom_semijoin(_ds(probe), _ds(keys), key="k",
                          n_bits=64, n_hashes=2).to_pandas()
    assert sorted(list(anti["k"]) + list(semi["k"])) == list(range(200))


def test_bloom_antijoin_string_keys(ray_session):
    from orchid_fst_ray.pipelines.relational import bloom_antijoin
    probe = pa.table({"k": pa.array(["a", "b", "c", "d", "e"]),
                      "v": pa.array([1, 2, 3, 4, 5], pa.int64())})
    keys = pa.table({"k": pa.array(["b", "d", "zz"])})
    out = bloom_antijoin(_ds(probe), _ds(keys), key="k").to_pandas()
    assert sorted(zip(out["k"], out["v"])) == [
        ("a", 1), ("c", 3), ("e", 5)]


def test_bloom_semijoin_rejects_bad_nbits(ray_session):
    from orchid_fst_ray.pipelines.relational import bloom_semijoin
    with pytest.raises(ValueError):
        bloom_semijoin(None, None, key="k", n_bits=100)


def _tri_edges():
    # two triangles sharing an edge + a pendant: nodes 0-4
    # edges: (0,1)(0,2)(1,2)(1,3)(2,3)(3,4)
    return pa.table({
        "a": pa.array([0, 0, 1, 1, 2, 3], pa.int64()),
        "b": pa.array([1, 2, 2, 3, 3, 4], pa.int64())})


@pytest.mark.parametrize("gate", [256 << 20, 0],
                         ids=["broadcast", "exchange"])
def test_triangle_count_known_graph(ray_session, gate):
    import ray.data as rd
    from orchid_fst_ray.pipelines.graphs import triangle_count
    got = triangle_count(rd.from_arrow(_tri_edges()).repartition(3),
                         broadcast_max_bytes=gate).to_pandas()
    row = got.iloc[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (5, 6, 2)


def test_triangle_count_triangle_free(ray_session):
    import ray.data as rd
    from orchid_fst_ray.pipelines.graphs import triangle_count
    star = pa.table({"a": pa.array([0, 0, 0], pa.int64()),
                     "b": pa.array([1, 2, 3], pa.int64())})
    got = triangle_count(rd.from_arrow(star)).to_pandas()
    assert int(got.iloc[0].n_triangles) == 0
    # degree orientation points every leaf AT the hub, so each leaf
    # has out-degree 1 and the star generates ZERO wedges — exactly
    # the hub-taming property the orientation buys at scale
    assert int(got.iloc[0].n_wedges) == 0


def test_knn_edges_matches_numpy(ray_session):
    import ray.data as rd
    from orchid_fst_ray.pipelines.similarity import knn_edges
    rng = np.random.default_rng(5)
    vecs = rng.normal(0, 1, (40, 8)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))})
    got = knn_edges(rd.from_arrow(tbl).repartition(4), k=2).to_pandas()
    unit = vecs.astype(np.float64)
    unit /= np.linalg.norm(unit, axis=1)[:, None]
    cos = unit @ unit.T
    np.fill_diagonal(cos, -np.inf)
    want = set()
    for i in range(40):
        for j in np.argsort(-cos[i], kind="stable")[:2]:
            want.add((min(i, int(j)), max(i, int(j))))
    assert set(zip(got["a"], got["b"])) == want
    assert len(got) == len(want)          # distinct


def test_knn_edges_negative_ids_and_k_ge_n(ray_session):
    """Negative ids must not collide in the packed-key dedup (they
    sign-extend in (a << 32) | b), and k >= n must not emit the
    -inf self column as an a == b self-loop."""
    import ray.data as rd
    from orchid_fst_ray.pipelines.similarity import knn_edges
    rng = np.random.default_rng(9)
    n = 6
    vecs = rng.normal(0, 1, (n, 4)).astype(np.float32)
    ids = [-3, -1, 0, 2, 5, 7]
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))})
    # k >= n: every non-self pair becomes an edge, no self-loops
    got = knn_edges(rd.from_arrow(tbl).repartition(2), k=n + 2
                    ).to_pandas()
    assert (got["a"] < got["b"]).all()
    want = {(min(a, b), max(a, b))
            for i, a in enumerate(ids) for b in ids[i + 1:]}
    assert set(zip(got["a"], got["b"])) == want
    assert len(got) == len(want)


def test_knn_edges_gate(ray_session):
    import ray.data as rd
    from orchid_fst_ray.pipelines.similarity import knn_edges
    tbl = pa.table({
        "vec_id": pa.array(range(10), pa.int64()),
        "embedding": pa.array([[float(i)] * 4 for i in range(10)],
                              pa.list_(pa.float32()))})
    with pytest.raises(ValueError):
        knn_edges(rd.from_arrow(tbl), k=2, broadcast_max_bytes=8)
