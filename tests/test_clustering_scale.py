"""Adversarial-scale clustering fixtures + the pinned Ray sort invariant.

The engine's cheap-join idiom (sort on the group key → process complete
key-runs per block) relies on Ray 2.49's range-partition sort placing
ALL rows with an equal key in one output block. That is an undocumented
internal (``find_partition_index`` side='left'); if a Ray upgrade
splits reduce outputs or changes boundary tie-side these tests go red
before any silent wrong answers ship.
"""

import pyarrow as pa
import pytest


def _labels_dict(cc_ds):
    out = {}
    for b in cc_ds.iter_batches(batch_format="pyarrow"):
        out.update(zip(b["url"].to_pylist(), b["cluster_id"].to_pylist()))
    return out


def _edges_ds(pairs):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "url_a": pa.array([a for a, _ in pairs], pa.string()),
        "url_b": pa.array([b for _, b in pairs], pa.string()),
    })).repartition(8)


@pytest.mark.parametrize("salt", [None, 4])
def test_mega_component_star_chain(ray_session, salt):
    """ONE component holding every node — an 800-leaf star welded to a
    64-node chain — through the distributed loop (driver_threshold=0),
    both unsalted and salted. Labels must equal driver union-find."""
    from orchid_fst_ray.stages.clustering import (
        connected_components, union_find_components)
    hub = "n1500"
    pairs = [(hub, f"s{i:05d}") for i in range(800)]
    pairs += [(f"c{i:04d}", f"c{i + 1:04d}") for i in range(64)]
    pairs.append(("c0000", hub))
    oracle = union_find_components(pairs)

    cc = connected_components(
        _edges_ds(pairs), num_partitions=4, driver_threshold=0,
        salt_partitions=salt)
    got = _labels_dict(cc)
    assert got == oracle
    assert len(set(got.values())) == 1


@pytest.mark.parametrize("salt", [None, 2])
def test_high_diameter_chain_pointer_jumping(ray_session, salt):
    """A 300-node path graph (diameter 300 ≫ 10 linear rounds)
    converges only because pointer jumping doubles label reach per
    round — on BOTH the salted and unsalted branches."""
    from orchid_fst_ray.stages.clustering import (
        connected_components, union_find_components)
    pairs = [(f"p{i:04d}", f"p{i + 1:04d}") for i in range(300)]
    oracle = union_find_components(pairs)
    cc = connected_components(
        _edges_ds(pairs), num_partitions=4, driver_threshold=0,
        max_iters=10, salt_partitions=salt)
    got = _labels_dict(cc)
    assert got == oracle


def test_nonconvergence_warns(ray_session):
    """Exhausting max_iters without a fixpoint must WARN, not silently
    return split components."""
    from orchid_fst_ray.stages.clustering import connected_components
    pairs = [(f"p{i:04d}", f"p{i + 1:04d}") for i in range(120)]
    with pytest.warns(RuntimeWarning, match="did not reach"):
        cc = connected_components(
            _edges_ds(pairs), num_partitions=2, driver_threshold=0,
            max_iters=2)
        cc.materialize()


def test_ray_sort_colocates_equal_keys(ray_session):
    """PINNED INVARIANT (Ray 2.49.2): after ``ds.sort(key)`` every run
    of an equal key lives in exactly one block — even with heavy
    duplicate skew (one key = 50% of all rows) and many input blocks.
    Sort-merge joins, sorted-run reduces, setops, sessionize and the
    dedup run-reduces all depend on this."""
    import ray.data as rd
    hot = ["hot"] * 5000
    rest = [f"k{i:05d}" for i in range(5000)]
    ds = rd.from_arrow(pa.table({
        "key": pa.array(hot + rest, pa.string()),
        "v": pa.array(range(10000), pa.int64()),
    })).repartition(16).sort("key")

    first_last = []
    for bundle in ds.materialize().iter_internal_ref_bundles():
        import ray
        for ref, meta in bundle.blocks:
            if not meta.num_rows:
                continue
            t = ray.get(ref)
            keys = t["key"]
            first_last.append((keys[0].as_py(), keys[-1].as_py()))
    # blocks arrive in sorted order; adjacent blocks must not share a key
    for (_, last), (first, _) in zip(first_last, first_last[1:]):
        assert last != first, (
            "Ray sort split an equal-key run across blocks — the "
            "engine's sorted-run merge idiom is no longer safe on this "
            "Ray version")


def test_randomized_graphs_match_union_find(ray_session):
    """Seeded random graphs (mixed components, self-loops, duplicate
    edges, num_partitions larger than some buckets' content) through
    the BSP path must equal driver union-find exactly."""
    import random
    from orchid_fst_ray.stages.clustering import (
        connected_components, union_find_components)
    for seed in (3, 17):
        rnd = random.Random(seed)
        nodes = [f"n{i:04d}" for i in range(rnd.randrange(50, 200))]
        pairs = [(rnd.choice(nodes), rnd.choice(nodes))
                 for _ in range(rnd.randrange(30, 300))]
        pairs += [(n, n) for n in rnd.sample(nodes, 5)]   # self-loops
        pairs += pairs[:10]                               # duplicates
        oracle = union_find_components(pairs)
        cc = connected_components(
            _edges_ds(pairs), num_partitions=8, driver_threshold=0)
        assert _labels_dict(cc) == oracle, f"seed {seed}"


def test_bsp_with_seeds_includes_singletons(ray_session):
    """nodes_ds seeding through the BSP path: edge-free nodes come back
    as singletons, edge nodes get component labels."""
    import ray.data as rd
    import pyarrow as pa
    from orchid_fst_ray.stages.clustering import connected_components
    pairs = [("a", "b"), ("b", "c"), ("x", "y")]
    seeds = rd.from_arrow(pa.table({
        "url": pa.array(["a", "b", "c", "x", "y", "lonely1", "lonely2"])}))
    cc = connected_components(_edges_ds(pairs), nodes_ds=seeds,
                              num_partitions=4, driver_threshold=0)
    got = _labels_dict(cc)
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x",
                   "lonely1": "lonely1", "lonely2": "lonely2"}


def test_bucket_of_buffer_hash_edge_cases():
    """The buffer-level routing hash must be consistent across
    chunked / sliced / plain layouts of the SAME values (routing
    consistency is the BSP co-partitioning invariant) and spread
    load roughly uniformly."""
    import numpy as np
    import pyarrow as pa

    from orchid_fst_ray.stages.clustering import _bucket_of

    vals = ["", "a", "n1", "n12345678", "x" * 50,
            "http://example.com/page1.html",
            "http://example.com/page2.html"] * 3
    plain = pa.array(vals, pa.string())
    chunked = pa.chunked_array([pa.array(vals[:5]), pa.array(vals[5:])])
    padded = pa.array(["PAD1", "PAD2"] + vals + ["PAD3"])
    sliced = padded.slice(2, len(vals))
    b0 = _bucket_of(plain, 8)
    assert (b0 == _bucket_of(chunked, 8)).all()
    assert (b0 == _bucket_of(sliced, 8)).all()
    # same value -> same bucket, regardless of position
    assert b0[0] == b0[7] and b0[3] == b0[10]
    # uniformity on realistic keys
    keys = pa.array([f"n{i}" for i in range(20000)])
    counts = np.bincount(_bucket_of(keys, 16), minlength=16)
    assert counts.min() > 20000 / 16 * 0.7, counts
    # empty input
    assert _bucket_of(pa.array([], pa.string()), 4).shape == (0,)
    # degenerate blocks: all-empty-string / all-null values have a
    # zero-length (or absent) data buffer — must not crash, and the
    # empty string must land in the same bucket as it does in a mixed
    # block (routing consistency)
    all_empty = _bucket_of(pa.array(["", "", ""], pa.string()), 8)
    assert all_empty.shape == (3,)
    assert (all_empty == all_empty[0]).all()
    assert all_empty[0] == b0[0]  # "" is vals[0] in the mixed block
    all_null = _bucket_of(pa.array([None, None], pa.string()), 8)
    assert all_null.shape == (2,)
    mixed_null = _bucket_of(pa.array(["a", None, ""], pa.string()), 8)
    assert mixed_null[0] == b0[1] and mixed_null[2] == b0[0]


def test_fused_bsp_task_edge_cases():
    """The fused encode/merge layers must survive empty parts and
    seed-only buckets (pure task functions — no Ray needed)."""
    from orchid_fst_ray.stages import clustering as C

    out = C._encode_local_task(4, 1, C._empty(C._EDGE_SCHEMA),
                               C._empty(C._EDGE_SCHEMA))
    assert len(out) == 2 + 4 and out[0].num_rows == 0

    fin = C._encode_finish_task(C._empty(C._STATE_SCHEMA))
    assert isinstance(fin, list) and len(fin) == 2
    assert fin[0].num_rows == 0 and fin[1].num_rows == 0

    # min-merge over concatenated parts: duplicate nodes collapse to
    # their min label, seed-only nodes stay singletons
    m = C._merge_seed_bucket_task(
        pa.table({"node": ["a", "a", "b"], "label": ["a", "x", "b"]}))
    got = dict(zip(m["node"].to_pylist(), m["label"].to_pylist()))
    assert got == {"a": "a", "b": "b"}

    parts = C._route_pairs_task(pa.table({"u": ["x"], "v": ["y"]}),
                                "u", "v", 2)
    assert sum(p.num_rows for p in parts) == 2   # both directions
