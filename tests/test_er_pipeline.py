"""End-to-end entity-resolution pipeline tests (BASELINE.md targets).

- pairwise F1 >= 0.99 on the labeled-pair fixture at the fixed blocking
  key (FIXTURES.md F2);
- byte-identical extracted text per url vs the frozen EXTRACTOR SPEC v1
  (BASELINE.json input_hint per-row invariant);
- checkpoint resume: a second run skips completed stages and produces an
  identical assignment (north_rule resumability).
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from orchid_fst_ray.pipelines.er import (
    assignment_from_components, evaluate_pairs, run_er,
)
from orchid_fst_ray.pipelines.fixtures import make_pages
from orchid_fst_ray.stages.extract import extract_text


@pytest.fixture(scope="module")
def fixture():
    return make_pages(800, seed=42)


@pytest.fixture(scope="module")
def er_result(ray_session, fixture):
    import ray.data as rd
    pages = rd.from_arrow(fixture["pages"]).repartition(4)
    res = run_er(pages, num_partitions=4, scorer_concurrency=2)
    res["assign_dict"] = assignment_from_components(res["assignment"])
    return res


def test_extraction_byte_identical(fixture):
    """Per-row invariant: extractor output == the pages.text column."""
    pages = fixture["pages"]
    for html, text in zip(pages["html"].to_pylist(),
                          pages["text"].to_pylist()):
        assert extract_text(html) == text


def test_pairwise_f1(er_result, fixture):
    ev = evaluate_pairs(er_result["assign_dict"], fixture["labeled_pairs"])
    assert ev["f1"] >= 0.99, ev
    assert ev["precision"] >= 0.99, ev


def test_every_doc_assigned(er_result, fixture):
    assert len(er_result["assign_dict"]) == fixture["pages"].num_rows


def test_clusters_are_transitive_vs_union_find(er_result):
    """Dataset-level label propagation == driver-side union-find."""
    from orchid_fst_ray.stages.clustering import union_find_components
    pairs = []
    for b in er_result["scored"].iter_batches(batch_format="pyarrow"):
        pairs.extend(zip(b["url_a"].to_pylist(), b["url_b"].to_pylist()))
    oracle = union_find_components(pairs)
    got = er_result["assign_dict"]
    for node, root in oracle.items():
        assert got[node] == root


def test_distributed_label_propagation_path(er_result):
    """Force the distributed min-label loop (driver_threshold=0) and
    assert it produces the same assignment as the fast path."""
    from orchid_fst_ray.stages.clustering import connected_components
    from orchid_fst_ray.pipelines.er import assignment_from_components
    cc = connected_components(
        er_result["scored"], nodes_ds=er_result["docs"], node_col="url",
        num_partitions=4, driver_threshold=0)
    got = assignment_from_components(cc)
    assert got == er_result["assign_dict"]


def test_hot_block_path_equals_normal_path(ray_session, fixture):
    """The mega-block (broadcast-FST actor-pool) candidate path must
    generate the same candidate pairs as the per-group path."""
    import ray.data as rd
    from orchid_fst_ray.stages.candidates import generate_candidates
    from orchid_fst_ray.stages.extract import ExtractNormalize
    pages = rd.from_arrow(fixture["pages"]).repartition(4)
    docs = pages.map_batches(ExtractNormalize(),
                             batch_format="pyarrow").materialize()

    def pair_set(ds):
        out = set()
        for b in ds.iter_batches(batch_format="pyarrow"):
            out |= set(zip(b["url_a"].to_pylist(), b["url_b"].to_pylist()))
        return out

    normal = pair_set(generate_candidates(docs, d=2, damerau=True,
                                          hot_block_rows=None))
    # force EVERY block through the hot path
    hot = pair_set(generate_candidates(docs, d=2, damerau=True,
                                       hot_block_rows=1, num_partitions=4))
    assert hot == normal

    # force the GATED (grouped) hot path: a 1-byte broadcast budget
    # bin-packs every hot block into its own group, exercising the
    # per-group probe passes + union — pairs must be identical
    from orchid_fst_ray.stages.candidates import generate_hot_candidates
    slim = docs.select_columns(["url", "doc_key", "host"])
    gated = pair_set(generate_hot_candidates(
        slim, d=2, damerau=True, broadcast_max_bytes=1,
        probe_concurrency=(1, 2)))
    assert gated == normal


def test_slice_tier_equals_normal_path(ray_session, fixture):
    """The slice-replicated middle tier (full-host trie per task, one
    contiguous query-rank slice per task) must generate the same pairs
    as the per-group path — with many slices forced (slice_rows=8) and
    with a per-query match budget in play (budget = cap smallest
    matched ranks, query-local, so slicing can't change it)."""
    import ray.data as rd
    from orchid_fst_ray.stages.candidates import generate_candidates
    from orchid_fst_ray.stages.extract import ExtractNormalize
    pages = rd.from_arrow(fixture["pages"]).repartition(4)
    docs = pages.map_batches(ExtractNormalize(),
                             batch_format="pyarrow").materialize()

    def pair_set(ds):
        out = set()
        for b in ds.iter_batches(batch_format="pyarrow"):
            out |= set(zip(b["url_a"].to_pylist(), b["url_b"].to_pylist()))
        return out

    for cap in (64, 2):
        normal = pair_set(generate_candidates(
            docs, d=2, damerau=True, hot_block_rows=None,
            max_pairs_per_key=cap))
        # every block hot, none mega → all through SliceCandidates,
        # slice_rows=8 → K = ceil(rows/8) slices per host
        sliced = pair_set(generate_candidates(
            docs, d=2, damerau=True, hot_block_rows=1, slice_rows=8,
            mega_block_rows=1 << 30, num_partitions=4,
            max_pairs_per_key=cap))
        assert sliced == normal, f"cap={cap}"
        # every block mega → all through the broadcast-shard pool
        mega = pair_set(generate_candidates(
            docs, d=2, damerau=True, hot_block_rows=1,
            mega_block_rows=1, num_partitions=4,
            max_pairs_per_key=cap))
        assert mega == normal, f"cap={cap}"


def test_hot_candidates_driver_holds_refs_not_blobs():
    """Tripwire (the curation pattern): the hot-candidate build stage
    must never pull FST/ids blobs to the driver — build tasks ray.put
    their own shard and only (block, nbytes, ObjectRef) rows cross the
    driver. Also pins the bin-packer's invariants."""
    import inspect
    from orchid_fst_ray.stages import candidates

    src = inspect.getsource(candidates.generate_hot_candidates)
    assert '"fst":' not in src and '"ids":' not in src, \
        "blob columns reappeared in the build output"
    assert "ray.put((fst_bytes" in src, \
        "build tasks must put their own shard blobs"
    for pat in ("iter_batches", "to_pandas", "iter_rows"):
        assert pat not in src, f"driver materialization crept in: {pat}"

    packs = candidates._pack_blocks(
        {"a": 10, "b": 90, "c": 40, "d": 200}, cap=100)
    assert sorted(b for g in packs for b in g) == ["a", "b", "c", "d"]
    for g in packs:
        total = sum({"a": 10, "b": 90, "c": 40, "d": 200}[b] for b in g)
        assert total <= 100 or len(g) == 1  # oversized block alone
    assert ["d"] in packs  # 200 > cap → its own group


def test_shard_layout_invariance(ray_session, fixture):
    """Pairs output must be IDENTICAL however keys scatter across
    shards: the routing hash only decides task grouping (same key →
    same shard keeps the key→id maps whole; disjointness and the
    cap-across-shards budget are layout-free). Pins the vectorized
    hash64 routing against any future hash swap: shard_rows=2 forces
    many shards per block, shard_rows=1<<30 forces one."""
    import ray.data as rd
    from orchid_fst_ray.stages.candidates import generate_hot_candidates
    from orchid_fst_ray.stages.extract import ExtractNormalize
    pages = rd.from_arrow(fixture["pages"]).repartition(4)
    docs = (pages.map_batches(ExtractNormalize(), batch_format="pyarrow")
            .select_columns(["url", "doc_key", "host"]).materialize())

    def pair_set(ds):
        out = set()
        for b in ds.iter_batches(batch_format="pyarrow"):
            out |= set(zip(b["url_a"].to_pylist(),
                           b["url_b"].to_pylist()))
        return out

    one = pair_set(generate_hot_candidates(
        docs, d=2, damerau=True, shard_rows=1 << 30,
        probe_concurrency=(1, 2)))
    many = pair_set(generate_hot_candidates(
        docs, d=2, damerau=True, shard_rows=2,
        probe_concurrency=(1, 2)))
    assert many == one
    assert len(one) > 0


def test_checkpoint_resume(ray_session, fixture, tmp_path):
    import ray.data as rd
    pages = rd.from_arrow(fixture["pages"]).repartition(4)
    ckpt = str(tmp_path / "ckpt")
    r1 = run_er(pages, num_partitions=4, scorer_concurrency=2,
                checkpoint_dir=ckpt, input_fingerprint="fix800")
    a1 = assignment_from_components(r1["assignment"])
    assert not any(row["resumed"] for row in r1["lineage"])

    r2 = run_er(pages, num_partitions=4, scorer_concurrency=2,
                checkpoint_dir=ckpt, input_fingerprint="fix800")
    a2 = assignment_from_components(r2["assignment"])
    assert all(row["resumed"] for row in r2["lineage"])
    assert r2["metrics"]["clusters_resumed"]
    assert a1 == a2


def test_salted_two_phase_label_propagation(er_result):
    """Salted two-phase min aggregation (mega-component skew path)
    produces the identical assignment."""
    from orchid_fst_ray.stages.clustering import connected_components
    from orchid_fst_ray.pipelines.er import assignment_from_components
    cc = connected_components(
        er_result["scored"], nodes_ds=er_result["docs"], node_col="url",
        num_partitions=4, driver_threshold=0, salt_partitions=4)
    got = assignment_from_components(cc)
    assert got == er_result["assign_dict"]


def test_empty_pages_input(ray_session):
    """Zero-page input: the pipeline completes with an empty assignment
    (no crash on empty blocks / empty edge sets)."""
    import ray.data as rd
    pages = rd.from_arrow(pa.table({
        "url": pa.array([], pa.string()),
        "warc_ts": pa.array([], pa.timestamp("ms", tz="UTC")),
        "html": pa.array([], pa.binary()),
        "text": pa.array([], pa.large_string()),
        "lang": pa.array([], pa.string()),
    }))
    res = run_er(pages, num_partitions=2, scorer_concurrency=1)
    assert res["assignment"].count() == 0


def test_partial_resume_after_simulated_crash(ray_session, fixture, tmp_path):
    """Crash-mid-run resume: wipe the LATER stage checkpoints (as if the
    process died between stages), rerun, and verify the early stages
    resume from disk while the later ones recompute — output identical."""
    import shutil
    import ray.data as rd
    pages = rd.from_arrow(fixture["pages"]).repartition(4)
    ckpt = str(tmp_path / "ck")
    r1 = run_er(pages, num_partitions=4, scorer_concurrency=2,
                checkpoint_dir=ckpt, input_fingerprint="crashfix")
    a1 = assignment_from_components(r1["assignment"])
    # simulate a crash after the candidates stage completed
    shutil.rmtree(f"{ckpt}/scored")
    shutil.rmtree(f"{ckpt}/clusters")
    r2 = run_er(pages, num_partitions=4, scorer_concurrency=2,
                checkpoint_dir=ckpt, input_fingerprint="crashfix")
    stages = {row["stage"]: row["resumed"] for row in r2["lineage"]}
    assert stages["docs"] and stages["candidates"]
    assert not stages["scored"] and not stages["clusters"]
    a2 = assignment_from_components(r2["assignment"])
    assert a1 == a2


def test_pages_dataset_chunked_generation(ray_session, monkeypatch):
    """The distributed large-n fixture path must produce exactly
    n_pages globally-unique urls, the input_hint schema, and be
    deterministic for a given (n_pages, seed)."""
    import pyarrow as pa
    import orchid_fst_ray.pipelines.fixtures as fx

    monkeypatch.setattr(fx, "_CHUNKED_THRESHOLD", 500)
    monkeypatch.setattr(fx, "_CHUNK_PAGES", 700)

    def load(seed):
        ds = fx.pages_dataset(2000, seed=seed, parallelism=4)
        return pa.concat_tables(
            list(ds.iter_batches(batch_format="pyarrow")))

    t1 = load(42)
    assert t1.num_rows == 2000
    urls = t1["url"].to_pylist()
    assert len(set(urls)) == 2000          # eid_offset keeps urls unique
    assert [f.name for f in t1.schema] == ["url", "warc_ts", "html",
                                           "text", "lang"]
    t2 = load(42)
    assert sorted(urls) == sorted(t2["url"].to_pylist())  # deterministic
    t3 = load(43)
    assert sorted(urls) != sorted(t3["url"].to_pylist())
