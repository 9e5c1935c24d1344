"""Resumable partitioned-Parquet sink (sources/sinks.py)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _tbl(n=100):
    rng = np.random.default_rng(3)
    langs = np.array(["en", "de", "fr", "zz/.."])[rng.integers(0, 4, n)]
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array(langs, pa.string()),
        "text": pa.array([f"doc {i}" for i in range(n)], pa.string())})


def _ds(t, parts=4):
    import ray.data as rd
    return rd.from_arrow(t).repartition(parts)


def _read_all(root: str):
    import glob
    rows = {}
    for pdir in sorted(glob.glob(os.path.join(root, "lang=*"))):
        assert os.path.exists(os.path.join(pdir, "_SUCCESS"))
        t = pq.read_table(os.path.join(pdir, "part-0.parquet"))
        rows[os.path.basename(pdir)] = t
    return rows


def test_write_partitioned_roundtrip(ray_session, tmp_path):
    from orchid_fst_ray.sources.sinks import write_partitioned
    t = _tbl()
    man = write_partitioned(_ds(t), str(tmp_path), "lang").to_pandas()
    want = {}
    for lang in t["lang"].to_pylist():
        want[lang] = want.get(lang, 0) + 1
    assert dict(zip(man.part_key, man.n_rows)) == want
    assert (man.skipped == 0).all()
    got = _read_all(str(tmp_path))
    assert len(got) == len(want)          # incl. the %-escaped dir
    total = sum(v.num_rows for v in got.values())
    assert total == t.num_rows
    # per-partition content: ids of that lang exactly
    for pdir, pt in got.items():
        assert set(pt["lang"].to_pylist()) == {pt["lang"][0].as_py()}


def test_write_partitioned_resume_skips_committed(ray_session, tmp_path):
    from orchid_fst_ray.sources.sinks import write_partitioned
    t = _tbl()
    write_partitioned(_ds(t), str(tmp_path), "lang").to_pandas()
    before = _read_all(str(tmp_path))
    # sabotage one partition: drop its marker and its data
    victim = sorted(before)[0]
    vdir = os.path.join(str(tmp_path), victim)
    for f in os.listdir(vdir):
        os.unlink(os.path.join(vdir, f))
    # record mtimes of survivors to prove they are not rewritten
    mt = {d: os.path.getmtime(os.path.join(str(tmp_path), d,
                                           "part-0.parquet"))
          for d in before if d != victim}
    man2 = write_partitioned(_ds(t), str(tmp_path), "lang").to_pandas()
    after = _read_all(str(tmp_path))
    assert {d: v.num_rows for d, v in after.items()} == \
        {d: v.num_rows for d, v in before.items()}
    skipped = dict(zip(man2.part_key, man2.skipped))
    assert sum(skipped.values()) == len(before) - 1
    for d, m in mt.items():
        assert os.path.getmtime(os.path.join(str(tmp_path), d,
                                             "part-0.parquet")) == m
    # the victim's bytes match the original write
    assert after[victim].sort_by("doc_id").equals(
        before[victim].sort_by("doc_id"))


def test_write_partitioned_resume_false_rewrites(ray_session, tmp_path):
    from orchid_fst_ray.sources.sinks import write_partitioned
    t = _tbl(40)
    m1 = write_partitioned(_ds(t, 2), str(tmp_path), "lang").to_pandas()
    m2 = write_partitioned(_ds(t, 2), str(tmp_path), "lang",
                           resume=False).to_pandas()
    assert (m2.skipped == 0).all()
    assert dict(zip(m1.part_key, m1.n_rows)) == \
        dict(zip(m2.part_key, m2.n_rows))
