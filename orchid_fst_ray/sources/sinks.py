"""Resumable partitioned-Parquet sink.

``write_partitioned`` lays the dataset out as one directory per
partition-key value (``{root}/{col}={value}/``), each committed
ATOMICALLY: data files are written under a temp name, renamed into
place, and only then is the partition's ``_SUCCESS`` marker created.
A re-run skips every partition whose marker exists and rewrites the
rest from scratch — so a killed 100 TB job resumes at partition
granularity instead of restarting (the round-spec "resumable output"
bullet; same atomic-commit discipline as ``state/checkpoint.py``).

Scale shape: ONE co-locating sort on the partition key; the engine's
pinned sort invariant (rows of one key value never split across
sorted blocks — test_ray_sort_colocates_equal_keys) means each key
lands whole in exactly one block, so the per-block writer can commit
each of its keys independently and completely. Skew note: a single
giant partition serializes into one write task — pick a partition
key with bounded per-key volume (shard hot keys upstream), which is
also what keeps the output readable in parallel.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

__all__ = ["write_partitioned"]


def _safe(v: str) -> str:
    """Filesystem-safe partition directory fragment."""
    return "".join(c if c.isalnum() or c in "-_." else f"%{ord(c):02X}"
                   for c in str(v))


def write_partitioned(ds, root: str, by_col: str,
                      resume: bool = True):
    """Write ``ds`` under ``{root}/{by_col}={value}/part-0.parquet``,
    one atomically-committed directory per distinct value of
    ``by_col``; returns the manifest as a Ray Dataset
    ``(part_key:string, n_rows:int64, skipped:int64)`` sorted by key
    (``skipped=1`` rows were already committed by a previous run).

    ``resume=False`` rewrites every partition regardless of markers.
    """
    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)

    # resume prunes committed partitions BEFORE the sort: their rows
    # never cross the exchange. The finished set is O(#partitions) —
    # manifest-sized — and ships inside the filter closure.
    prefix = f"{by_col}="
    finished: set[str] = set()
    if resume:
        for d in os.listdir(root):
            if d.startswith(prefix) and os.path.exists(
                    os.path.join(root, d, "_SUCCESS")):
                finished.add(d[len(prefix):])

    done_ds = None
    if finished:
        import pyarrow.compute as pc

        def split(keep_done: bool):
            fset = finished

            def fn(t: pa.Table) -> pa.Table:
                kv = t[by_col].combine_chunks()
                mask = pa.array([_safe(v) in fset
                                 for v in kv.to_numpy(
                                     zero_copy_only=False)])
                return t.filter(mask if keep_done else pc.invert(mask))
            return fn

        # committed rows only contribute manifest counts (no rewrite)
        def done_counts(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"part_key": pa.array([], pa.string()),
                                 "n_rows": pa.array([], pa.int64()),
                                 "skipped": pa.array([], pa.int64())})
            agg = pa.TableGroupBy(t.select([by_col]),
                                  by_col).aggregate([([], "count_all")])
            n = agg.num_rows
            return pa.table({
                "part_key": agg[by_col].cast(pa.string()),
                "n_rows": agg["count_all"].cast(pa.int64()),
                "skipped": pa.array(np.ones(n, np.int64))})

        from ray.data.aggregate import Sum
        done_ds = (ds.map_batches(split(True), batch_format="pyarrow")
                   .map_batches(done_counts, batch_format="pyarrow")
                   .groupby("part_key")
                   .aggregate(Sum("n_rows", alias_name="n_rows"),
                              Sum("skipped", alias_name="__s"))
                   .map_batches(lambda t: pa.table({
                       "part_key": t["part_key"].cast(pa.string()),
                       "n_rows": t["n_rows"].cast(pa.int64()),
                       "skipped": pa.array(
                           np.ones(t.num_rows, np.int64))}),
                       batch_format="pyarrow"))
        ds = ds.map_batches(split(False), batch_format="pyarrow")

    def block_writer(t: pa.Table) -> pa.Table:
        empty = pa.table({"part_key": pa.array([], pa.string()),
                          "n_rows": pa.array([], pa.int64()),
                          "skipped": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        import pyarrow.compute as pc
        order = pc.sort_indices(t, sort_keys=[(by_col, "ascending")])
        t = t.take(order)
        keys = t[by_col].combine_chunks()
        kv = keys.to_numpy(zero_copy_only=False)
        bounds = np.concatenate(
            ([0], np.flatnonzero(kv[1:] != kv[:-1]) + 1,
             [t.num_rows])).astype(np.int64)
        out_k: list[str] = []
        out_n: list[int] = []
        out_s: list[int] = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            key = str(kv[lo])
            pdir = os.path.join(root, f"{by_col}={_safe(key)}")
            marker = os.path.join(pdir, "_SUCCESS")
            os.makedirs(pdir, exist_ok=True)
            # clear stale files from a previous crashed attempt, then
            # write under a temp name and rename before the marker —
            # a reader never sees a half-written committed partition
            for f in os.listdir(pdir):
                os.unlink(os.path.join(pdir, f))
            part = t.slice(int(lo), int(hi - lo))
            tmp = os.path.join(pdir, ".part-0.parquet.tmp")
            pq.write_table(part, tmp)
            os.replace(tmp, os.path.join(pdir, "part-0.parquet"))
            with open(marker, "w"):
                pass
            out_k.append(key)
            out_n.append(part.num_rows)
            out_s.append(0)
        return pa.table({"part_key": pa.array(out_k, pa.string()),
                         "n_rows": pa.array(out_n, pa.int64()),
                         "skipped": pa.array(out_s, pa.int64())})

    written = ds.sort(by_col).map_batches(
        block_writer, batch_size=None, batch_format="pyarrow")
    if done_ds is not None:
        written = written.union(done_ds)
    return written.sort("part_key")
