"""Stage-boundary Parquet checkpoints with lineage + metrics.

The reference has no checkpointing (its sorter's temp dir is deleted
even on failure, large_file_sorter.cpp:27-41); the north_rule requires
resumable runs. Design (ray_guide.md "Sources & sinks" layout):

- each checkpointed stage writes its output dataset to
  ``{root}/{stage}/data/`` as partitioned Parquet, **atomically**:
  written to ``.tmp-{stage}`` first, then renamed, then a ``_SUCCESS``
  manifest (JSON lineage row: input fingerprint, row count, wall time,
  extractor/config versions) is dropped.
- on rerun, a stage whose ``_SUCCESS`` exists *and matches the input
  fingerprint* is loaded with ``read_parquet`` instead of recomputed —
  a failed run resumes after its last completed stage.
- fingerprints chain: stage N's input fingerprint includes stage N-1's
  output fingerprint, so a changed upstream invalidates downstream
  checkpoints.
"""

from __future__ import annotations

import json
import os
import shutil
import time

__all__ = ["CheckpointStore"]


class CheckpointStore:
    def __init__(self, root: str | None) -> None:
        self.root = root
        self.lineage: list[dict] = []

    def _dir(self, stage: str) -> str:
        assert self.root is not None
        return os.path.join(self.root, stage)

    def load(self, stage: str, fingerprint: str):
        """Return the checkpointed Dataset if valid, else None."""
        if self.root is None:
            return None
        d = self._dir(stage)
        success = os.path.join(d, "_SUCCESS")
        if not os.path.exists(success):
            return None
        try:
            manifest = json.load(open(success))
        except Exception:
            return None
        if manifest.get("fingerprint") != fingerprint:
            return None
        import ray.data as rd
        self.lineage.append({**manifest, "stage": stage, "resumed": True})
        return rd.read_parquet(os.path.join(d, "data"))

    def save(self, stage: str, ds, fingerprint: str, **metrics):
        """Write ``ds`` under the stage dir atomically; returns a Dataset
        reading the checkpoint (so downstream consumes stable files)."""
        if self.root is None:
            return ds
        d = self._dir(stage)
        tmp = os.path.join(self.root, f".tmp-{stage}-{os.getpid()}")
        shutil.rmtree(tmp, ignore_errors=True)
        t0 = time.time()
        ds.write_parquet(os.path.join(tmp, "data"))
        wall = time.time() - t0
        shutil.rmtree(d, ignore_errors=True)
        os.replace(tmp, d)
        # per-partition lineage from parquet footers (metadata-only —
        # no data read): one row per output file with its row count
        partitions = []
        total_rows = 0
        try:
            import pyarrow.parquet as pq
            data_dir = os.path.join(d, "data")
            for name in sorted(os.listdir(data_dir)):
                if not name.endswith(".parquet"):
                    continue
                nrows = pq.ParquetFile(
                    os.path.join(data_dir, name)).metadata.num_rows
                partitions.append({"file": name, "rows": nrows})
                total_rows += nrows
        except Exception:
            partitions = []
        manifest = {
            "fingerprint": fingerprint,
            "wall_sec": round(wall, 3),
            "written_at": time.time(),
            "rows": total_rows,
            "partitions": partitions,
            **metrics,
        }
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            json.dump(manifest, f)
        self.lineage.append({**manifest, "stage": stage, "resumed": False})
        import ray.data as rd
        return rd.read_parquet(os.path.join(d, "data"))

    def run_stage(self, stage: str, fingerprint: str, fn):
        """load-or-compute helper: ``fn()`` builds the stage dataset."""
        cached = self.load(stage, fingerprint)
        if cached is not None:
            return cached, True
        return self.save(stage, fn(), fingerprint), False
