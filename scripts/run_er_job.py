"""ER pipeline job entry point — the ``ray job submit`` surface.

Usage (cluster):
    ray job submit --working-dir . -- python scripts/run_er_job.py \
        --pages /path/to/pages_parquet_dir --out /path/to/out \
        [--checkpoint-dir /path/to/ckpt] [--num-partitions 64]

Usage (local sandbox, documents-derived pages):
    python scripts/run_er_job.py --sf-dir /root/testdata/sf0.01 \
        --out /tmp/er_out

Reads the pages table (url, warc_ts, html, text, lang), runs the full
blocking → fuzzy-candidates → scoring → clustering pipeline and writes:
    {out}/assignment/   (url, cluster_id) partitioned Parquet
    {out}/scored/       matched pairs with scores
    {out}/lineage.json  per-stage lineage incl. per-partition row counts
Checkpointing (``--checkpoint-dir``) makes reruns resume after the last
completed stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Ray workers must import orchid_fst_ray too (driver sys.path does not
# propagate when launched from outside the repo)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="parquet dir/file with the pages table")
    ap.add_argument("--sf-dir", help="testdata dir: derive pages from "
                                     "documents.parquet instead")
    ap.add_argument("--variants", type=int, default=1)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--num-partitions", type=int, default=16)
    ap.add_argument("--d", type=int, default=2)
    ap.add_argument("--score-threshold", type=float, default=0.82)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():  # ray job submit may pre-init
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"))

    import ray.data as rd
    from orchid_fst_ray.pipelines.er import run_er
    from orchid_fst_ray.sources.pages import pages_from_documents

    if args.pages:
        pages = rd.read_parquet(args.pages)
    elif args.sf_dir:
        pages = pages_from_documents(args.sf_dir, parallelism=0,
                                     variants=args.variants)
    else:
        ap.error("one of --pages / --sf-dir is required")

    res = run_er(pages, d=args.d, score_threshold=args.score_threshold,
                 checkpoint_dir=args.checkpoint_dir,
                 num_partitions=args.num_partitions)
    res["assignment"].write_parquet(os.path.join(args.out, "assignment"))
    res["scored"].write_parquet(os.path.join(args.out, "scored"))
    with open(os.path.join(args.out, "lineage.json"), "w") as f:
        json.dump({"lineage": res["lineage"],
                   "metrics": res["metrics"]}, f, indent=2, default=str)
    print(json.dumps({"ok": True, "metrics": res["metrics"]}))
    ray.shutdown()


if __name__ == "__main__":
    main()
