#!/usr/bin/env python
"""``lfsort`` — the reference's large-file line sorter re-expressed as a
Ray Data range-partition sort (reference:
src/main/fst/fst/fst_core/test/large_file_sort_cmd.cpp:18-47,
large_file_sorter.cpp:44-158).

Semantics preserved: sort on the TRIMMED line, emit the original line;
``--ignore-empty-line`` drops whitespace-only lines. The hash-split /
k-way-merge flags are accepted for CLI compatibility; Ray's sampled
range partitioning replaces them (thread count → read parallelism).
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Ray workers must import orchid_fst_ray too (driver sys.path does not
# propagate when launched from outside the repo)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="lfsort", description="large file sort (Ray Data)")
    ap.add_argument("-f", "--input-file", required=True)
    ap.add_argument("-o", "--output-file", required=True)
    ap.add_argument("-w", "--work-directory", default="/tmp")
    ap.add_argument("-t", "--thread-count", type=int, default=4)
    ap.add_argument("-s", "--split-file-count", type=int, default=6)
    ap.add_argument("-p", "--parallel-task-count", type=int, default=3)
    ap.add_argument("-i", "--ignore-empty-line", action="store_true")
    args = ap.parse_args(argv)

    if os.path.exists(args.output_file):
        print(f"output file exists: {args.output_file}", file=sys.stderr)
        return 1

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=max(2, args.thread_count),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd
    import pyarrow as pa

    from orchid_fst_ray.stages.sorting import sort_by_trimmed

    ds = rd.read_text(args.input_file, drop_empty_lines=False)
    out = sort_by_trimmed(ds, col="text",
                          drop_empty=args.ignore_empty_line)
    n = 0
    with open(args.output_file, "w") as f:
        for b in out.iter_batches(batch_format="pyarrow"):
            for line in b["text"].to_pylist():
                f.write(line + "\n")
                n += 1
    print(f"sorted {n} lines -> {args.output_file}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
