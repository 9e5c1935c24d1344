#!/usr/bin/env python
"""``ofst`` — the reference's FST command-line tool re-expressed on Ray
Data (reference: src/main/fst/fst/fst_core/test/fst_cmd.cpp:23-388).

Subcommands: map | set | dot | match | prefix | range | fuzzy.

- ``map``/``set`` build an FST *file in the reference byte format*
  (mountable by the reference's ``ofst``) from a ``key,value`` / key
  dictionary file. Unless ``--sorted``, the input is sorted with a Ray
  Data range-partition sort (the lfsort role); the sorted stream then
  feeds the streaming dump-while-build writer.
- query subcommands mount the file (reference or engine format) and
  print one ``key`` / ``key,value`` line per hit plus a result count.

The reference's sort-tuning flags (--thread-count, --split-file-count,
--parallel-task-count) are accepted; thread count maps to Ray
parallelism, the other two are Ray-internal (sampled range partitions)
and ignored.
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


def _init_ray(num_cpus: int) -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def _mount(path: str):
    """Load an FST from either the reference byte format or the
    engine's OFSTRAY1 array format."""
    from orchid_fst_ray.fst import Fst
    with open(path, "rb") as f:
        blob = f.read()
    if blob[:8] == b"OFSTRAY1":
        return Fst.from_bytes(blob)
    return Fst.from_reference_bytes(blob)


def cmd_build(args, has_output: bool) -> int:
    from orchid_fst_ray.fst.reference_format import dump_reference_bytes
    from orchid_fst_ray.sources.dictionary_text import read_dictionary_text
    if os.path.exists(args.fst_file):
        print(f"output fst file exists: {args.fst_file}", file=sys.stderr)
        return 1
    _init_ray(args.thread_count)
    import pyarrow as pa

    ds = read_dictionary_text(args.dict_file, has_value=has_output)
    if not has_output:
        # the reference's set mode also keys on the first comma field
        ds = ds.map_batches(
            lambda t: pa.table({"key": pa.compute.replace_substring_regex(
                t["key"].combine_chunks().cast(pa.large_string()),
                pattern=",.*$", replacement="")}),
            batch_format="pyarrow")
    if not args.sorted:
        ds = ds.sort("key")

    def stream_items():
        last_key = None
        for b in ds.iter_batches(batch_format="pyarrow"):
            keys = b["key"].to_pylist()
            vals = (b["value"].to_pylist() if has_output
                    else [0] * len(keys))
            for k, v in zip(keys, vals):
                yield k, int(v)
                last_key = k
        del last_key

    blob = dump_reference_bytes(stream_items(), has_output=has_output)
    with open(args.fst_file, "wb") as f:
        f.write(blob)
    print(f"built {'map' if has_output else 'set'} fst: "
          f"{args.fst_file} ({len(blob)} bytes)")
    return 0


def cmd_dot(args) -> int:
    fst = _mount(args.fst_file)
    if os.path.exists(args.dot_file):
        print(f"output dot file exists: {args.dot_file}", file=sys.stderr)
        return 1
    with open(args.dot_file, "w") as f:
        f.write(fst.to_dot())
    print(f"wrote {args.dot_file}")
    return 0


def _bounds(args):
    from orchid_fst_ray.fst import Bound
    lo = hi = None
    if getattr(args, "greater_than", None) is not None:
        lo = Bound(args.greater_than, inclusive=False)
    if getattr(args, "greater_equal_than", None) is not None:
        lo = Bound(args.greater_equal_than, inclusive=True)
    if getattr(args, "less_than", None) is not None:
        hi = Bound(args.less_than, inclusive=False)
    if getattr(args, "less_equal_than", None) is not None:
        hi = Bound(args.less_equal_than, inclusive=True)
    return lo, hi


def _print_hits(fst, hits) -> int:
    n = 0
    for k, v in hits:
        print(f"{k},{v}" if fst.has_output else k)
        n += 1
    print(f"total {n} results")
    return 0


def cmd_match(args) -> int:
    from orchid_fst_ray.fst import StrAutomaton
    fst = _mount(args.fst_file)
    lo, hi = _bounds(args)
    return _print_hits(fst, fst.search(StrAutomaton(args.match_str),
                                       min_bound=lo, max_bound=hi))


def cmd_prefix(args) -> int:
    from orchid_fst_ray.fst import PrefixAutomaton
    fst = _mount(args.fst_file)
    lo, hi = _bounds(args)
    return _print_hits(fst, fst.search(PrefixAutomaton(args.prefix_str),
                                       min_bound=lo, max_bound=hi))


def cmd_range(args) -> int:
    fst = _mount(args.fst_file)
    lo, hi = _bounds(args)
    return _print_hits(fst, fst.search(min_bound=lo, max_bound=hi))


def cmd_fuzzy(args) -> int:
    from orchid_fst_ray.fst import fuzzy_automaton
    fst = _mount(args.fst_file)
    aut = fuzzy_automaton(args.fuzzy_str, args.distance,
                          args.prefix_len, args.damerau_levenshtein)
    return _print_hits(fst, fst.search(aut))


def _add_bound_opts(p: argparse.ArgumentParser) -> None:
    p.add_argument("-s", "--greater-than")
    p.add_argument("-a", "--greater-equal-than")
    p.add_argument("-e", "--less-than")
    p.add_argument("-b", "--less-equal-than")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="ofst", description="Orchid-FST command line tool (Ray Data)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    for name, has_out in (("map", True), ("set", False)):
        p = sub.add_parser(
            name,
            description=f"Build an FST {name} file in the reference byte "
            "format. Interop limit: the format stores a node's transition "
            "count in one byte, so a node with more than 255 arcs (binary "
            "keys spanning all byte values) is rejected with an error "
            "rather than silently truncated like the reference does.")
        p.add_argument("-f", "--dict-file", required=True)
        p.add_argument("-o", "--fst-file", required=True)
        p.add_argument("-c", "--cache-size", type=int, default=1000)
        p.add_argument("-s", "--sorted", action="store_true")
        p.add_argument("-w", "--work-directory", default="/tmp")
        p.add_argument("-t", "--thread-count", type=int, default=4)
        p.add_argument("-l", "--split-file-count", type=int, default=6)
        p.add_argument("-p", "--parallel-task-count", type=int, default=3)
        p.set_defaults(fn=lambda a, h=has_out: cmd_build(a, h))

    p = sub.add_parser("dot")
    p.add_argument("-f", "--fst-file", required=True)
    p.add_argument("-o", "--dot-file", required=True)
    p.set_defaults(fn=cmd_dot)

    p = sub.add_parser("match")
    p.add_argument("-f", "--fst-file", required=True)
    p.add_argument("-q", "--match-str", required=True)
    _add_bound_opts(p)
    p.set_defaults(fn=cmd_match)

    p = sub.add_parser("prefix")
    p.add_argument("-f", "--fst-file", required=True)
    p.add_argument("-p", "--prefix-str", required=True)
    _add_bound_opts(p)
    p.set_defaults(fn=cmd_prefix)

    p = sub.add_parser("range")
    p.add_argument("-f", "--fst-file", required=True)
    _add_bound_opts(p)
    p.set_defaults(fn=cmd_range)

    p = sub.add_parser("fuzzy")
    p.add_argument("-f", "--fst-file", required=True)
    p.add_argument("-z", "--fuzzy-str", required=True)
    p.add_argument("-d", "--distance", type=int, required=True)
    p.add_argument("-l", "--prefix-len", type=int, default=0)
    p.add_argument("-m", "--damerau-levenshtein", action="store_true")
    p.set_defaults(fn=cmd_fuzzy)

    args = ap.parse_args(argv)
    rc = args.fn(args)
    import ray
    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
