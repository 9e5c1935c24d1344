"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir; where an
``oracle_sql()`` entry exists, runs it in DuckDB over the registered
table views and compares row count, sorted column names, and an
order-insensitive value hash. Mirrors the driver: columns sorted by
name, rows sorted by all columns, values stringified then hashed.
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = df.astype(str).values.tolist()
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return len(df), cols, h.hexdigest()[:16]


def main(sf_dir: str, only: list[str], json_path: str | None = None) -> int:
    sys.path.insert(0, "/root/repo")
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, sql = e.queries(), e.oracle_sql()
    fails = 0
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            fails += 1
            record[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None,
                            "err": f"{type(ex).__name__}: {ex}"[:200]}
            continue
        wall = time.time() - t0
        if name not in sql:
            print(f"ok   {name}: rows={len(got)} (rows-only) "
                  f"[{wall:.1f}s]")
            record[name] = {"rows_match": len(got) >= 0,
                            "schema_match": None, "hash_match": None,
                            "spark_rows": len(got), "oracle_rows": None,
                            "err": None, "no_oracle": True,
                            "wall_sec": round(wall, 1)}
            continue
        want = con.execute(sql[name]).df()
        ng, cg, hg = canon(got)
        nw, cw, hw = canon(want)
        status = "ok  " if (ng, cg, hg) == (nw, cw, hw) else "FAIL"
        record[name] = {"rows_match": ng == nw, "schema_match": cg == cw,
                        "hash_match": hg == hw, "spark_rows": ng,
                        "oracle_rows": nw, "err": None,
                        "wall_sec": round(wall, 1)}
        if status == "FAIL":
            fails += 1
            print(f"{status} {name}: rows {ng}vs{nw} cols {cg}vs{cw} "
                  f"hash {hg}vs{hw} [{wall:.1f}s]")
        else:
            print(f"{status} {name}: rows={ng} hash={hg} [{wall:.1f}s]")
    if json_path:
        import json
        with open(json_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_queries": len(record),
                       "n_fails": fails, "results": record}, f, indent=1)
    ray.shutdown()
    return fails


if __name__ == "__main__":
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        del args[i:i + 2]
    sf = args[0] if args else "/root/testdata/sf0.01"
    sys.exit(main(sf, args[1:], json_path=json_path))
