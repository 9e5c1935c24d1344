"""Dictionary text-line source — the reference's input format.

``ofst map|set`` streams ``key,value`` / ``key`` lines, splits on the
FIRST comma, skips empty lines, drops malformed records and continues
(reference fst_cmd.cpp:143-164, ``StringUtil::Split``
string_util.cpp:16-37). Re-expressed as ``ray.data.read_text`` + a
vectorized pandas split (C string kernels, no per-row Python).
"""

from __future__ import annotations

import pandas as pd

__all__ = ["read_dictionary_text"]


def read_dictionary_text(path: str, has_value: bool = True):
    """→ Dataset(key: string[, value: uint64]).

    Map mode (``has_value``): lines whose second field isn't a uint64
    are dropped (the reference logs-and-continues, fst_cmd.cpp:147-162).
    Set mode: the whole line is the key.
    """
    import ray.data as rd

    ds = rd.read_text(path)

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].astype(str)
        s = s[s != ""]
        if not has_value:
            return pd.DataFrame({"key": s.reset_index(drop=True)})
        sp = s.str.split(",", n=1, expand=True)
        if sp.shape[1] < 2:
            sp[1] = None
        val = pd.to_numeric(sp[1], errors="coerce")
        mask = val.notna() & (val >= 0)
        return pd.DataFrame({
            "key": sp[0][mask].reset_index(drop=True),
            "value": val[mask].astype("uint64").reset_index(drop=True),
        })

    return ds.map_batches(parse, batch_format="pandas")
