"""Vectorized run-boundary detection over sorted Arrow columns.

The engine's cheap-join idiom (sort on the group key, then process each
block's complete key-runs in one vectorized pass) needs the run
boundaries of one or more sorted string columns. Comparing Python
strings row-by-row is the classic hot-loop trap; dictionary-encoding
each column first turns the comparison into a numpy int32 diff.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["run_bounds"]


def _codes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Integer codes such that equal values get equal codes (adjacent
    comparison only — dictionary codes are not order-preserving)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_dictionary(arr.type):
        arr = arr.indices
    elif not pa.types.is_integer(arr.type):
        arr = arr.dictionary_encode().indices
    if arr.null_count:          # null == null inside a run (matches the
        arr = arr.fill_null(-1)  # Python `==` the loops used)
    return arr.to_numpy(zero_copy_only=False)


def run_bounds(*cols) -> np.ndarray:
    """Boundaries of equal-key runs in already-sorted column(s).

    Returns an int64 array ``[0, b1, ..., n]``: rows ``[bounds[i],
    bounds[i+1])`` share one key tuple. O(n) numpy, no Python per row.
    """
    n = len(cols[0])
    if n == 0:
        return np.array([0], dtype=np.int64)
    change = np.zeros(n - 1, dtype=bool)
    for c in cols:
        k = _codes(c)
        change |= k[1:] != k[:-1]
    return np.concatenate((
        [0], np.flatnonzero(change) + 1, [n])).astype(np.int64)
