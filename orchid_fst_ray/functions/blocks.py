"""Block-level dataset utilities.

Ray Data's hash-shuffle aggregate can emit empty, *schema-less* blocks
when a hash partition receives no rows; pyarrow-based joins fail on
such blocks ("No match ... for key field reference"). ``compact_nonempty``
rebuilds a dataset from only its non-empty block refs — metadata-only
on the driver, zero-copy for the data (refs stay in the object store).
Apply it to both sides of a join whose inputs came through a groupby /
aggregate. Blocks must be Arrow (use ``batch_format="pyarrow"`` in the
producing stage).
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["compact_nonempty"]


def compact_nonempty(ds, schema: pa.Schema | None = None):
    """Materialize ``ds`` and drop empty blocks; returns a Dataset over
    the surviving Arrow block refs. ``schema`` supplies the result
    schema when every block is empty (else the input's schema is used).
    """
    import ray.data as rd
    mat = ds.materialize()
    refs = [ref for bundle in mat.iter_internal_ref_bundles()
            for ref, meta in bundle.blocks if meta.num_rows]
    if not refs:
        if schema is None:
            schema = mat.schema().base_schema
        return rd.from_arrow(schema.empty_table())
    return rd.from_arrow_refs(refs)
