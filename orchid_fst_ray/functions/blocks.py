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


def compact_nonempty(ds, schema: pa.Schema | None = None,
                     max_blocks: int | None = 64):
    """Materialize ``ds`` and drop empty blocks; returns a Dataset over
    the surviving Arrow block refs. ``schema`` supplies the result
    schema when every block is empty (else the input's schema is used).

    ``max_blocks`` caps the block count (coalescing via repartition):
    iterative pipelines that union+sort per round otherwise COMPOUND
    block counts ~2x per iteration — thousands of tiny blocks turn a
    sub-second sort into tens of seconds of pure scheduling.
    """
    import ray.data as rd
    mat = ds.materialize()
    refs = [ref for bundle in mat.iter_internal_ref_bundles()
            for ref, meta in bundle.blocks if meta.num_rows]
    if not refs:
        if schema is None:
            schema = mat.schema().base_schema
        return rd.from_arrow(schema.empty_table())
    if max_blocks is not None and len(refs) > max_blocks:
        mat = rd.from_arrow_refs(refs).repartition(max_blocks).materialize()
        refs = [ref for bundle in mat.iter_internal_ref_bundles()
                for ref, meta in bundle.blocks if meta.num_rows]
    return rd.from_arrow_refs(refs)
