"""End-to-end training-corpus curation — the composite pipeline a
100 TB data-curation run would execute, chaining this engine's
training-data operators:

    documents
      → quality gate    (integer-predicate quality_ok, computed INLINE
                         per batch and filtered locally — zero shuffle,
                         zero driver state)
      → language gate   (optional lang allowlist, same inline shape)
      → exact dedup     (ONE content-hash shuffle of the payload;
                         min-id survivor row kept in-block — no id
                         semi-join back to the corpus)
      → near dedup      (MinHash+LSH pair gen → connected_components →
                         drop non-root ids; the drop set is O(pairs),
                         broadcast once via ray.put and applied with a
                         vectorized Arrow is_in filter)
      → curated corpus  (surviving doc rows + per-stage drop counts)

Driver materialization is bounded by O(near-dup pairs) — never by the
corpus: the gates never leave the worker, exact dedup keeps rows
in-block after its shuffle, and only the near-dup drop-id list (tiny
relative to the corpus by construction) crosses the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from orchid_fst_ray.pipelines import dedup as dd
from orchid_fst_ray.pipelines.textstats import (
    lang_pred_array, quality_ok_mask)

__all__ = ["curate_corpus"]


def curate_corpus(docs_ds, text_col: str = "text", id_col: str = "doc_id",
                  langs: tuple[str, ...] | None = None,
                  min_tokens: int = 10,
                  near_dup_threshold: float = 0.7,
                  n_perm: int = 128, bands: int = 32,
                  near_dup_backend: str = "minhash",
                  ngram_max_posting: int = 1_000_000) -> dict:
    """Returns {"docs": surviving Dataset, "metrics": stage counts}.

    Survivor rule for both dedup stages: keep the minimum id of each
    duplicate/near-dup cluster (deterministic).

    ``near_dup_backend``: ``"minhash"`` (default — the approximate
    scale path) or ``"ngram"`` — exact n-gram-Jaccard pairs
    (:func:`~orchid_fst_ray.pipelines.dedup.ngram_jaccard_pairs`),
    which makes the WHOLE composite DuckDB-expressible and is what the
    ``curated_docs_ngram`` driver oracle exercises end-to-end.

    ``id_col`` must be a NON-NEGATIVE integer column: the near-dup
    stage zero-pads stringified ids so lexicographic order equals
    numeric order (negative or non-integer ids would silently break
    the min-id survivor rule, so they are rejected up front).
    """
    import ray

    id_type = docs_ds.schema().base_schema.field(id_col).type
    if not pa.types.is_integer(id_type):
        raise TypeError(
            f"curate_corpus requires an integer id column; {id_col!r} "
            f"is {id_type} — cast ids to int64 (or dense-rank them) "
            "before curation")

    metrics: dict = {}
    metrics["input"] = docs_ds.count()

    # quality (+ optional language) gate: the predicate is a pure
    # function of the row's own text, so it filters WHERE THE DATA IS —
    # no id set ever reaches the driver, no join back to the corpus.
    def q_gate(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(
            quality_ok_mask(t[text_col], min_tokens, 100000)))

    gated = docs_ds.map_batches(q_gate,
                                batch_format="pyarrow").materialize()
    metrics["after_quality"] = gated.count()
    if langs is not None:
        def l_gate(t: pa.Table) -> pa.Table:
            return t.filter(pa.array(
                np.isin(lang_pred_array(t[text_col]), langs)))
        gated = gated.map_batches(l_gate,
                                  batch_format="pyarrow").materialize()
        metrics["after_lang"] = gated.count()

    # exact dedup: one payload shuffle on the content hash, survivor
    # rows kept in-block (dedup.exact_dedup_rows)
    deduped = dd.exact_dedup_rows(gated, text_col=text_col,
                                  id_col=id_col).materialize()
    metrics["after_exact_dedup"] = deduped.count()

    # near dedup: pair gen (narrow) → connected components (driver
    # fast path under its threshold, distributed loop above it) →
    # drop every non-root node. The drop set is O(pairs) — broadcast
    # once, applied with a vectorized is_in filter.
    if near_dup_backend == "minhash":
        pairs = dd.minhash_dup_pairs(deduped, text_col=text_col,
                                     id_col=id_col,
                                     threshold=near_dup_threshold,
                                     n_perm=n_perm,
                                     bands=bands).materialize()
    elif near_dup_backend == "ngram":
        pairs = dd.ngram_jaccard_pairs(deduped, text_col=text_col,
                                       id_col=id_col,
                                       threshold=near_dup_threshold,
                                       max_posting=ngram_max_posting
                                       ).materialize()
    else:
        raise ValueError(
            f"unknown near_dup_backend {near_dup_backend!r}; "
            "expected 'minhash' or 'ngram'")
    # ZERO-PAD the stringified ids: connected_components labels by
    # LEXICOGRAPHIC min, and only padded strings preserve the numeric
    # min-id survivor rule (min("123","5") is "123")
    def _lpad_ids(t: pa.Table) -> pa.Table:
        if t.num_rows and (
                pc.min(t["id_a"]).as_py() < 0
                or pc.min(t["id_b"]).as_py() < 0):
            raise ValueError(
                "curate_corpus near-dup stage requires non-negative "
                "ids (zero-padding keeps lexicographic == numeric "
                "order only for ids >= 0)")
        return pa.table({
            "id_a": pc.utf8_lpad(pc.cast(t["id_a"], pa.string()), 20, "0"),
            "id_b": pc.utf8_lpad(pc.cast(t["id_b"], pa.string()), 20, "0"),
        })

    pairs_str = pairs.map_batches(_lpad_ids, batch_format="pyarrow")
    comp = connected_components_drop_ids(pairs_str)
    metrics["near_dup_pairs"] = pairs.count()
    metrics["near_dup_dropped"] = len(comp)

    drop_ref = ray.put(comp)

    class KeepNear:
        def __init__(self, ref):
            import ray as _ray
            self.drop = pa.array(_ray.get(ref), pa.int64())

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(pc.cast(t[id_col], pa.int64()),
                                      value_set=self.drop))
            return t.filter(mask)

    curated = deduped.map_batches(KeepNear, fn_constructor_args=(drop_ref,),
                                  batch_format="pyarrow",
                                  concurrency=(1, 8), num_cpus=1)
    metrics["output"] = (metrics["after_exact_dedup"]
                         - metrics["near_dup_dropped"])
    return {"docs": curated, "metrics": metrics}


def connected_components_drop_ids(pairs_str) -> np.ndarray:
    """(id_a, id_b) string pairs (ZERO-PADDED so lexicographic order ==
    numeric order) → int64 ids of every node that is NOT its
    component's min (the rows a min-id survivor rule drops).
    Runs the dataset-level connected_components (driver union-find fast
    path under its threshold, distributed min-label loop above it) and
    collects only the O(pairs)-bounded drop list."""
    from orchid_fst_ray.stages.clustering import connected_components
    cc = connected_components(pairs_str, node_a="id_a", node_b="id_b")
    drop: list[int] = []
    for b in cc.iter_batches(batch_format="pyarrow"):
        urls = b["url"].to_pylist()
        labels = b["cluster_id"].to_pylist()
        drop.extend(int(u) for u, l in zip(urls, labels) if u != l)
    return np.array(sorted(drop), dtype=np.int64)
