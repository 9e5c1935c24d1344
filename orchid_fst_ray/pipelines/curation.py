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
    STOPWORDS_EN, _explode_tokens, _max_token_run, _stop_hits)

__all__ = ["curate_corpus"]


def _quality_mask(t: pa.Table, text_col: str, min_tokens: int,
                  max_tokens: int) -> np.ndarray:
    """The quality_stats ``quality_ok`` predicate, computed locally on
    a full-row batch (same kernels as textstats.quality_stats)."""
    txt = pc.cast(t[text_col], pa.large_string())
    flat, row, n = _explode_tokens(txt)
    n_tokens = np.bincount(row, minlength=n).astype(np.int64)
    n_chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
    n_chars = np.nan_to_num(n_chars.astype(np.float64)).astype(np.int64)
    n_stop = _stop_hits(flat, row, n, STOPWORDS_EN)
    max_run = _max_token_run(flat, row, n)
    return ((n_tokens >= min_tokens) & (n_tokens <= max_tokens)
            & (n_chars <= 12 * n_tokens) & (n_tokens <= n_chars)
            & (max_run < 8) & (n_stop >= 0))


def _lang_pred(t: pa.Table, text_col: str) -> np.ndarray:
    from orchid_fst_ray.pipelines.textstats import _STOP_DE, _STOP_FR
    txt = pc.cast(t[text_col], pa.large_string())
    cjk = pc.count_substring_regex(
        txt, pattern=r"[\x{4E00}-\x{9FFF}]").to_numpy(
            zero_copy_only=False).astype(np.int64)
    n_char = np.nan_to_num(pc.utf8_length(txt).to_numpy(
        zero_copy_only=False).astype(np.float64)).astype(np.int64)
    flat, row, n = _explode_tokens(txt)
    en = _stop_hits(flat, row, n, STOPWORDS_EN)
    de = _stop_hits(flat, row, n, _STOP_DE)
    fr = _stop_hits(flat, row, n, _STOP_FR)
    pred = np.where((en >= de) & (en >= fr), "en",
                    np.where(de >= fr, "de", "fr"))
    zh = (n_char > 0) & (cjk > 0) & (cjk * 4 >= n_char)
    return np.where(zh, "zh", pred)


def curate_corpus(docs_ds, text_col: str = "text", id_col: str = "doc_id",
                  langs: tuple[str, ...] | None = None,
                  min_tokens: int = 10,
                  near_dup_threshold: float = 0.7,
                  n_perm: int = 128, bands: int = 32) -> dict:
    """Returns {"docs": surviving Dataset, "metrics": stage counts}.

    Survivor rule for both dedup stages: keep the minimum id of each
    duplicate/near-dup cluster (deterministic).
    """
    import ray

    metrics: dict = {}
    metrics["input"] = docs_ds.count()

    # quality (+ optional language) gate: the predicate is a pure
    # function of the row's own text, so it filters WHERE THE DATA IS —
    # no id set ever reaches the driver, no join back to the corpus.
    def gate(t: pa.Table) -> pa.Table:
        mask = _quality_mask(t, text_col, min_tokens, 100000)
        if langs is not None:
            mask &= np.isin(_lang_pred(t, text_col), langs)
        return t.filter(pa.array(mask))

    gated = docs_ds.map_batches(gate, batch_format="pyarrow").materialize()
    metrics["after_quality"] = gated.count()
    if langs is not None:
        metrics["after_lang"] = metrics["after_quality"]

    # exact dedup: one payload shuffle on the content hash, survivor
    # rows kept in-block (dedup.exact_dedup_rows)
    deduped = dd.exact_dedup_rows(gated, text_col=text_col,
                                  id_col=id_col).materialize()
    metrics["after_exact_dedup"] = deduped.count()

    # near dedup: pair gen (narrow) → connected components (driver
    # fast path under its threshold, distributed loop above it) →
    # drop every non-root node. The drop set is O(pairs) — broadcast
    # once, applied with a vectorized is_in filter.
    pairs = dd.minhash_dup_pairs(deduped, text_col=text_col,
                                 id_col=id_col,
                                 threshold=near_dup_threshold,
                                 n_perm=n_perm, bands=bands)
    pairs_str = pairs.map_batches(lambda t: pa.table({
        "id_a": pc.cast(t["id_a"], pa.string()),
        "id_b": pc.cast(t["id_b"], pa.string()),
    }), batch_format="pyarrow")
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
    """(id_a, id_b) string pairs → int64 ids of every node that is NOT
    its component's min (the rows a min-id survivor rule drops).
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
