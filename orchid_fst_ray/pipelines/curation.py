"""End-to-end training-corpus curation — the composite pipeline a
100 TB data-curation run would execute, chaining this engine's
training-data operators:

    documents
      → quality gate    (integer-predicate quality_ok, textstats)
      → language gate   (optional lang allowlist, lang_id heuristic)
      → exact dedup     (content-hash shuffle, min-id survivor)
      → near dedup      (MinHash+LSH pair gen → connected components →
                         min-id survivor per near-dup cluster)
      → curated corpus  (surviving doc rows + per-stage drop counts)

Every stage is one of the independently-oracled operators; the
composition adds only narrow-column plumbing (id joins via broadcast
sets — survivor id sets are small relative to the corpus by
construction at every stage; at 10^12-doc scale swap the broadcasts for
semi-joins on the id column, same shape).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from orchid_fst_ray.pipelines import dedup as dd
from orchid_fst_ray.pipelines import textstats as ts
from orchid_fst_ray.stages.clustering import union_find_components

__all__ = ["curate_corpus"]


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
    n_input = docs_ds.count()
    metrics["input"] = n_input

    # quality gate (vectorized predicate; integers only)
    q = ts.quality_stats(docs_ds, text_col=text_col, id_col=id_col,
                         min_tokens=min_tokens)
    ok_ids = set()
    for b in q.iter_batches(batch_format="pyarrow"):
        ids = np.asarray(b[id_col].to_pylist())
        ok = np.asarray(b["quality_ok"].to_pylist(), dtype=bool)
        ok_ids.update(ids[ok].tolist())
    metrics["after_quality"] = len(ok_ids)

    # language gate
    if langs is not None:
        lang_pred = ts.lang_id(docs_ds, text_col=text_col, id_col=id_col)
        keep_lang = set()
        for b in lang_pred.iter_batches(batch_format="pyarrow"):
            for i, l in zip(b[id_col].to_pylist(),
                            b["pred_lang"].to_pylist()):
                if l in langs:
                    keep_lang.add(i)
        ok_ids &= keep_lang
        metrics["after_lang"] = len(ok_ids)

    ok_ref = ray.put(ok_ids)

    def keep_ok(t: pa.Table) -> pa.Table:
        keep = ray.get(ok_ref)
        mask = pa.array([i in keep for i in t[id_col].to_pylist()])
        return t.filter(mask)

    gated = docs_ds.map_batches(keep_ok, batch_format="pyarrow")

    # exact dedup (min-id survivor per distinct text)
    exact_survivors = set(
        dd.exact_dedup(gated, text_col=text_col, id_col=id_col)
        .to_pandas()[id_col].tolist())
    metrics["after_exact_dedup"] = len(exact_survivors)

    ex_ref = ray.put(exact_survivors)

    def keep_exact(t: pa.Table) -> pa.Table:
        keep = ray.get(ex_ref)
        mask = pa.array([i in keep for i in t[id_col].to_pylist()])
        return t.filter(mask)

    deduped = gated.map_batches(keep_exact, batch_format="pyarrow")

    # near dedup: pair gen → components → keep min id per cluster
    pairs = dd.minhash_dup_pairs(deduped, text_col=text_col,
                                 id_col=id_col, threshold=near_dup_threshold,
                                 n_perm=n_perm, bands=bands)
    edge_list = [(int(a), int(b)) for a, b in zip(
        *(pairs.to_pandas()[c] for c in ("id_a", "id_b")))]
    comp = union_find_components(edge_list)
    drop = {n for n, root in comp.items() if n != root}
    metrics["near_dup_pairs"] = len(edge_list)
    metrics["near_dup_dropped"] = len(drop)

    drop_ref = ray.put(drop)

    def keep_near(t: pa.Table) -> pa.Table:
        dropped = ray.get(drop_ref)
        mask = pa.array([i not in dropped
                         for i in t[id_col].to_pylist()])
        return t.filter(mask)

    curated = deduped.map_batches(keep_near, batch_format="pyarrow")
    metrics["output"] = (metrics["after_exact_dedup"]
                         - metrics["near_dup_dropped"])
    return {"docs": curated, "metrics": metrics}
