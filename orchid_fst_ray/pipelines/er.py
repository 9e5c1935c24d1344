"""End-to-end entity-resolution pipeline (SURVEY.md §7 / §3.4).

pages(url, warc_ts, html, text, lang)
  → ExtractNormalize (stateless map_batches; html dropped immediately)
  → blocking on normalized host + per-block FST build + fuzzy
    candidate generation (one shuffle; same-norm-url exact pairs fold
    into the same pass; hot blocks probe via a broadcast-FST actor pool)
  → PairScorer actor pool (Jaro-Winkler + edit similarity) + threshold
  → connected components via iterative min-label propagation
  → (url, cluster_id) assignment; singletons keep their own url.

Checkpoints (optional ``checkpoint_dir``): docs / candidates / scored /
clusters stage boundaries, with chained fingerprints and lineage rows
(see state/checkpoint.py). Metrics returned alongside the datasets.
"""

from __future__ import annotations

import time

import pyarrow as pa

from orchid_fst_ray.stages.candidates import dedupe_pairs, generate_candidates
from orchid_fst_ray.stages.clustering import connected_components
from orchid_fst_ray.stages.extract import EXTRACTOR_VERSION, ExtractNormalize
from orchid_fst_ray.stages.scoring import score_pairs
from orchid_fst_ray.state.checkpoint import CheckpointStore

__all__ = ["run_er", "evaluate_pairs", "assignment_from_components",
           "blocked_pair_scores"]

CONFIG_VERSION = "er-v1"


def run_er(pages_ds, *, d: int = 2, damerau: bool = True,
           score_threshold: float = 0.82, doc_key_tokens: int = 8,
           max_char_dist: int | None = None,
           checkpoint_dir: str | None = None,
           input_fingerprint: str = "",
           num_partitions: int = 16,
           scorer_concurrency=(2, 8),
           hot_block_rows: int | None = 4096,
           cluster_driver_threshold: int = 200_000,
           stage_metrics: bool = False) -> dict:
    """Run the pipeline; returns dict with ``assignment`` (url,
    cluster_id Dataset), intermediate datasets, lineage and metrics.

    ``max_char_dist`` is the exact-distance bypass in scoring: pairs at
    key edit distance ≤ it match regardless of score. It defaults to
    ``d - 1`` so ``score_threshold`` genuinely gates the outermost ring
    of fuzzy candidates (at ``max_char_dist >= d`` the threshold would
    be dead code — every automaton-generated pair bypasses it).

    ``stage_metrics=True`` materializes each stage boundary and records
    ``metrics["stages"][name] = {"wall_sec", "rows"}`` — wall time is
    per-stage EXCLUSIVE (the barrier serializes stages, so stage
    regressions are attributable), at the cost of losing the streaming
    overlap between consecutive stages. Leave it off for headline
    throughput runs; turn it on to localize a regression."""
    if max_char_dist is None:
        max_char_dist = max(0, d - 1)
    store = CheckpointStore(checkpoint_dir)
    cfg = (f"{CONFIG_VERSION}|{EXTRACTOR_VERSION}|d={d}|dl={damerau}"
           f"|t={score_threshold}|mcd={max_char_dist}"
           f"|k={doc_key_tokens}|{input_fingerprint}")
    t_start = time.time()
    metrics: dict = {}
    if stage_metrics:
        metrics["stages"] = {}

    def _boundary(name: str, ds, t0: float):
        """stage_metrics barrier: materialize + record wall/rows."""
        if not stage_metrics:
            return ds
        ds = ds.materialize()
        metrics["stages"][name] = {
            "wall_sec": round(time.time() - t0, 3),
            "rows": ds.count()}
        return ds

    t0 = time.time()
    fp_docs = f"docs|{cfg}"
    docs, resumed = store.run_stage(
        "docs", fp_docs,
        lambda: pages_ds.map_batches(
            ExtractNormalize(doc_key_tokens=doc_key_tokens),
            batch_format="pyarrow"))
    metrics["docs_resumed"] = resumed
    docs = _boundary("extract", docs, t0)

    # ONE extract execution: the narrow projection that BOTH the
    # blocking pass and the clustering seeds consume is materialized
    # here (url/doc_key/host/norm_url — no text payload). Without it,
    # streaming mode re-executed the whole extract stage for the seed
    # pass (two consumers of one lazy dataset re-run shared lineage);
    # generate_candidates needed this barrier anyway — its hot-block
    # split reads the slim projection up to three times.
    docs_slim = docs.select_columns(
        ["url", "doc_key", "host", "norm_url"]).materialize()

    t0 = time.time()
    fp_cand = f"candidates|{fp_docs}"
    candidates, resumed = store.run_stage(
        "candidates", fp_cand,
        lambda: dedupe_pairs(
            generate_candidates(docs_slim, d=d, damerau=damerau,
                                hot_block_rows=hot_block_rows,
                                num_partitions=num_partitions,
                                url_col="norm_url",
                                pre_projected=True),
            num_partitions=num_partitions))
    metrics["candidates_resumed"] = resumed
    candidates = _boundary("candidates", candidates, t0)

    t0 = time.time()
    fp_scored = f"scored|{fp_cand}"
    scored, resumed = store.run_stage(
        "scored", fp_scored,
        lambda: score_pairs(candidates, threshold=score_threshold,
                            max_char_dist=max_char_dist,
                            concurrency=scorer_concurrency))
    metrics["scored_resumed"] = resumed
    scored = _boundary("scored", scored, t0)

    # clustering is seeded with EVERY doc url, so its output is the
    # complete (url, cluster_id) assignment — singletons label
    # themselves and no outer join against docs is needed.
    t0 = time.time()
    fp_clusters = f"clusters|{fp_scored}"
    clusters, resumed = store.run_stage(
        "clusters", fp_clusters,
        lambda: connected_components(
            scored, nodes_ds=docs_slim, node_col="url",
            num_partitions=num_partitions,
            driver_threshold=cluster_driver_threshold))
    metrics["clusters_resumed"] = resumed
    clusters = _boundary("clusters", clusters, t0)
    assignment = clusters

    metrics["wall_sec"] = round(time.time() - t_start, 3)
    return {
        "docs": docs, "candidates": candidates, "scored": scored,
        "clusters": clusters, "assignment": assignment,
        "lineage": store.lineage, "metrics": metrics,
    }


def assignment_from_components(assignment_ds) -> dict[str, str]:
    """Materialize the (small) assignment into a dict for evaluation."""
    out: dict[str, str] = {}
    for b in assignment_ds.iter_batches(batch_format="pyarrow"):
        for u, c in zip(b["url"].to_pylist(), b["cluster_id"].to_pylist()):
            out[u] = c
    return out


def evaluate_pairs(assignment: dict[str, str], labeled_pairs: pa.Table) -> dict:
    """Pairwise precision/recall/F1 of predicted co-clustering on the
    labeled pairs (BASELINE.md: F1 >= 0.99 at the fixed blocking key)."""
    tp = fp = fn = tn = 0
    ua = labeled_pairs["url_a"].to_pylist()
    ub = labeled_pairs["url_b"].to_pylist()
    lab = labeled_pairs["is_match"].to_pylist()
    for a, b, m in zip(ua, ub, lab):
        pred = (assignment.get(a) is not None
                and assignment.get(a) == assignment.get(b))
        if pred and m:
            tp += 1
        elif pred and not m:
            fp += 1
        elif not pred and m:
            fn += 1
        else:
            tn += 1
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"tp": tp, "fp": fp, "fn": fn, "tn": tn,
            "precision": precision, "recall": recall, "f1": f1}


def blocked_pair_scores(docs_ds, id_col: str = "doc_id",
                        text_col: str = "text", lang_col: str = "lang",
                        len_col: str = "n_chars", bucket: int = 64,
                        key_chars: int = 40, max_block: int = 256,
                        min_jw_ppm: int = 850_000):
    """Standalone blocking + Jaro-Winkler scoring over the documents
    table → ``(doc_a, doc_b, jw_ppm:int64)``: pairs sharing the
    ``(lang, n_chars // bucket)`` blocking key whose first
    ``key_chars`` characters score ``jw ≥ min_jw_ppm / 1e6``,
    ``doc_a < doc_b``. ``jw_ppm = floor(1e6 · jw)`` is computed by the
    SAME DuckDB kernel the ER scorer uses (``stages/scoring.py``), so
    the SQL oracle replays it bit-for-bit — double in, double out.

    100 TB shape: pair generation is the classic blocked self-join —
    one co-locating sort on the block key, then a vectorized
    triangular expansion per block (the ``range_join_window``
    repeat/cumsum construction); blocks larger than ``max_block`` rows
    are SKIPPED on both the engine and oracle side (a degenerate
    blocking key would otherwise go quadratic — the same cap
    discipline as ``tfidf_pairs``'s ``max_df``). Scoring runs in a
    stateful actor pool (DuckDB connection built once per actor,
    pinned to one thread)."""
    import numpy as np

    import pyarrow.compute as pc

    def keyed(t: pa.Table) -> pa.Table:
        bkt = pc.cast(pc.floor(pc.divide(
            pc.cast(t[len_col], pa.float64()), bucket)), pa.int64())
        blk = pc.binary_join_element_wise(
            pc.cast(t[lang_col], pa.string()),
            pc.cast(bkt, pa.string()), "|")
        return pa.table({
            "block": blk,
            id_col: t[id_col].cast(pa.int64()),
            "key": pc.utf8_slice_codeunits(
                pc.cast(t[text_col], pa.string()), 0, key_chars)})

    def expand(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "key_a": pa.array([], pa.string()),
                          "key_b": pa.array([], pa.string())})
        if t.num_rows == 0:
            return empty
        blk = t["block"].combine_chunks()
        codes = blk.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = t[id_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, codes))
        codes, ids = codes[order], ids[order]
        keys = t["key"].take(pa.array(order))
        n = len(codes)
        seg = np.concatenate(
            ([0], np.flatnonzero(codes[1:] != codes[:-1]) + 1))
        lens = np.diff(np.concatenate((seg, [n])))
        ok_row = np.repeat(lens <= max_block, lens)
        seg_end = np.repeat(seg + lens, lens)
        rights = np.where(ok_row, seg_end - np.arange(n) - 1, 0)
        total = int(rights.sum())
        if total == 0:
            return empty
        rep_left = np.repeat(np.arange(n), rights)
        offsets = np.concatenate(([0], np.cumsum(rights)[:-1]))
        within = np.arange(total) - np.repeat(offsets, rights)
        right = rep_left + 1 + within
        return pa.table({
            "doc_a": pa.array(ids[rep_left], pa.int64()),
            "doc_b": pa.array(ids[right], pa.int64()),
            "key_a": keys.take(pa.array(rep_left)).cast(pa.string()),
            "key_b": keys.take(pa.array(right)).cast(pa.string())})

    class JwScore:
        def __init__(self) -> None:
            import duckdb
            self._con = duckdb.connect()
            self._con.execute("SET threads TO 1")   # one actor, one core

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"doc_a": pa.array([], pa.int64()),
                                 "doc_b": pa.array([], pa.int64()),
                                 "jw_ppm": pa.array([], pa.int64())})
            out = self._con.execute(
                """
                SELECT doc_a, doc_b,
                       CAST(floor(1000000 *
                            jaro_winkler_similarity(key_a, key_b))
                            AS BIGINT) AS jw_ppm
                FROM batch
                """).arrow()
            return out.filter(
                pc.greater_equal(out["jw_ppm"], min_jw_ppm)).combine_chunks()

    return (docs_ds.select_columns([id_col, text_col, lang_col,
                                    len_col])
            .map_batches(keyed, batch_format="pyarrow")
            .sort("block")
            .map_batches(expand, batch_size=None,
                         batch_format="pyarrow")
            .map_batches(JwScore, concurrency=(1, 8), num_cpus=1,
                         batch_format="pyarrow")
            .sort(["doc_a", "doc_b"]))
