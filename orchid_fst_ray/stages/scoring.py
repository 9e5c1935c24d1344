"""Pairwise similarity scoring (stateful actor-pool stage).

Scores candidate pairs with Jaro-Winkler + normalized edit similarity
over the blocking keys. SURVEY.md §7 stage 6: a callable class →
Ray actor pool (``map_batches(PairScorer, concurrency=N)``), with the
vectorized scorer backend prepared once per actor in ``__init__``.

Backend: an in-process DuckDB connection evaluates
``jaro_winkler_similarity`` / ``levenshtein`` / ``damerau_levenshtein``
over the zero-copy Arrow batch (C++ vectorized; no per-row Python on
ASCII keys). DuckDB's distances are byte-oriented, so rows containing
non-ASCII keys (CJK — where the reference counts UTF-8 characters,
automaton.cpp:242-243) are recomputed with the exact Python OSA kernel;
the hybrid is validated in tests/test_scoring.py. A pure-Python
fallback keeps the stage functional if DuckDB is unavailable.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["PairScorer", "score_pairs"]


class PairScorer:
    """pairs(url_a,url_b,key_a,key_b,...) → + (jw, edit_sim, score)."""

    def __init__(self, jw_weight: float = 0.5) -> None:
        self.jw_weight = jw_weight
        try:
            import duckdb
            self._con = duckdb.connect()
            # One actor, one core: DuckDB defaults to ALL hardware
            # threads, so each pool actor silently fanned onto the
            # whole machine — a 2-actor pool used 32 cores, which (a)
            # oversubscribes the box when other stages run and (b)
            # made ray.init(num_cpus=8) runs dishonest (the scoring
            # stage ignored the CPU budget entirely; measured: the
            # stage's wall was IDENTICAL at 8 and 32 Ray CPUs).
            # Parallelism belongs to the actor pool, not the kernel —
            # the same rule as stages/candidates._clamp_arrow_pool.
            self._con.execute("SET threads TO 1")
        except Exception:  # pragma: no cover - duckdb is baked in
            self._con = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            out = _append_float(batch, {"jw": [], "edit_sim": []})
            out = out.append_column("char_dist", pa.array([], pa.int32()))
            return _append_float(out, {"score": []})
        import pyarrow.compute as pc
        from orchid_fst_ray.fst import damerau_levenshtein_osa
        if self._con is not None:
            # all-ASCII rows (strlen bytes == length chars)
            # get the exact OSA distance from DuckDB's vectorized C++
            # damerau_levenshtein; only non-ASCII rows (CJK etc., where
            # DuckDB counts bytes) fall back to the Python OSA kernel.
            scores = self._con.execute(
                """
                SELECT jaro_winkler_similarity(key_a, key_b) AS jw,
                       CASE WHEN greatest(length(key_a), length(key_b)) = 0
                            THEN 1.0
                            ELSE 1.0 - levenshtein(key_a, key_b)::DOUBLE
                                 / greatest(length(key_a), length(key_b))
                       END AS edit_sim,
                       CASE WHEN strlen(key_a) = length(key_a)
                             AND strlen(key_b) = length(key_b)
                            THEN damerau_levenshtein(key_a, key_b)
                            ELSE -1 END AS dl
                FROM batch
                """).arrow()
            import numpy as np
            jw = scores["jw"]
            es = scores["edit_sim"]
            dl = scores["dl"].combine_chunks().to_numpy(
                zero_copy_only=False)
            bad = np.flatnonzero(dl < 0)
            if len(bad):
                dl = dl.copy()
                # non-ASCII rows: DuckDB's distances count BYTES, so
                # every similarity (not just char_dist) is recomputed
                # with the character-level Python kernels — else
                # edit_sim can even go negative for CJK (byte distance
                # over char length).
                from orchid_fst_ray.fst import levenshtein
                ka = batch["key_a"].to_pylist()
                kb = batch["key_b"].to_pylist()
                jw_np = jw.combine_chunks().to_numpy(
                    zero_copy_only=False).copy()
                es_np = es.combine_chunks().to_numpy(
                    zero_copy_only=False).copy()
                for i in bad:
                    a, b = ka[i] or "", kb[i] or ""
                    dl[i] = damerau_levenshtein_osa(a, b)
                    jw_np[i] = _jaro_winkler(a, b)
                    es_np[i] = (1.0 if max(len(a), len(b)) == 0 else
                                1.0 - levenshtein(a, b) / max(len(a),
                                                              len(b)))
                jw = pa.array(jw_np, pa.float64())
                es = pa.array(es_np, pa.float64())
            cd = pa.array(dl.astype(np.int32, copy=False))
        else:  # pragma: no cover
            from orchid_fst_ray.fst import levenshtein
            ka = batch["key_a"].to_pylist()
            kb = batch["key_b"].to_pylist()
            jw = pa.array([_jaro_winkler(a, b) for a, b in zip(ka, kb)])
            es = pa.array([
                1.0 if max(len(a), len(b)) == 0
                else 1.0 - levenshtein(a, b) / max(len(a), len(b))
                for a, b in zip(ka, kb)])
            cd = pa.array(
                [0 if a == b else damerau_levenshtein_osa(a or "", b or "")
                 for a, b in zip(ka, kb)], pa.int32())
        w = self.jw_weight
        score = pc.add(pc.multiply(pc.cast(jw, pa.float64()), w),
                       pc.multiply(pc.cast(es, pa.float64()), 1.0 - w))
        out = batch.append_column("jw", pc.cast(jw, pa.float64()))
        out = out.append_column("edit_sim", pc.cast(es, pa.float64()))
        out = out.append_column("char_dist", cd)
        return out.append_column("score", score)


def _append_float(batch: pa.Table, cols: dict) -> pa.Table:
    for name, vals in cols.items():
        batch = batch.append_column(name, pa.array(vals, pa.float64()))
    return batch


def _jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if not la or not lb:
        # DuckDB's jaro_similarity scores ""/"" as 0.0 (no matches),
        # not 1.0 — mirror it so hybrid batches stay consistent
        return 0.0
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    window = max(window, 0)
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ca:
                match_a[i] = match_b[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3


def _jaro_winkler(a: str, b: str, p: float = 0.1,
                  boost_threshold: float = 0.7) -> float:
    """Classic Winkler: the common-prefix boost applies only when the
    Jaro similarity clears ``boost_threshold`` (0.7, Winkler 1990) —
    the same rule DuckDB's ``jaro_winkler_similarity`` implements, so
    the non-ASCII fallback rows score consistently with the ASCII rows
    that the DuckDB path handles.

    .. versionchanged:: round 3
       Previously the boost was applied unconditionally, so a CJK pair
       with jaro <= 0.7 scored slightly higher than an equivalent
       ASCII pair. Matches are unaffected (true pairs sit well above
       the threshold); low-similarity junk pairs now score lower."""
    j = _jaro(a, b)
    if j <= boost_threshold:
        return j
    pre = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        pre += 1
    return j + pre * p * (1 - j)


def score_pairs(pairs_ds, threshold: float = 0.82, jw_weight: float = 0.5,
                max_char_dist: int = 1,
                concurrency=(2, 8), batch_size: int = 8192):
    """Actor-pool scoring + threshold filter; returns matched pairs with
    (jw, edit_sim, char_dist, score) columns. A pair passes when its
    blended score clears ``threshold`` OR its exact character edit
    distance is within ``max_char_dist`` OR it is a same-normalized-url
    pair.

    NOTE the interaction with blocking: fuzzy candidates are generated
    by a distance-``d`` automaton, so setting ``max_char_dist >= d``
    makes the score threshold dead code (every fuzzy pair bypasses).
    Keep ``max_char_dist < d`` (default 1 vs the d=2 blocking budget)
    so the blended score actually gates the outermost distance ring;
    set it to ``d`` deliberately if scoring should be annotation-only.

    .. versionchanged:: round 2
       The default ``max_char_dist`` changed from 2 to 1 — with the
       d=2 blocking default, the old default made ``threshold`` dead
       code (every automaton-generated pair bypassed it). Callers that
       relied on the bypass-everything behavior must now pass
       ``max_char_dist=2`` explicitly."""
    import pyarrow.compute as pc
    scored = pairs_ds.map_batches(
        PairScorer, fn_constructor_kwargs={"jw_weight": jw_weight},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.greater_equal(t["score"], threshold)
        mask = pc.or_(mask, pc.less_equal(t["char_dist"], max_char_dist))
        if "source" in t.column_names:
            # same-normalized-url pairs are matches by definition
            mask = pc.or_(mask, pc.equal(t["source"], "url"))
        return t.filter(mask)

    return scored.map_batches(keep, batch_format="pyarrow")
