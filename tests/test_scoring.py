"""PairScorer tests: the hybrid DuckDB/Python distance path must give
exact character-level OSA distances for ASCII and CJK alike."""

from __future__ import annotations

import pyarrow as pa

from orchid_fst_ray.fst import damerau_levenshtein_osa
from orchid_fst_ray.stages.scoring import PairScorer


def _batch(pairs):
    return pa.table({
        "url_a": pa.array([f"a{i}" for i in range(len(pairs))]),
        "url_b": pa.array([f"b{i}" for i in range(len(pairs))]),
        "key_a": pa.array([p[0] for p in pairs], pa.large_string()),
        "key_b": pa.array([p[1] for p in pairs], pa.large_string()),
    })


def test_char_dist_exact_ascii_and_cjk():
    pairs = [
        ("red widget", "red widgit"),   # ascii, transposition → 1
        ("hair", "hiar"),               # ascii transposition → 1
        ("中国人民", "中国心"),           # CJK: 2 chars, not 6 bytes
        ("café", "cafe"),               # accented: 1 char
        ("same key", "same key"),       # identical → 0
        ("", "abc"),
    ]
    out = PairScorer()(_batch(pairs))
    got = out["char_dist"].to_pylist()
    expect = [damerau_levenshtein_osa(a, b) for a, b in pairs]
    assert got == expect
    assert got[2] == 2 and got[3] == 1  # the byte-vs-char traps


def test_scores_monotone_and_bounded():
    pairs = [("abcdef", "abcdef"), ("abcdef", "abcdxf"),
             ("abcdef", "zzzzzz")]
    out = PairScorer()(_batch(pairs))
    s = out["score"].to_pylist()
    assert s[0] > s[1] > s[2]
    assert all(0.0 <= x <= 1.0 for x in s)
    assert out["jw"].to_pylist()[0] == 1.0
    assert out["edit_sim"].to_pylist()[0] == 1.0


def test_empty_batch():
    out = PairScorer()(_batch([]))
    assert out.num_rows == 0
    assert {"jw", "edit_sim", "char_dist", "score"} <= set(out.column_names)


def test_cjk_similarities_char_level_and_bounded():
    """jw / edit_sim on non-ASCII rows must be character-level and in
    [0, 1] — DuckDB's byte-oriented levenshtein over char length() can
    go NEGATIVE for CJK (e.g. 1 - 6bytes/4chars)."""
    pairs = [("中国人民", "中国心"), ("中国", "中国"), ("中文", "英文")]
    out = PairScorer()(_batch(pairs))
    es = out["edit_sim"].to_pylist()
    jw = out["jw"].to_pylist()
    assert all(0.0 <= x <= 1.0 for x in es + jw)
    # 4-char vs 3-char key, OSA distance 2 → edit_sim = 1 - 2/4
    assert es[0] == 0.5
    assert es[1] == 1.0 and jw[1] == 1.0
    assert es[2] == 0.5          # 1 char of 2 differs


def test_jaro_winkler_matches_duckdb():
    """The Python fallback (used for non-ASCII rows) must score exactly
    like DuckDB's jaro_winkler_similarity (used for ASCII rows) — same
    0.7 boost threshold, same empty-string handling — or hybrid batches
    rank pairs inconsistently."""
    import random

    import duckdb

    from orchid_fst_ray.stages.scoring import _jaro_winkler

    rng = random.Random(7)
    alpha = "abcdef"
    pairs = [("", ""), ("", "a"), ("abc", "abc"), ("ab", "ba"),
             ("abcdz", "abcdq"),              # prefix boost fires
             ("azzzz", "aqqqq")]              # jaro <= 0.7: no boost
    pairs += [("".join(rng.choices(alpha, k=rng.randint(0, 9))),
               "".join(rng.choices(alpha, k=rng.randint(0, 9))))
              for _ in range(300)]
    con = duckdb.connect()
    for a, b in pairs:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert abs(_jaro_winkler(a, b) - want) < 1e-12, (a, b)
    con.close()


def test_score_threshold_gates_outer_ring(ray_session):
    """With max_char_dist=1 (the run_er default at d=2) a LOW-score
    distance-2 pair is dropped while a high-score distance-2 pair
    survives — the threshold is live, not dead code."""
    import ray.data as rd
    from orchid_fst_ray.stages.scoring import score_pairs
    pairs = rd.from_arrow(_batch([
        ("ab", "zy"),                               # dist 2, garbage score
        ("the quick brown fox jumps over",
         "the quick brown fax jumps ovur"),          # dist 2, high score
        ("same", "samx"),                            # dist 1 → bypass
    ]))
    out = score_pairs(pairs, threshold=0.82, max_char_dist=1).to_pandas()
    kept = set(zip(out["key_a"], out["key_b"]))
    assert ("ab", "zy") not in kept
    assert ("the quick brown fox jumps over",
            "the quick brown fax jumps ovur") in kept
    assert ("same", "samx") in kept
