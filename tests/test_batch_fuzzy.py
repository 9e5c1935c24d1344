"""Differential tests: the level-synchronous batched fuzzy prober
(fst/batch_fuzzy.py) must match the scalar ``Fst.search`` ×
``fuzzy_automaton`` product exactly — match sets, self-join pair
sets, and the max-pairs-per-key budget semantics."""

from __future__ import annotations

import random

import numpy as np

from orchid_fst_ray.fst import FstBuilder, fuzzy_automaton
from orchid_fst_ray.fst.batch_fuzzy import (batch_fuzzy_matches,
                                            batch_self_join_pairs)


def _fst(keys):
    b = FstBuilder(has_output=True)
    b.insert_many(keys, list(range(len(keys))))
    return b.finish()


def _scalar_matches(fst, q, d, damerau):
    return {v for _, v in fst.search(fuzzy_automaton(q, d, 0, damerau))}


def test_batch_matches_randomized_vs_scalar():
    rnd = random.Random(5)
    for trial in range(25):
        keys = sorted({"".join(rnd.choice("abcd")
                               for _ in range(rnd.randint(0, 8)))
                       for _ in range(rnd.randint(1, 150))})
        fst = _fst(keys)
        queries = ["".join(rnd.choice("abcde")
                           for _ in range(rnd.randint(0, 10)))
                   for _ in range(rnd.randint(1, 40))]
        for d in (1, 2, 3):
            for dl in (False, True):
                qi, mv = batch_fuzzy_matches(fst, queries, d, dl)
                got: dict[int, set] = {}
                for a, v in zip(qi.tolist(), mv.tolist()):
                    got.setdefault(a, set()).add(v)
                for i, q in enumerate(queries):
                    assert got.get(i, set()) == _scalar_matches(
                        fst, q, d, dl), (trial, d, dl, q)


def test_batch_matches_edge_cases():
    # empty key in the dict, empty query, CJK, d=0
    keys = sorted({"", "a", "ab", "中国", "中图", "国中", "abc", "b"})
    fst = _fst(keys)
    queries = ["", "a", "中", "中国", "zz", "abcd"]
    for d in (0, 1, 2, 3):
        for dl in (False, True):
            qi, mv = batch_fuzzy_matches(fst, queries, d, dl)
            got: dict[int, set] = {}
            for a, v in zip(qi.tolist(), mv.tolist()):
                got.setdefault(a, set()).add(v)
            for i, q in enumerate(queries):
                assert got.get(i, set()) == _scalar_matches(
                    fst, q, d, dl), (d, dl, q)


def test_self_join_budget_parity():
    """batch_self_join_pairs == the per-key probe loop including the
    first-N-in-search-order budget truncation."""
    rnd = random.Random(11)
    for trial in range(15):
        keys = sorted({"".join(rnd.choice("abc")
                               for _ in range(rnd.randint(0, 7)))
                       for _ in range(rnd.randint(2, 300))})
        fst = _fst(keys)
        for d in (1, 2):
            for dl in (False, True):
                for budget in (2, 64):
                    I, J = [], []
                    for idx, k in enumerate(keys):
                        bud = budget
                        for _, midx in fst.search(
                                fuzzy_automaton(k, d, 0, dl)):
                            if midx <= idx:
                                continue
                            I.append(idx)
                            J.append(midx)
                            bud -= 1
                            if bud <= 0:
                                break
                    qi, mv = batch_self_join_pairs(fst, keys, d, dl,
                                                   budget)
                    assert (sorted(zip(qi.tolist(), mv.tolist()))
                            == sorted(zip(I, J))), (trial, d, dl,
                                                    budget)


def test_empty_inputs():
    fst = _fst(["abc"])
    qi, mv = batch_fuzzy_matches(fst, [], 2, False)
    assert len(qi) == 0 and len(mv) == 0
    qi, mv = batch_self_join_pairs(_fst(["a", "b"]), ["a", "b"], 0,
                                   False, 64)
    assert len(qi) == 0


def test_return_keys_matches_scalar_search():
    """return_keys=True must reproduce the scalar search's (key,
    value) pairs exactly — including arbitrary (non-rank) output
    values, which exercise the builder's output redistribution."""
    rnd = random.Random(21)
    for trial in range(12):
        keys = sorted({"".join(rnd.choice("abcd")
                               for _ in range(rnd.randint(0, 8)))
                       for _ in range(rnd.randint(1, 150))})
        vals = [rnd.randint(0, 10 ** 6) for _ in keys]
        b = FstBuilder(has_output=True)
        b.insert_many(keys, vals)
        fst = b.finish()
        queries = ["".join(rnd.choice("abcde")
                           for _ in range(rnd.randint(0, 10)))
                   for _ in range(rnd.randint(1, 30))]
        for d in (1, 2):
            for dl in (False, True):
                qi, mv, mk = batch_fuzzy_matches(fst, queries, d, dl,
                                                 return_keys=True)
                got: dict[int, set] = {}
                for a, v, k in zip(qi.tolist(), mv.tolist(), mk):
                    got.setdefault(a, set()).add((k, v))
                for i, q in enumerate(queries):
                    exp = set(fst.search(fuzzy_automaton(q, d, 0, dl)))
                    assert got.get(i, set()) == exp, (trial, d, dl, q)


def test_nonminimal_builder_equivalence():
    """FstBuilder(minimal=False) must accept the same language with
    the same outputs as the minimal build (it only skips suffix
    sharing) — items() and fuzzy self-join pairs identical."""
    rnd = random.Random(3)
    for trial in range(8):
        keys = sorted({"".join(rnd.choice("abc")
                               for _ in range(rnd.randint(0, 7)))
                       for _ in range(rnd.randint(2, 200))})
        b1 = FstBuilder(has_output=True)
        b1.insert_many(keys, list(range(len(keys))))
        b2 = FstBuilder(has_output=True, minimal=False)
        b2.insert_many(keys, list(range(len(keys))))
        f1, f2 = b1.finish(), b2.finish()
        assert list(f1.items()) == list(f2.items())
        assert f2.n_nodes >= f1.n_nodes   # trie >= minimal DAG
        for d in (1, 2):
            a = batch_self_join_pairs(f1, keys, d, True, 64)
            c = batch_self_join_pairs(f2, keys, d, True, 64)
            assert (sorted(zip(a[0].tolist(), a[1].tolist()))
                    == sorted(zip(c[0].tolist(), c[1].tolist())))


def test_d4_guard_and_scalar_fallback():
    """d=4 overflows the 7-bit window packing: the batch kernel must
    REFUSE (it used to silently return wrong results), and the
    candidates stage must fall back to the scalar DFS with identical
    pair semantics."""
    import pytest

    from orchid_fst_ray.fst.batch_fuzzy import MAX_BATCH_D, batch_fuzzy_matches

    keys = sorted({"abcdefgh", "axcdefgh", "abzdefgh", "qrstuvwx",
                   "abcd", "zzzzzzzz"})
    b = FstBuilder(has_output=True)
    b.insert_many(keys, list(range(len(keys))))
    fst = b.finish()
    with pytest.raises(ValueError, match="d <= 3"):
        batch_fuzzy_matches(fst, ["abcdefgh"], MAX_BATCH_D + 1, False)

    import pyarrow as pa

    from orchid_fst_ray.stages.candidates import BlockCandidates
    g = pa.table({
        "url": [f"u{i}" for i in range(len(keys))],
        "doc_key": keys,
        "host": ["h"] * len(keys),
    })
    out = BlockCandidates(d=4, damerau=False)(g)
    got = set(zip(out["key_a"].to_pylist(), out["key_b"].to_pylist()))
    want = set()
    for i, k in enumerate(keys):
        for mk, mi in fst.search(fuzzy_automaton(k, 4)):
            if mi > i:
                want.add(tuple(sorted((k, mk))))
    assert {tuple(sorted(p)) for p in got} == want and want


def test_build_probe_trie_equivalence():
    """build_probe_trie must accept the same language with the same
    key->rank map as FstBuilder(minimal=False) over values=range(K):
    items(), scalar fuzzy DFS, and batched self-join pairs identical —
    including empty keys, prefix keys and non-ASCII alphabets."""
    import numpy as np

    from orchid_fst_ray.fst.builder import build_probe_trie

    rnd = random.Random(11)
    for trial in range(15):
        alpha = rnd.choice(["ab", "abc", "abcdef", "中国人abc"])
        kset = {"".join(rnd.choice(alpha) for _ in range(rnd.randint(0, 9)))
                for _ in range(rnd.randint(1, 250))}
        if rnd.random() < 0.4:
            kset.add("")
        keys = np.unique(np.array(sorted(kset)))
        b = FstBuilder(has_output=True, minimal=False)
        b.insert_many(list(keys), list(range(len(keys))))
        f1, f2 = b.finish(), build_probe_trie(keys)
        assert list(f1.items()) == list(f2.items()), trial
        if len(keys) < 2:
            continue
        q = str(keys[rnd.randrange(len(keys))])
        assert (sorted(f1.search(fuzzy_automaton(q, 2, 0, True)))
                == sorted(f2.search(fuzzy_automaton(q, 2, 0, True))))
        a = batch_self_join_pairs(f1, list(keys), 2, True, 64)
        c = batch_self_join_pairs(f2, list(keys), 2, True, 64)
        assert (sorted(zip(a[0].tolist(), a[1].tolist()))
                == sorted(zip(c[0].tolist(), c[1].tolist()))), trial


def test_small_host_dp_equals_trie_probes():
    """The batched pairwise banded-DP path for small blocking groups
    must be pair-for-pair identical to per-group trie probes (same
    match set, same per-query cap semantics) across distances and
    both distance flavors — dense short-alphabet keys make near-matches
    common."""
    import random

    import numpy as np

    from orchid_fst_ray.fst.builder import build_probe_trie
    from orchid_fst_ray.fst.batch_fuzzy import batch_self_join_pairs
    from orchid_fst_ray.stages.candidates import _small_host_pairs

    rnd = random.Random(7)

    def rkey():
        return "".join(rnd.choice("abcdef")
                       for _ in range(rnd.randrange(1, 12)))

    for d in (1, 2, 3):
        for damerau in (False, True):
            hseg = [0]
            keys: list[str] = []
            for _ in range(25):
                ks = sorted({rkey() for _ in range(rnd.randrange(2, 30))})
                keys.extend(ks)
                hseg.append(len(keys))
            karr = np.asarray(keys, dtype=object)
            seg = np.asarray(hseg, np.int64)
            small = np.ones(25, bool)
            # cap=3 exercises the budget path, None the uncapped one
            for cap in (None, 3):
                I1, J1 = _small_host_pairs(karr, seg, small, d,
                                           damerau, cap)
                ref = []
                for hs, he in zip(seg[:-1], seg[1:]):
                    fst = build_probe_trie(karr[hs:he])
                    qi, mv = batch_self_join_pairs(
                        fst, list(karr[hs:he]), d, damerau, cap)
                    ref.extend(zip((qi + hs).tolist(),
                                   (mv + hs).tolist()))
                assert sorted(zip(I1.tolist(), J1.tolist())) \
                    == sorted(ref), (d, damerau, cap)


def test_probe_trie_serialization_parity():
    """The vectorized probe trie must survive to_bytes/from_bytes and
    probe identically to the minimal output-FST over the same keys —
    the hot-candidates path ships trie blobs through the object
    store."""
    import random

    import numpy as np

    from orchid_fst_ray.fst import Fst, FstBuilder
    from orchid_fst_ray.fst.builder import build_probe_trie
    from orchid_fst_ray.fst.batch_fuzzy import batch_fuzzy_matches

    rnd = random.Random(3)
    keys = sorted({"".join(rnd.choice("abcdefgh")
                           for _ in range(rnd.randrange(2, 14)))
                   for _ in range(1200)})
    b = FstBuilder(has_output=True)
    b.insert_many(keys, list(range(len(keys))))
    f_min = Fst.from_bytes(b.finish().to_bytes())
    f_trie = Fst.from_bytes(build_probe_trie(np.asarray(keys)).to_bytes())
    probes = [rnd.choice(keys) for _ in range(150)]
    for dam in (False, True):
        q1, m1 = batch_fuzzy_matches(f_min, probes, 2, dam)
        q2, m2 = batch_fuzzy_matches(f_trie, probes, 2, dam)
        assert sorted(zip(q1.tolist(), m1.tolist())) \
            == sorted(zip(q2.tolist(), m2.tolist()))
