"""Cache tests re-expressing the reference's cache_unittest
(cache_unittest.cpp:41-160): randomized put/get workloads into LRU and
LFU caches with identical byte budgets, plus the cross-implementation
property the reference asserts (both caches behave identically while no
eviction has occurred) and policy-divergence sanity under pressure."""

from __future__ import annotations

import random

import pytest

from orchid_fst_ray.state.caches import LfuCache, LruCache


def test_basic_put_get_lru():
    c = LruCache(100)
    assert c.put("a", "xx") and c.put("b", "yy")
    assert c.get("a") == "xx"
    assert c.get("missing") is None
    assert c.hits == 1 and c.gets == 2


def test_lru_evicts_least_recent():
    # each entry = 2 bytes; budget fits 2 entries
    c = LruCache(4)
    c.put("a", "1")
    c.put("b", "2")
    assert c.get("a") == "1"       # refresh a
    c.put("c", "3")                # evicts b (least recent)
    assert c.get("b") is None
    assert c.get("a") == "1" and c.get("c") == "3"


def test_lfu_evicts_least_frequent():
    c = LfuCache(4)
    c.put("a", "1")
    c.put("b", "2")
    c.get("a")
    c.get("a")
    c.get("b")
    c.put("c", "3")                # evicts b (freq 2 < a's 3)
    assert c.get("b") is None
    assert c.get("a") == "1" and c.get("c") == "3"


def test_oversized_entry_rejected():
    for cls in (LruCache, LfuCache):
        c = cls(4)
        assert not c.put("key", "waytoolarge")
        assert len(c) == 0


def test_overwrite_updates_size_and_value():
    for cls in (LruCache, LfuCache):
        c = cls(100)
        c.put("k", "aa")
        used1 = c.used
        c.put("k", "aaaa")
        assert c.get("k") == "aaaa"
        assert c.used == used1 + 2
        assert len(c) == 1


def test_randomized_equivalence_without_eviction():
    """The reference's cross-implementation assert
    (lfuCache.IsEqual(lruCache)): with a budget no workload exceeds,
    LRU and LFU hold identical contents and identical hit stats."""
    rnd = random.Random(1234)
    lru = LruCache(1 << 20)
    lfu = LfuCache(1 << 20)
    for _ in range(5000):
        if rnd.random() < 0.6:
            k = f"k{rnd.randrange(500)}"
            v = "v" * rnd.randrange(1, 32)
            assert lru.put(k, v) == lfu.put(k, v)
        else:
            k = f"k{rnd.randrange(700)}"
            assert lru.get(k) == lfu.get(k)
    assert dict(lru.items()) == dict(lfu.items())
    assert (lru.hits, lru.gets) == (lfu.hits, lfu.gets)
    assert lru.used == lfu.used


def test_randomized_budget_invariants_under_pressure():
    """Under eviction pressure both policies must respect the byte
    budget and keep get/put consistent (values never corrupt)."""
    rnd = random.Random(99)
    shadow: dict[str, str] = {}
    for cls in (LruCache, LfuCache):
        c = cls(512)
        for _ in range(3000):
            k = f"k{rnd.randrange(200)}"
            v = "v" * rnd.randrange(1, 16)
            c.put(k, v)
            shadow[k] = v
            assert c.used <= 512
            got = c.get(k)
            # k may have been evicted only if another put intervened;
            # here we get immediately after put, so it must be present
            assert got == v
