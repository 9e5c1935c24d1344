"""Byte-budgeted LRU / LFU caches.

Re-expresses the reference's cache layer (lru_cache.h:103-358 — doubly
linked list + hash map with byte-size-budgeted eviction ``Replacement``;
lfu_cache.h:37-139 — frequency-list-of-time-lists variant with the same
interface). In the reference these bound ``FstBuilder`` node-registry
memory; here the builder uses a simpler registry cap
(``FstBuilder(max_registry_size=…)``), and these classes are the general
per-actor cache utility (e.g. per-query automaton caches) plus the
subject of the reference's differential cache tests
(cache_unittest.cpp:41-160, re-expressed in tests/test_caches.py).

Semantics mirrored from the reference:
- ``put`` accounts ``size_of(key) + size_of(value)`` bytes; inserting
  evicts (LRU: least-recently-used; LFU: least-frequently-used, oldest
  within a frequency) until the new entry fits.
- ``get`` refreshes recency (LRU) / increments frequency (LFU).
- an entry larger than the whole budget is rejected.
- overwriting an existing key updates value, size, and recency/frequency.
"""

from __future__ import annotations

from collections import OrderedDict

__all__ = ["LruCache", "LfuCache"]


def _default_size(x) -> int:
    if isinstance(x, (bytes, bytearray, memoryview)):
        return len(x)
    if isinstance(x, str):
        return len(x.encode("utf-8"))
    return 8


class _Base:
    def __init__(self, budget_bytes: int, size_of=_default_size) -> None:
        self.budget = budget_bytes
        self.size_of = size_of
        self.used = 0
        self.hits = 0
        self.gets = 0

    def __len__(self) -> int:  # pragma: no cover - trivial
        raise NotImplementedError

    @property
    def hit_rate(self) -> float:
        return self.hits / self.gets if self.gets else 0.0


class LruCache(_Base):
    """OrderedDict-backed LRU with byte budget (lru_cache.h semantics)."""

    def __init__(self, budget_bytes: int, size_of=_default_size) -> None:
        super().__init__(budget_bytes, size_of)
        self._d: OrderedDict = OrderedDict()
        self._sizes: dict = {}

    def __len__(self) -> int:
        return len(self._d)

    def get(self, key, default=None):
        self.gets += 1
        if key in self._d:
            self.hits += 1
            self._d.move_to_end(key)
            return self._d[key]
        return default

    def put(self, key, value) -> bool:
        sz = self.size_of(key) + self.size_of(value)
        if sz > self.budget:
            return False
        if key in self._d:
            self.used -= self._sizes.pop(key)
            del self._d[key]
        while self.used + sz > self.budget and self._d:
            old, _ = self._d.popitem(last=False)
            self.used -= self._sizes.pop(old)
        self._d[key] = value
        self._sizes[key] = sz
        self.used += sz
        return True

    def items(self):
        return list(self._d.items())


class LfuCache(_Base):
    """LFU with FIFO tiebreak within a frequency (lfu_cache.h semantics:
    frequency list of time-ordered lists)."""

    def __init__(self, budget_bytes: int, size_of=_default_size) -> None:
        super().__init__(budget_bytes, size_of)
        self._vals: dict = {}
        self._sizes: dict = {}
        self._freq: dict = {}
        self._by_freq: dict[int, OrderedDict] = {}
        self._min_freq = 0

    def __len__(self) -> int:
        return len(self._vals)

    def _touch(self, key) -> None:
        f = self._freq[key]
        del self._by_freq[f][key]
        if not self._by_freq[f]:
            del self._by_freq[f]
            if self._min_freq == f:
                self._min_freq = f + 1
        self._freq[key] = f + 1
        self._by_freq.setdefault(f + 1, OrderedDict())[key] = None

    def get(self, key, default=None):
        self.gets += 1
        if key in self._vals:
            self.hits += 1
            self._touch(key)
            return self._vals[key]
        return default

    def _evict_one(self) -> None:
        while self._min_freq not in self._by_freq:
            self._min_freq = min(self._by_freq)
        bucket = self._by_freq[self._min_freq]
        old, _ = bucket.popitem(last=False)
        if not bucket:
            del self._by_freq[self._min_freq]
        del self._vals[old]
        del self._freq[old]
        self.used -= self._sizes.pop(old)

    def put(self, key, value) -> bool:
        sz = self.size_of(key) + self.size_of(value)
        if sz > self.budget:
            return False
        freq = 1
        if key in self._vals:
            # remove, evict to fit, reinsert at frequency+1 (an
            # overwrite counts as a use, like ``_touch`` on get)
            freq = self._freq[key] + 1
            f = self._freq.pop(key)
            del self._by_freq[f][key]
            if not self._by_freq[f]:
                del self._by_freq[f]
            del self._vals[key]
            self.used -= self._sizes.pop(key)
        while self.used + sz > self.budget and self._vals:
            self._evict_one()
        self._vals[key] = value
        self._sizes[key] = sz
        self.used += sz
        self._freq[key] = freq
        self._by_freq.setdefault(freq, OrderedDict())[key] = None
        self._min_freq = min(self._min_freq, freq) if self._freq else freq
        if len(self._freq) == 1:
            self._min_freq = freq
        return True

    def items(self):
        return list(self._vals.items())
