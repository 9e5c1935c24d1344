"""Minimal-acyclic FST builder over sorted keys (codepoint arcs).

Reimplements the *semantics* of Orchid-FST's streaming builder
(reference: /root/reference/src/main/fst/fst/fst_core/fst.cpp:132-219
``FstBuilder::Insert`` with classic transducer output redistribution,
fst.cpp:96-115 ``FreezeNodes``/``FreezeNode`` frozen-node dedup,
fst.cpp:164-167 sorted-input enforcement, fst.cpp:180-189 duplicate-key
last-value-wins) on a codepoint alphabet. UTF-8 byte order equals
codepoint order, so sortedness and output order match the reference's
byte-lexicographic semantics while automata operate on whole UTF-8
characters exactly as the reference does (automaton.cpp:22-38 gates
byte paths on whole-character boundaries; we get that by construction).

The result is a :class:`~orchid_fst_ray.fst.fst.Fst` — an immutable,
numpy-array-backed DAG that serializes compactly for the Ray object
store.

Invariants (enforced, mirroring the reference):
- keys must arrive in non-decreasing lexicographic order; a *smaller*
  key raises ``ValueError`` ("not larger than last key").
- inserting an equal key overwrites the value (last wins).
- the empty key is valid (value stored as the root's final output,
  fst.cpp:471-485 ``m_emptyOutput``).
- value of a key == sum of arc outputs along its path + final output
  (fst.cpp:506,517).
"""

from __future__ import annotations

import numpy as np

from orchid_fst_ray.fst.fst import Fst, freeze_to_arrays

__all__ = ["FstBuilder", "build_probe_trie"]


def build_probe_trie(keys: "np.ndarray") -> Fst:
    """Vectorized TRIE construction for build-probe-discard self-joins
    (same accepted language and key->value map as
    ``FstBuilder(has_output=True, minimal=False)`` over
    ``values=range(len(keys))``, but built in numpy instead of a
    per-character Python insert loop — ~10x on ER-sized blocks).

    ``keys`` is a SORTED, DISTINCT numpy ``<U`` array (exactly what
    ``np.unique`` returns). Outputs skip the reference's transducer
    redistribution entirely: every arc output is 0 and the key's rank
    sits whole in its final node — value-for-value identical reads,
    legal because a probe-only trie is never serialized or merged.

    Construction: the ``<U`` buffer IS the padded codepoint matrix
    (``view(uint32)``); consecutive-row LCPs locate each key's new
    suffix, every new trie node is one new arc (child id = arc
    creation index + 1), and the only sequential part is a K-length
    loop maintaining the current path's node-per-depth table.
    """
    keys = np.asarray(keys)
    if keys.dtype.kind != "U":          # object arrays from Arrow
        keys = keys.astype(str)
    K = len(keys)
    root_final = bool(K) and keys[0] == ""
    if K == 0 or (K == 1 and root_final):
        z = np.zeros(0, np.int64)
        return Fst(np.zeros(2, np.int64), z.astype(np.int32),
                   z.astype(np.uint64), z,
                   np.array([root_final]),
                   np.zeros(1, np.uint64), 0, True, K)
    itemwidth = keys.dtype.itemsize // 4
    M = keys.view(np.uint32).reshape(K, itemwidth)
    lens = np.char.str_len(keys).astype(np.int64)
    maxlen = int(lens.max())
    M = M[:, :maxlen]
    # lcp[i] = common prefix of keys[i-1], keys[i] (distinct + sorted
    # guarantee lcp[i] < lens[i]); row-to-row compare on the uint32
    # lanes — the NUL padding can't collide with real codepoints
    lcp = np.zeros(K, np.int64)
    if K > 1:
        eq = M[1:] == M[:-1]
        lcp[1:] = np.cumprod(eq, axis=1, dtype=np.int64).sum(axis=1)
        np.minimum(lcp[1:], np.minimum(lens[1:], lens[:-1]),
                   out=lcp[1:])
    arc_cnt = lens - lcp                    # new arcs per key
    arc_start = np.zeros(K + 1, np.int64)
    np.cumsum(arc_cnt, out=arc_start[1:])
    m = int(arc_start[-1])                  # total arcs == nodes - 1

    # labels: for key i, its new suffix chars M[i, lcp_i:lens_i]
    owner = np.repeat(np.arange(K, dtype=np.int64), arc_cnt)
    depth = (np.arange(m, dtype=np.int64) - arc_start[owner]
             + lcp[owner])
    label = M[owner, depth].astype(np.int32)

    # parents: a non-first arc hangs off the previous arc's child
    # (child id = arc index + 1); a key's FIRST arc hangs off the
    # current path's node at depth lcp_i — tracked by the one
    # sequential pass below (O(K) python, numpy slices inside)
    parent = np.arange(m, dtype=np.int64)   # non-first arcs: t -> t
    node_at = np.zeros(maxlen + 1, np.int64)
    first_parent = np.empty(K, np.int64)
    for i in range(K):
        p = lcp[i]
        first_parent[i] = node_at[p]
        li = lens[i]
        if li > p:
            node_at[p + 1:li + 1] = np.arange(
                arc_start[i] + 1, arc_start[i + 1] + 1)
    nonempty = lens > 0
    parent[arc_start[:-1][nonempty]] = first_parent[nonempty]

    # CSR grouped by parent; stable order keeps labels ascending per
    # node (keys sorted => branches appear in label order)
    order = np.argsort(parent, kind="stable")
    counts = np.bincount(parent, minlength=m + 1)
    starts = np.zeros(m + 2, np.int64)
    np.cumsum(counts, out=starts[1:])
    final = np.zeros(m + 1, np.bool_)
    final_out = np.zeros(m + 1, np.uint64)
    last_node = arc_start[1:]               # child of key i's last arc
    final[last_node[nonempty]] = True
    final_out[last_node[nonempty]] = np.arange(K)[nonempty]
    if root_final:
        final[0] = True                     # "" sorts first: rank 0
    return Fst(starts, label[order], np.zeros(m, np.uint64),
               (np.arange(m, dtype=np.int64) + 1)[order],
               final, final_out, 0, True, K)


class _Node:
    """An unfrozen node on the in-flight suffix path."""

    __slots__ = ("labels", "outputs", "children", "is_final", "final_output")

    def __init__(self) -> None:
        self.labels: list[str] = []      # arc labels (1-char strings), ascending
        self.outputs: list[int] = []     # arc outputs (uint64)
        self.children: list[object] = []  # frozen node id (int) or _Node (last arc only)
        self.is_final = False
        self.final_output = 0


class FstBuilder:
    """Streaming minimal-acyclic FST builder; insert keys in sorted order.

    ``has_output=False`` builds a *set* FST (all outputs zero), matching
    the reference's map/set flag (fst.h:201-217).

    ``max_registry_size`` optionally caps the frozen-node dedup registry
    (mirrors the reference's LRU node-cache budget, fst.h:73-79): when
    exceeded, the registry is cleared, so the FST remains correct but only
    approximately minimal — the same trade-off the reference documents.
    """

    def __init__(self, has_output: bool = True,
                 max_registry_size: int | None = None,
                 minimal: bool = True) -> None:
        """``minimal=False`` skips the frozen-node dedup entirely: the
        result is a TRIE-shaped FST accepting the same language with
        the same outputs, just without suffix sharing. Right for
        build-probe-discard uses (the ER candidates self-join) where
        the signature+registry work (~40% of build time) buys nothing;
        keep the default for any FST that is stored, shipped, or
        dumped to the reference byte format."""
        self.has_output = has_output
        self._minimal = minimal
        self._root = _Node()
        self._path: list[_Node] = [self._root]  # path[i] = node after i chars of last key
        self._last_key: str | None = None
        # frozen node storage (append-only)
        self._f_labels: list[list[str]] = []
        self._f_outputs: list[list[int]] = []
        self._f_dests: list[list[int]] = []
        self._f_final: list[bool] = []
        self._f_final_out: list[int] = []
        self._registry: dict[tuple, int] = {}
        self._max_registry = max_registry_size
        self.n_keys = 0
        self._finished: Fst | None = None

    # ------------------------------------------------------------------ insert

    def insert(self, key: str, value: int = 0) -> None:
        if self._finished is not None:
            raise RuntimeError("builder already finished")
        if not self.has_output:
            value = 0
        if value < 0 or value >= 1 << 64:
            raise ValueError("value must fit in uint64")
        last = self._last_key
        if last is not None:
            if key < last:
                raise ValueError(
                    f"key {key!r} not larger than last key {last!r}: "
                    "input must be sorted")
            if key == last:
                self._update_duplicate(value)
                return
        # common prefix length with the previous key
        cpl = 0
        if last:
            m = min(len(last), len(key))
            while cpl < m and last[cpl] == key[cpl]:
                cpl += 1
        # freeze the diverged suffix of the previous key (bottom-up)
        self._freeze_path_to(cpl)
        # push outputs down the shared prefix, absorbing min into `value`
        remaining = self._redistribute_prefix(cpl, value)
        # append fresh nodes for the new suffix
        node = self._path[cpl]
        suffix = key[cpl:]
        for i, ch in enumerate(suffix):
            child = _Node()
            node.labels.append(ch)
            node.outputs.append(remaining if i == 0 else 0)
            node.children.append(child)
            self._path.append(child)
            node = child
        if suffix:
            node.is_final = True
            node.final_output = 0
        else:
            # key == last-key prefix can only be the very first/empty key
            node.is_final = True
            node.final_output = remaining
        self._last_key = key
        self.n_keys += 1

    def insert_many(self, keys, values=None) -> None:
        if values is None:
            for k in keys:
                self.insert(k, 0)
        else:
            for k, v in zip(keys, values):
                self.insert(k, int(v))

    # ------------------------------------------------------- output plumbing

    def _redistribute_prefix(self, cpl: int, value: int) -> int:
        """Push ``min(existing_arc_output, remaining)`` up/keep and the excess
        down into the sibling subtree, per fst.cpp:146-159."""
        remaining = value
        for i in range(cpl):
            node = self._path[i]
            # the arc on the path is always the last arc (sorted insert)
            out = node.outputs[-1]
            common = min(out, remaining)
            excess = out - common
            if excess:
                child = node.children[-1]
                assert isinstance(child, _Node)
                for j in range(len(child.outputs)):
                    child.outputs[j] += excess
                if child.is_final:
                    child.final_output += excess
            node.outputs[-1] = common
            remaining -= common
        return remaining

    def _update_duplicate(self, value: int) -> None:
        """Equal key inserted again: overwrite its value (fst.cpp:180-189)."""
        key = self._last_key or ""
        remaining = self._redistribute_prefix(len(key), value)
        self._path[len(key)].final_output = remaining

    # ---------------------------------------------------------------- freeze

    def _freeze_path_to(self, depth: int) -> None:
        """Freeze (minimize + intern) path nodes deeper than ``depth``."""
        while len(self._path) - 1 > depth:
            node = self._path.pop()
            parent = self._path[-1]
            fid = self._freeze_node(node)
            parent.children[-1] = fid

    def _freeze_node(self, node: _Node) -> int:
        if not self._minimal:
            fid = len(self._f_final)
            self._f_labels.append(node.labels)
            self._f_outputs.append(node.outputs)
            self._f_dests.append(node.children)  # type: ignore[arg-type]
            self._f_final.append(node.is_final)
            self._f_final_out.append(node.final_output)
            return fid
        # children are already frozen ints at this point
        sig = (node.is_final, node.final_output,
               tuple(node.labels), tuple(node.outputs),
               tuple(node.children))  # type: ignore[arg-type]
        fid = self._registry.get(sig)
        if fid is not None:
            return fid
        fid = len(self._f_final)
        self._f_labels.append(node.labels)
        self._f_outputs.append(node.outputs)
        self._f_dests.append(node.children)  # type: ignore[arg-type]
        self._f_final.append(node.is_final)
        self._f_final_out.append(node.final_output)
        if self._max_registry is not None and len(self._registry) >= self._max_registry:
            self._registry.clear()
        self._registry[sig] = fid
        return fid

    # ---------------------------------------------------------------- finish

    def finish(self) -> Fst:
        """Freeze the remaining path and return the immutable Fst."""
        if self._finished is None:
            self._freeze_path_to(0)
            root_id = self._freeze_node(self._root)
            self._finished = freeze_to_arrays(
                self._f_labels, self._f_outputs, self._f_dests,
                self._f_final, self._f_final_out, root_id,
                self.has_output, self.n_keys)
            # free builder state
            self._registry = {}
            self._f_labels = []
            self._f_outputs = []
            self._f_dests = []
        return self._finished

    @property
    def n_nodes(self) -> int:
        return len(self._f_final)


def build_fst(keys, values=None, has_output: bool | None = None) -> Fst:
    """Convenience: build an Fst from pre-sorted keys (and optional values)."""
    if has_output is None:
        has_output = values is not None
    b = FstBuilder(has_output=has_output)
    b.insert_many(keys, values)
    return b.finish()
