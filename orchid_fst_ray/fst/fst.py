"""Immutable, array-backed minimal-acyclic FST with ordered traversal.

Query semantics mirror Orchid-FST's reader (reference:
/root/reference/src/main/fst/fst/fst_core/fst.cpp:428-565 —
``FstReader::Iterator`` DFS over sorted transitions, ``SeekMin`` bound
positioning, ``GetIterator`` automaton product; fst.h:329-388
``FstIterBound`` inclusive/exclusive/unbounded bounds): results stream
in lexicographic key order; the automaton's ``can_match`` prunes whole
subtrees (fst.cpp:490-491); the empty key is representable.

Instead of the reference's mmap'd byte format (fst.cpp:32-94 node dump,
fst.cpp:221-284 mount) we freeze to flat numpy arrays — the Ray object
store provides the zero-copy shared-memory role that mmap plays in the
reference (output_stream_util.cpp:47-66).
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import numpy as np

__all__ = ["Fst", "Bound", "freeze_to_arrays"]


class Bound:
    """One side of a key-range bound (reference fst.h:329-388).

    ``key is None`` → unbounded. ``inclusive`` selects >=/<= vs >/<.
    """

    __slots__ = ("key", "inclusive")

    def __init__(self, key: str | None = None, inclusive: bool = True) -> None:
        self.key = key
        self.inclusive = inclusive

    @classmethod
    def unbounded(cls) -> "Bound":
        return cls(None, True)

    def __repr__(self) -> str:  # pragma: no cover
        if self.key is None:
            return "Bound(unbounded)"
        op = "=" if self.inclusive else ""
        return f"Bound({op}{self.key!r})"


def freeze_to_arrays(labels: list[list[str]], outputs: list[list[int]],
                     dests: list[list[int]], final: list[bool],
                     final_out: list[int], root: int,
                     has_output: bool, n_keys: int) -> "Fst":
    """Flatten per-node transition lists into CSR-style arrays."""
    n = len(final)
    counts = np.fromiter((len(l) for l in labels), dtype=np.int64, count=n)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    m = int(starts[-1])
    arc_label = np.fromiter(
        (ord(c) for node in labels for c in node), dtype=np.int32, count=m)
    arc_out = np.fromiter(
        (o for node in outputs for o in node), dtype=np.uint64, count=m)
    arc_dest = np.fromiter(
        (d for node in dests for d in node), dtype=np.int64, count=m)
    return Fst(starts, arc_label, arc_out, arc_dest,
               np.asarray(final, dtype=np.bool_),
               np.asarray(final_out, dtype=np.uint64),
               root, has_output, n_keys)


_MAGIC = b"OFSTRAY1"


class Fst:
    """Frozen FST. Arcs of a node occupy ``arc_*[starts[v]:starts[v+1]]``,
    sorted by label; ``root`` is the start node."""

    __slots__ = ("starts", "arc_label", "arc_out", "arc_dest",
                 "final", "final_out", "root", "has_output", "n_keys",
                 "_lists")

    def __init__(self, starts, arc_label, arc_out, arc_dest, final,
                 final_out, root: int, has_output: bool, n_keys: int) -> None:
        self.starts = starts
        self.arc_label = arc_label
        self.arc_out = arc_out
        self.arc_dest = arc_dest
        self.final = final
        self.final_out = final_out
        self.root = root
        self.has_output = has_output
        self.n_keys = n_keys
        self._lists = None

    def _traversal_lists(self):
        """Python-list views of the CSR arrays, built once per FST on
        first search: the product-DFS visits single cells in Python,
        where list indexing returns cached small ints ~2-3x faster
        than numpy scalar extraction. Cost is O(arcs) once; probes
        amortize it over thousands of traversals."""
        if self._lists is None:
            self._lists = (self.starts.tolist(), self.arc_label.tolist(),
                           self.arc_out.tolist(), self.arc_dest.tolist(),
                           self.final.tolist(), self.final_out.tolist())
        return self._lists

    # ------------------------------------------------------------- basic API

    @property
    def n_nodes(self) -> int:
        return len(self.final)

    @property
    def n_arcs(self) -> int:
        return len(self.arc_label)

    def _find_arc(self, node: int, cp: int) -> int:
        """Binary-search the arc with label ``cp``; -1 if absent
        (reference fst.cpp:291-334)."""
        lo = self.starts[node]
        hi = self.starts[node + 1]
        i = lo + np.searchsorted(self.arc_label[lo:hi], cp)
        if i < hi and self.arc_label[i] == cp:
            return int(i)
        return -1

    def get(self, key: str) -> int | None:
        """Exact lookup; returns the uint64 value (0 for set FSTs) or None."""
        node = self.root
        total = 0
        for ch in key:
            i = self._find_arc(node, ord(ch))
            if i < 0:
                return None
            total += int(self.arc_out[i])
            node = int(self.arc_dest[i])
        if not self.final[node]:
            return None
        return total + int(self.final_out[node])

    def __contains__(self, key: str) -> bool:
        return self.get(key) is not None

    # ------------------------------------------------------------- traversal

    def search(self, automaton=None, min_bound: Bound | None = None,
               max_bound: Bound | None = None) -> Iterator[tuple[str, int]]:
        """DFS product of (FST x automaton) within [min_bound, max_bound],
        yielding ``(key, value)`` in lexicographic key order — the
        reference's ``Iterator::Next`` (fst.cpp:471-524) semantics.

        ``automaton`` implements start/is_match/can_match/accept
        (reference automaton.h:84-99); ``None`` = match everything.
        """
        lo = min_bound.key if min_bound is not None else None
        lo_inc = min_bound.inclusive if min_bound is not None else True
        hi = max_bound.key if max_bound is not None else None
        hi_inc = max_bound.inclusive if max_bound is not None else True

        aut_start = automaton.start() if automaton is not None else None
        if automaton is not None and not automaton.can_match(aut_start):
            return

        starts, arc_label, arc_out, arc_dest, final, final_out = (
            self._traversal_lists())
        accept_cp = getattr(automaton, "accept_cp", None)

        # emit the empty key if in range and matched
        path: list[str] = []

        def in_lo(key_len: int, on_lo: bool) -> bool:
            # a key that is still a proper prefix of lo (or == lo with
            # exclusive bound) is below range
            if lo is None or not on_lo:
                return True
            if key_len < len(lo):
                return False
            return lo_inc  # key == lo

        def in_hi(on_hi: bool, key_len: int) -> bool:
            if hi is None or not on_hi:
                return True
            if key_len < len(hi):
                return True  # proper prefix of hi < hi
            return hi_inc  # key == hi

        root = self.root
        on_lo0 = lo is not None
        on_hi0 = hi is not None
        if final[root] and in_lo(0, on_lo0) and in_hi(on_hi0, 0):
            if automaton is None or automaton.is_match(aut_start):
                yield "", int(final_out[root]) if self.has_output else 0

        # stack frames: (node, arc_index, aut_state, sum_output, on_lo, on_hi)
        import bisect
        stack = [[root, starts[root], aut_start, 0, on_lo0, on_hi0]]
        while stack:
            frame = stack[-1]
            node, i, state, total, on_lo, on_hi = frame
            if i >= starts[node + 1]:
                stack.pop()
                if path:
                    path.pop()
                continue
            frame[1] = i + 1
            cp = arc_label[i]
            depth = len(stack) - 1  # chars consumed so far
            # --- lower bound pruning: while on lo boundary, skip arcs < lo[depth]
            n_on_lo = False
            if on_lo:
                if depth >= len(lo):
                    pass  # past lo's length: everything to the right is > lo
                else:
                    lo_cp = ord(lo[depth])
                    if cp < lo_cp:
                        # fast-forward the arc index past all labels < lo_cp
                        frame[1] = bisect.bisect_left(
                            arc_label, lo_cp, starts[node],
                            starts[node + 1])
                        continue
                    n_on_lo = cp == lo_cp
            # --- upper bound pruning: while on hi boundary, stop at arcs > hi[depth]
            n_on_hi = False
            if on_hi:
                if depth >= len(hi):
                    # current prefix == hi and key extends beyond → exceeds hi
                    frame[1] = starts[node + 1]
                    continue
                hi_cp = ord(hi[depth])
                if cp > hi_cp:
                    frame[1] = starts[node + 1]
                    continue
                n_on_hi = cp == hi_cp
            if accept_cp is not None:
                # accept_cp contract: can_match(s) == (s is not None)
                n_state = accept_cp(state, cp)
                if n_state is None:
                    continue
            elif automaton is not None:
                n_state = automaton.accept(state, chr(cp))
                if not automaton.can_match(n_state):
                    continue
            else:
                n_state = None
            dest = arc_dest[i]
            n_total = total + arc_out[i]
            path.append(chr(cp))
            if final[dest] and in_lo(depth + 1, n_on_lo) and in_hi(n_on_hi, depth + 1):
                if automaton is None or automaton.is_match(n_state):
                    yield "".join(path), (n_total + final_out[dest]
                                          if self.has_output else 0)
            stack.append([dest, starts[dest], n_state, n_total,
                          n_on_lo, n_on_hi])

    def items(self) -> Iterator[tuple[str, int]]:
        """All (key, value) pairs in lexicographic order."""
        return self.search()

    def keys(self) -> Iterator[str]:
        return (k for k, _ in self.search())

    # --------------------------------------------------------- serialization

    def to_bytes(self) -> bytes:
        """Compact serialization for the Ray object store / parquet binary
        cells (role of the reference's FST file format, fst.h:208-217)."""
        buf = io.BytesIO()
        buf.write(_MAGIC)
        header = np.array([self.root, int(self.has_output), self.n_keys,
                           self.n_nodes, self.n_arcs], dtype=np.int64)
        buf.write(header.tobytes())
        for arr in (self.starts, self.arc_label, self.arc_out, self.arc_dest,
                    np.packbits(self.final), self.final_out):
            buf.write(arr.tobytes())
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "Fst":
        if data[:8] != _MAGIC:
            raise ValueError("bad FST magic")
        mv = memoryview(data)
        off = 8
        root, has_output, n_keys, n_nodes, n_arcs = np.frombuffer(
            mv, dtype=np.int64, count=5, offset=off)
        off += 5 * 8

        def take(dtype, count):
            nonlocal off
            a = np.frombuffer(mv, dtype=dtype, count=count, offset=off)
            off += a.nbytes
            return a

        starts = take(np.int64, n_nodes + 1)
        arc_label = take(np.int32, n_arcs)
        arc_out = take(np.uint64, n_arcs)
        arc_dest = take(np.int64, n_arcs)
        final_packed = take(np.uint8, (n_nodes + 7) // 8)
        final = np.unpackbits(final_packed, count=n_nodes).astype(np.bool_)
        final_out = take(np.uint64, n_nodes)
        return cls(starts, arc_label, arc_out, arc_dest, final, final_out,
                   int(root), bool(has_output), int(n_keys))

    def to_reference_bytes(self) -> bytes:
        """Serialize to the reference's on-disk FST file layout (header
        fst.h:208-217, node records fst.cpp:33-94) so the ``ofst`` CLI
        can mount the result. Items stream through a byte-alphabet
        dump-while-build (UTF-8 byte order == codepoint order, so the
        sorted stream is valid input)."""
        from orchid_fst_ray.fst.reference_format import dump_reference_bytes
        return dump_reference_bytes(self.items(), self.has_output)

    @classmethod
    def from_reference_bytes(cls, blob: bytes) -> "Fst":
        """Mount a reference-layout FST file and rebuild the engine's
        codepoint-arc structure from its item stream."""
        from orchid_fst_ray.fst.builder import FstBuilder
        from orchid_fst_ray.fst.reference_format import (
            iter_reference_items, reference_root_meta)
        _, has_output = reference_root_meta(blob)
        b = FstBuilder(has_output=has_output)
        for k, v in iter_reference_items(blob):
            b.insert(k, v)
        return b.finish()

    def to_dot(self) -> str:
        """Graphviz rendering (debug utility; reference fst.cpp:336-411)."""
        lines = ["digraph fst {", "  rankdir=LR;"]
        for v in range(self.n_nodes):
            shape = "doublecircle" if self.final[v] else "circle"
            label = str(v)
            if self.final[v] and self.has_output and self.final_out[v]:
                label += f"/{int(self.final_out[v])}"
            lines.append(f'  {v} [shape={shape},label="{label}"];')
        for v in range(self.n_nodes):
            for i in range(int(self.starts[v]), int(self.starts[v + 1])):
                lab = chr(int(self.arc_label[i]))
                out = int(self.arc_out[i])
                e = f"{lab}/{out}" if self.has_output and out else lab
                lines.append(f'  {v} -> {int(self.arc_dest[i])} [label="{e}"];')
        lines.append("}")
        return "\n".join(lines)
