"""Orchid-FST on-disk byte-format interop: dump/mount the reference's
FST *file layout* so this engine can exchange index files with the
``ofst`` CLI.

Layout (reference: /root/reference/src/main/fst/fst/fst_core/fst.h
FstBuilder ctor + fst.cpp:33-94 ``FstWriteNode::Dump`` / fst.cpp:221-284
``FstReaderNode::Mount``):

- bytes [0, 8):  uint64 LE root node address (patched by Finish)
- byte 8:        hasOutput flag (1 byte bool)
- byte 9:        the shared final-terminate node (type byte 0x01)
- then frozen nodes, children before parents, each:
    type byte    bit0 = isFinal, bits1-2 = trans-count code
                 (00 none / 01 one / 10 many), bit3 = hasFinalOutput
                 (only set when hasOutput and finalOutput > 0)
    [finalOutput u64 when bit3]
    one trans:   input u8, [output u64 when hasOutput], target u64
    many trans:  count u8, then per trans the same triple

Arcs are BYTES here (the reference's alphabet); the engine's own
:class:`~orchid_fst_ray.fst.fst.Fst` uses codepoint arcs, so conversion
goes through (key, value) items — UTF-8 byte order equals codepoint
order, so sorted insert order is preserved in both directions.

The writer is the same streaming dump-while-build used by the engine's
builder (sorted insert, classic output redistribution, frozen-node
memoization keyed by (final, finalOutput, trans)) — memory stays
bounded by the longest key, matching the reference's design.

INTEROP LIMIT — 255 transitions per node: the reference stores the
many-transition count in a single uint8 and would silently truncate a
256-arc node (a byte-alphabet node CAN have 256 arcs, e.g. binary keys
covering every byte value). This writer refuses such nodes with a
ValueError instead of emitting a file the reference would misread —
the failure is a limitation of the reference's file format, not of
this engine (the engine's own ``Fst.to_bytes`` format has no such
cap).
"""

from __future__ import annotations

import struct

__all__ = ["dump_reference_bytes", "iter_reference_items",
           "reference_root_meta"]

_U64 = struct.Struct("<Q")


class _BNode:
    __slots__ = ("inputs", "outputs", "children", "is_final",
                 "final_output")

    def __init__(self) -> None:
        self.inputs: list[int] = []     # arc input bytes, ascending
        self.outputs: list[int] = []
        self.children: list = []        # frozen addr (int) or _BNode (last)
        self.is_final = False
        self.final_output = 0


def dump_reference_bytes(items, has_output: bool = True) -> bytes:
    """Serialize sorted ``(key, value)`` items (keys ``str`` or
    ``bytes``) to the reference file layout. Duplicate keys last-wins;
    the empty key is valid (root final)."""
    buf = bytearray(9)
    buf[8] = 1 if has_output else 0
    memo: dict[tuple, int] = {}

    def write_node(is_final: bool, final_output: int,
                   trans: tuple) -> int:
        sig = (is_final, final_output if has_output else 0, trans)
        addr = memo.get(sig)
        if addr is not None:
            return addr
        addr = len(buf)
        t = 1 if is_final else 0
        tc = len(trans)
        if tc == 1:
            t |= 0x2
        elif tc >= 2:
            t |= 0x4
        has_fo = has_output and final_output > 0
        if has_fo:
            t |= 0x8
        buf.append(t)
        if has_fo:
            buf.extend(_U64.pack(final_output))
        if tc == 1:
            inp, out, target = trans[0]
            buf.append(inp)
            if has_output:
                buf.extend(_U64.pack(out))
            buf.extend(_U64.pack(target))
        elif tc >= 2:
            if tc > 255:
                # deliberate divergence: the reference would silently
                # truncate via uint8 (see module docstring INTEROP
                # LIMIT) — fail loudly instead of writing a bad file
                raise ValueError(
                    "reference byte-format interop limit: the trans "
                    "count is a single uint8, so nodes with more than "
                    f"255 transitions (this node has {tc}) cannot be "
                    "represented; use the engine's native Fst.to_bytes "
                    "format for such dictionaries")
            buf.append(tc)
            for inp, out, target in trans:
                buf.append(inp)
                if has_output:
                    buf.extend(_U64.pack(out))
                buf.extend(_U64.pack(target))
        memo[sig] = addr
        return addr

    # the reference dumps its shared terminate node right after the
    # header; leaf finals with zero output alias to it via the memo
    term = write_node(True, 0, ())
    assert term == 9

    def freeze(node: _BNode) -> int:
        if node.children and isinstance(node.children[-1], _BNode):
            node.children[-1] = freeze(node.children[-1])
        return write_node(
            node.is_final, node.final_output,
            tuple(zip(node.inputs, node.outputs, node.children)))

    root = _BNode()
    path: list[_BNode] = [root]
    last: bytes | None = None

    def redistribute(cpl: int, value: int) -> int:
        remaining = value
        for i in range(cpl):
            node = path[i]
            out = node.outputs[-1]
            common = min(out, remaining)
            excess = out - common
            if excess:
                child = node.children[-1]
                for j in range(len(child.outputs)):
                    child.outputs[j] += excess
                if child.is_final:
                    child.final_output += excess
            node.outputs[-1] = common
            remaining -= common
        return remaining

    for key, value in items:
        kb = key.encode("utf-8") if isinstance(key, str) else bytes(key)
        value = int(value) if has_output else 0
        if last is not None:
            if kb < last:
                raise ValueError(
                    f"key {kb!r} not larger than last key {last!r}: "
                    "input must be sorted")
            if kb == last:
                rem = redistribute(len(kb), value)
                path[len(kb)].final_output = rem
                continue
        cpl = 0
        if last:
            m = min(len(last), len(kb))
            while cpl < m and last[cpl] == kb[cpl]:
                cpl += 1
        # freeze the diverged suffix of the previous key (bottom-up)
        while len(path) - 1 > cpl:
            node = path.pop()
            path[-1].children[-1] = freeze(node)
        rem = redistribute(cpl, value)
        node = path[cpl]
        suffix = kb[cpl:]
        for i, b in enumerate(suffix):
            child = _BNode()
            node.inputs.append(b)
            node.outputs.append(rem if i == 0 else 0)
            node.children.append(child)
            path.append(child)
            node = child
        if suffix:
            node.is_final = True
            node.final_output = 0
        else:
            node.is_final = True
            node.final_output = rem
        last = kb

    while len(path) > 1:
        node = path.pop()
        path[-1].children[-1] = freeze(node)
    root_addr = freeze(root)
    buf[0:8] = _U64.pack(root_addr)
    return bytes(buf)


def _parse_node(blob: bytes, addr: int, has_output: bool):
    """→ (is_final, final_output, [(input, output, target_addr)])."""
    t = blob[addr]
    p = addr + 1
    is_final = bool(t & 0x1)
    tc_code = (t & 0x6) >> 1
    final_output = 0
    if has_output and (t >> 3) & 0x1:
        final_output = _U64.unpack_from(blob, p)[0]
        p += 8
    trans = []
    if tc_code:
        n = 1
        if tc_code == 2:
            n = blob[p]
            p += 1
        for _ in range(n):
            inp = blob[p]
            p += 1
            out = 0
            if has_output:
                out = _U64.unpack_from(blob, p)[0]
                p += 8
            target = _U64.unpack_from(blob, p)[0]
            p += 8
            trans.append((inp, out, target))
    return is_final, final_output, trans


def reference_root_meta(blob: bytes) -> tuple[int, bool]:
    """→ (root address, hasOutput) from the file header."""
    return _U64.unpack_from(blob, 0)[0], bool(blob[8])


def iter_reference_items(blob: bytes):
    """Yield ``(key: str, value: int)`` in lexicographic order by
    mounting the blob (DFS over node addresses, zero preprocessing —
    the object-store / mmap access pattern of the reference reader,
    fst.cpp:221-284)."""
    root_addr, has_output = reference_root_meta(blob)
    stack = [(root_addr, b"", 0)]
    while stack:
        addr, prefix, acc = stack.pop()
        is_final, final_output, trans = _parse_node(blob, addr,
                                                    has_output)
        if is_final:
            yield prefix.decode("utf-8"), acc + final_output
        # push in reverse so the smallest input pops first
        for inp, out, target in reversed(trans):
            stack.append((target, prefix + bytes([inp]), acc + out))
