"""Reference on-disk FST byte-format interop (fst.h:208-217 header,
fst.cpp:33-94 dump, fst.cpp:221-284 mount)."""

import struct

import pytest

from orchid_fst_ray.fst import Fst, FstBuilder, fuzzy_automaton
from orchid_fst_ray.fst.reference_format import (
    dump_reference_bytes, iter_reference_items, reference_root_meta)

WORDS_FILE = "/root/reference/src/main/fst/testdata/fst_test_dict2.txt"
GOLD_FILE = ("/root/reference/src/main/fst/testdata/"
             "fst_test_dict2_standard.txt")


def _words():
    with open(WORDS_FILE) as f:
        return sorted(set(l.strip() for l in f if l.strip()))


def test_header_layout():
    blob = dump_reference_bytes([("ab", 7)], has_output=True)
    root, has_output = reference_root_meta(blob)
    assert has_output is True
    assert blob[8] == 1
    # terminate node right after the header, one 0x01 type byte
    assert blob[9] == 0x01
    assert root == struct.unpack_from("<Q", blob, 0)[0]
    assert 9 < root < len(blob)


def test_roundtrip_map_values():
    items = [("", 3), ("a", 10), ("ab", 5), ("abc", 0), ("b", 1 << 40),
             ("ba", 7), ("中国", 9), ("中文", 2)]
    blob = dump_reference_bytes(items, has_output=True)
    assert list(iter_reference_items(blob)) == items


def test_roundtrip_set_and_duplicate_last_wins():
    blob = dump_reference_bytes(
        [("x", 0), ("y", 0), ("z", 0)], has_output=False)
    assert [k for k, _ in iter_reference_items(blob)] == ["x", "y", "z"]
    blob2 = dump_reference_bytes(
        [("k", 1), ("k", 2), ("m", 5)], has_output=True)
    assert list(iter_reference_items(blob2)) == [("k", 2), ("m", 5)]


def test_unsorted_rejected():
    with pytest.raises(ValueError, match="not larger"):
        dump_reference_bytes([("b", 0), ("a", 0)], has_output=False)


def test_minimality_shared_suffixes():
    """Frozen-node memoization: shared suffixes must alias, so the blob
    grows sublinearly vs a trie dump of same-suffix keys."""
    keys = [(f"{p}_common_suffix_shared", 0) for p in "abcdefgh"]
    blob = dump_reference_bytes(keys, has_output=False)
    # trie would need 8 copies of the 20-byte suffix chain (~160 node
    # records); sharing keeps it near one copy
    assert len(blob) < 8 * 20 * 10


def test_fst_reference_roundtrip_words():
    words = _words()
    b = FstBuilder(has_output=False)
    b.insert_many(words)
    fst = b.finish()
    blob = fst.to_reference_bytes()
    fst2 = Fst.from_reference_bytes(blob)
    assert list(fst2.keys()) == words
    assert fst2.has_output is False


def test_golden_fuzzy_through_mounted_reference_file():
    """The reference's own golden (hair, d=2 → 214 ordered keys) must
    hold when the dictionary is mounted FROM a reference-format blob."""
    with open(GOLD_FILE) as f:
        golden = [l.strip() for l in f if l.strip()]
    blob = dump_reference_bytes(((w, 0) for w in _words()),
                                has_output=False)
    fst = Fst.from_reference_bytes(blob)
    got = [k for k, _ in fst.search(fuzzy_automaton("hair", 2))]
    assert got == golden
    assert len(got) == 214


def test_values_roundtrip_through_fst_api():
    items = [("alpha", 17), ("beta", 3), ("betamax", 99), ("gamma", 0)]
    b = FstBuilder(has_output=True)
    b.insert_many([k for k, _ in items], [v for _, v in items])
    fst = b.finish()
    fst2 = Fst.from_reference_bytes(fst.to_reference_bytes())
    assert list(fst2.items()) == items
