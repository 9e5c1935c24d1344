"""Source/sink tests: dictionary text reader (the reference's CLI input
format) and the Graphviz dot writer."""

from __future__ import annotations

import pytest

from orchid_fst_ray.fst import build_fst
from orchid_fst_ray.sources.dictionary_text import read_dictionary_text

REF_DICT = "/root/reference/src/main/fst/testdata/fst_test_dict2.txt"


def test_set_mode_reads_reference_dict(ray_session, ref_words):
    ds = read_dictionary_text(REF_DICT, has_value=False)
    got = ds.to_pandas()["key"].tolist()
    assert sorted(got) == sorted(ref_words)


def test_map_mode_parses_and_drops_malformed(ray_session, tmp_path):
    p = tmp_path / "dict.txt"
    p.write_text("apple,3\n\nbanana,7\nmalformed\ncherry,notanum\n"
                 "comma,in,value\npear,0\n")
    ds = read_dictionary_text(str(p), has_value=True)
    df = ds.to_pandas().sort_values("key").reset_index(drop=True)
    # 'comma,in,value' splits on the FIRST comma → value "in,value" → drop
    assert df["key"].tolist() == ["apple", "banana", "pear"]
    assert df["value"].tolist() == [3, 7, 0]
    assert str(df["value"].dtype) == "uint64"


def test_dot_writer_smoke():
    fst = build_fst(["ab", "ac"], [1, 2])
    dot = fst.to_dot()
    assert dot.startswith("digraph fst {")
    assert dot.rstrip().endswith("}")
    assert "doublecircle" in dot           # final states rendered
    # shared prefix arc carries the redistributed min output (a/1)
    assert 'label="a/1"' in dot
    assert 'label="b"' in dot              # b has 0 residual output
    assert 'label="c/1"' in dot            # c carries the +1 remainder
