"""CLI wrappers (reference fst_cmd.cpp / large_file_sort_cmd.cpp
surface): subprocess smoke + golden tests. Build subcommands own their
Ray session in the child process; query subcommands are Ray-free."""

import subprocess
import sys

REPO = "/root/repo"
TD = "/root/reference/src/main/fst/testdata"


def _run(*argv):
    return subprocess.run([sys.executable, *argv], capture_output=True,
                          text=True, timeout=300)


def test_lfsort_goldens(tmp_path):
    out1 = tmp_path / "keep.txt"
    p = _run(f"{REPO}/scripts/lfsort.py", "-f",
             f"{TD}/large_file_sort_test1_input.txt", "-o", str(out1))
    assert p.returncode == 0, p.stderr
    gold = open(f"{TD}/large_file_sort_test1_standard_contain_empty.txt"
                ).read()
    assert out1.read_text() == gold

    out2 = tmp_path / "drop.txt"
    p = _run(f"{REPO}/scripts/lfsort.py", "-f",
             f"{TD}/large_file_sort_test1_input.txt", "-o", str(out2),
             "-i")
    assert p.returncode == 0, p.stderr
    gold2 = open(f"{TD}/large_file_sort_test1_standard_ignore_empty.txt"
                 ).read()
    assert out2.read_text() == gold2


def test_ofst_map_build_and_queries(tmp_path):
    dict_file = tmp_path / "dict.txt"
    dict_file.write_text(
        "cherry,30\napple,10\nbanana,20\napricot,15\nbanner,25\n")
    fst_file = tmp_path / "d.fst"
    p = _run(f"{REPO}/scripts/ofst.py", "map", "-f", str(dict_file),
             "-o", str(fst_file))
    assert p.returncode == 0, p.stderr

    p = _run(f"{REPO}/scripts/ofst.py", "match", "-f", str(fst_file),
             "-q", "banana")
    assert "banana,20" in p.stdout and "total 1 results" in p.stdout

    p = _run(f"{REPO}/scripts/ofst.py", "prefix", "-f", str(fst_file),
             "-p", "ap")
    assert "apple,10" in p.stdout and "apricot,15" in p.stdout
    assert "total 2 results" in p.stdout

    p = _run(f"{REPO}/scripts/ofst.py", "range", "-f", str(fst_file),
             "-a", "apricot", "-e", "banner")
    assert "total 2 results" in p.stdout          # apricot, banana

    p = _run(f"{REPO}/scripts/ofst.py", "fuzzy", "-f", str(fst_file),
             "-z", "bannana", "-d", "2")
    assert "banana,20" in p.stdout and "total 1 results" in p.stdout

    dot_file = tmp_path / "d.dot"
    p = _run(f"{REPO}/scripts/ofst.py", "dot", "-f", str(fst_file),
             "-o", str(dot_file))
    assert p.returncode == 0 and "digraph" in dot_file.read_text()


def test_ofst_set_reference_format_interop(tmp_path):
    """The CLI writes the reference BYTE FORMAT: mount it directly with
    the library reader and check content."""
    from orchid_fst_ray.fst.reference_format import iter_reference_items
    dict_file = tmp_path / "keys.txt"
    dict_file.write_text("zebra\nape,ignored-tail\nmule\n")
    fst_file = tmp_path / "s.fst"
    p = _run(f"{REPO}/scripts/ofst.py", "set", "-f", str(dict_file),
             "-o", str(fst_file))
    assert p.returncode == 0, p.stderr
    blob = fst_file.read_bytes()
    # set mode keys on the first comma field, like the reference
    assert [k for k, _ in iter_reference_items(blob)] == [
        "ape", "mule", "zebra"]
