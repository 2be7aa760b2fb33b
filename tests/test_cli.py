"""CLI surface: argument rules and exit codes mirror the reference
(DistExec.java:256-296 parsing; :350-374 exit-code mapping)."""

import pytest

from hadoop_distexec_spark.cli import main, parse_args
from hadoop_distexec_spark.errors import UsageError


def test_parse_positional_rule():
    ns = parse_args(["-m", "4", "/a", "/b", "/dst", "tr a-z A-Z"])
    assert ns.srcs == ["/a", "/b"]
    assert ns.dst == "/dst"
    assert ns.cmd == "tr a-z A-Z"
    assert ns.m == 4


def test_parse_too_few_args():
    with pytest.raises(UsageError):
        parse_args(["/only", "/two"])


def test_main_exit_codes(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "f.txt").write_text("hi")
    # success
    assert main([str(src), str(tmp_path / "out"), "cat"]) == 0
    assert (tmp_path / "out" / "f.txt").read_text() == "hi"
    # usage
    assert main(["x"]) == -1
    # invalid input
    assert main([str(tmp_path / "nope"), str(tmp_path / "o2"), "cat"]) == -3
    # duplication
    s1, s2 = tmp_path / "s1", tmp_path / "s2"
    s1.mkdir(), s2.mkdir()
    (s1 / "x.txt").write_text("1")
    (s2 / "x.txt").write_text("2")
    assert main([str(s1 / "x.txt"), str(s2 / "x.txt"), str(tmp_path / "o3"), "cat"]) == -2


def test_parse_uri_list_flag(tmp_path):
    """-f reads sources from a file (fetchFileList, dead in the reference
    DistExec.java:188-204, functional here); positionals may supplement."""
    lst = tmp_path / "sources.txt"
    lst.write_text("/a\n\n  /b  \n")
    ns = parse_args(["-f", str(lst), "/dst", "cat"])
    assert ns.srcs == ["/a", "/b"]
    assert ns.dst == "/dst" and ns.cmd == "cat"
    ns2 = parse_args(["-f", str(lst), "/c", "/dst", "cat"])
    assert ns2.srcs == ["/a", "/b", "/c"]
    with pytest.raises(UsageError):
        parse_args(["-f", str(lst), "/only_dst"])
    empty = tmp_path / "empty.txt"
    empty.write_text("\n")
    with pytest.raises(UsageError):
        parse_args(["-f", str(empty), "/dst", "cat"])


def test_main_uri_list_runs(tmp_path):
    s1, s2 = tmp_path / "s1", tmp_path / "s2"
    s1.mkdir(), s2.mkdir()
    (s1 / "a.txt").write_text("one")
    (s2 / "b.txt").write_text("two")
    lst = tmp_path / "lst.txt"
    lst.write_text(f"{s1}\n{s2}\n")
    assert main(["-f", str(lst), str(tmp_path / "out"), "cat"]) == 0
    assert (tmp_path / "out" / "s1" / "a.txt").read_text() == "one"
    assert (tmp_path / "out" / "s2" / "b.txt").read_text() == "two"


def test_cli_delete_syncs_strays(spark, tmp_path):
    import os

    from hadoop_distexec_spark.cli import main

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("data\n")
    dst = str(tmp_path / "dst")
    assert main([str(src), dst, "cat"]) == 0
    with open(os.path.join(dst, "stray.bin"), "w") as f:
        f.write("x")
    assert main(["-update", "-delete", str(src), dst, "cat"]) == 0
    assert not os.path.exists(os.path.join(dst, "stray.bin"))
    assert open(os.path.join(dst, "a.txt")).read() == "data\n"


def test_bare_update_before_positionals(tmp_path):
    """DistCp grammar regression: `distexec -update SRC DST CMD` must parse
    with SRC as a source, not as -update's value (the nargs='?' form
    greedily ate the first positional)."""
    from hadoop_distexec_spark.cli import parse_args

    ns = parse_args(["-update", str(tmp_path), str(tmp_path / "out"), "cat"])
    assert ns.update == "mtime"
    assert ns.srcs == [str(tmp_path)]

    ns = parse_args(["-update", "-updatemode", "hash", str(tmp_path), str(tmp_path / "out"), "cat"])
    assert ns.update == "hash"

    ns = parse_args([str(tmp_path), str(tmp_path / "out"), "cat"])
    assert ns.update is False


def test_update_hash_via_cli_skips(tmp_path):
    """-update -updatemode hash end-to-end: second run skips everything."""
    from hadoop_distexec_spark.cli import main

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("payload\n")
    dst = str(tmp_path / "out")
    assert main([str(src), dst, "cat"]) == 0
    assert main(["-update", "-updatemode", "hash", str(src), dst, "cat"]) == 0
