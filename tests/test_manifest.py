"""Manifest builder + makeRelative semantics (reference DistExec.java:388-410,
546-614)."""

import pytest

from pyspark.sql import functions as F

from hadoop_distexec_spark.sources.manifest import build_manifest, make_relative, read_uri_list


def test_make_relative_semantics():
    # reference makeRelative (DistExec.java:388-410)
    assert make_relative("/a/b", "/a/b") == "."
    assert make_relative("/a/b", "/a/b/c.txt") == "c.txt"
    assert make_relative("/a/b", "/a/b/c/d.txt") == "c/d.txt"
    assert make_relative("/a/b", "/a/bc.txt") is None  # not a descendant
    assert make_relative("/", "/x") == "x"


@pytest.fixture()
def tree(tmp_path):
    t = tmp_path / "tree"
    (t / "sub" / "deep").mkdir(parents=True)
    (t / "empty").mkdir()
    (t / "a.txt").write_text("aaaa")
    (t / "sub" / "b.txt").write_text("bb")
    (t / "sub" / "deep" / "c.txt").write_text("c")
    return t


def test_build_manifest_walk(spark, tree):
    m = build_manifest(spark, str(tree))
    rows = {r["src_path"]: r for r in m.collect()}
    # root + 3 dirs + 3 files
    assert len(rows) == 7
    files = [r for r in rows.values() if not r["is_dir"]]
    assert {r["rel_dst"] for r in files} == {"a.txt", "sub/b.txt", "sub/deep/c.txt"}
    assert sum(r["size"] for r in files) == 4 + 2 + 1
    # dirs carry size 0 (reference DistExec.java:592)
    assert all(r["size"] == 0 for r in rows.values() if r["is_dir"])
    # root maps to "."
    assert rows[str(tree)]["rel_dst"] == "."


def test_build_manifest_multi_src_root(spark, tree, tmp_path):
    other = tmp_path / "other"
    other.mkdir()
    (other / "z.txt").write_text("z")
    m = build_manifest(spark, [str(tree), str(other)], dst=str(tmp_path / "dst"))
    rels = {r["rel_dst"] for r in m.filter(~F.col("is_dir")).collect()}
    # multi-src: rebased against each src's parent -> basename prefix kept
    assert "tree/a.txt" in rels and "other/z.txt" in rels


def test_size_stats_match_walk(spark, tree):
    m = build_manifest(spark, str(tree))
    agg = m.agg(
        F.count(F.lit(1)).alias("src_count"),
        F.sum(F.when(F.col("is_dir"), 0).otherwise(1)).alias("file_count"),
        F.sum("size").alias("byte_count"),
    ).collect()[0]
    assert agg["src_count"] == 7
    assert agg["file_count"] == 3
    assert agg["byte_count"] == 7


def test_symlink_cycle_terminates(spark, tmp_path):
    """A `ln -s . loop` cycle must not walk forever: symlinked dirs are
    recorded but never expanded."""
    import os

    t = tmp_path / "tree"
    t.mkdir()
    (t / "a.txt").write_text("x")
    os.symlink(".", t / "loop")
    m = build_manifest(spark, str(t))
    rows = {r["src_path"]: r for r in m.collect()}
    # root + a.txt + the loop entry itself; nothing under loop/
    assert len(rows) == 3
    assert not any("/loop/" in p for p in rows)


def test_rel_expr_handles_root_slash(spark):
    """The column rebase must match make_relative when root == '/'
    (the '+2' prefix-strip would eat one extra character)."""
    from hadoop_distexec_spark.sources.manifest import _rel_expr

    df = spark.createDataFrame(
        [("/data/a.txt", "/"), ("/data/a.txt", "/data"), ("/data", "/data")],
        "src_path string, root string",
    )
    got = [r[0] for r in df.select(_rel_expr()).collect()]
    assert got == ["data/a.txt", "a.txt", "."]
    for src, root in [("/data/a.txt", "/"), ("/data/a.txt", "/data")]:
        assert make_relative(root, src) in got


def test_unreadable_dir_fails_job(spark, tmp_path):
    """PermissionError must fail the walk (reference client-walk behavior),
    never silently drop a subtree."""
    import os
    import pytest as _pytest

    t = tmp_path / "tree"
    (t / "locked").mkdir(parents=True)
    (t / "locked" / "secret.txt").write_text("s")
    os.chmod(t / "locked", 0o000)
    try:
        if os.access(t / "locked", os.R_OK):  # running as root: chmod is a no-op
            _pytest.skip("cannot create unreadable dir as root")
        with _pytest.raises(Exception):
            build_manifest(spark, str(t)).collect()
    finally:
        os.chmod(t / "locked", 0o755)


def test_uri_list_source(spark, tmp_path):
    lst = tmp_path / "uris.txt"
    lst.write_text("/data/a.txt\n/data/b.txt\n\n  /data/c.txt \n")
    df = read_uri_list(spark, str(lst))
    assert [r["src_path"] for r in df.collect()] == ["/data/a.txt", "/data/b.txt", "/data/c.txt"]
