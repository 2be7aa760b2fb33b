"""Pipe-executor semantics suite — every behavior from FIXTURES.md §B with
its reference citation (files under /root/reference/src/main/java/com/kadwa/hadoop/)."""

import os
import pathlib

import pytest

from pyspark.sql import functions as F

from hadoop_distexec_spark import DuplicationError, InvalidInputError, distexec
from hadoop_distexec_spark.pipe.cmdline import exit_ok, tokenize
from hadoop_distexec_spark.pipe.executor import metrics

os.environ.setdefault("DISTEXEC_CLEANUP_SLEEP", "0.1")


@pytest.fixture()
def tree(tmp_path):
    t = tmp_path / "tree"
    (t / "sub").mkdir(parents=True)
    (t / "empty_dir").mkdir()
    (t / "a.txt").write_text("Hello this is my string")
    (t / "sub" / "b.txt").write_text("line one\nline two with pattern\n")
    (t / "nomatch.txt").write_text("nothing to see here\n")
    return t


def test_identity_cat_roundtrip(spark, tree, tmp_path):
    """cat pipe: output bytes == input bytes, counters match
    (SimpleExecutorTest.java:20-36 semantics)."""
    dst = tmp_path / "out"
    res = distexec(spark, str(tree), str(dst), "cat")
    rows = {r["rel_dst"]: r for r in res.collect()}
    assert rows["a.txt"]["status"] == "EXECUTED"
    assert (dst / "a.txt").read_text() == "Hello this is my string"
    assert (dst / "sub" / "b.txt").read_bytes() == (tree / "sub" / "b.txt").read_bytes()
    m = metrics(res).collect()[0]
    assert m["executed"] == 3 and m["fail"] == 0
    assert m["bytes_executed"] == m["bytes_written"] == 23 + 31 + 20


def test_empty_dir_preserved(spark, tree, tmp_path):
    """Empty dirs become manifest records and are mkdir'd at the dest
    (ExecFilesMapper.java:91-105)."""
    dst = tmp_path / "out"
    distexec(spark, str(tree), str(dst), "cat")
    assert (dst / "empty_dir").is_dir()


def test_grep_exit1_tolerated_and_lazy_create(spark, tree, tmp_path):
    """grep exit 1 = no match: not an error, and no dst file is created
    (Executor.java:33-35,50-51; LazyCreateOutputStream
    ExecFilesMapper.java:46-80)."""
    dst = tmp_path / "out"
    res = distexec(spark, str(tree), str(dst), "grep pattern")
    assert res.filter(F.col("status") == "FAIL").count() == 0
    assert not (dst / "nomatch.txt").exists()  # exit 1, no stdout
    assert not (dst / "a.txt").exists()
    assert (dst / "sub" / "b.txt").read_text() == "line two with pattern\n"


def test_nonzero_exit_fails_but_job_continues(spark, tree, tmp_path):
    """A failing command yields FAIL records + log, never kills the job
    (ExecFilesMapper.java:173-208)."""
    dst = tmp_path / "out"
    res = distexec(spark, str(tree), str(dst), "false")
    assert res.count() == 3
    assert res.filter(F.col("status") == "FAIL").count() == 3
    logs = list(pathlib.Path(dst, "_distexec_logs").glob("part*"))
    assert logs, "FAIL log records must be written"
    content = "".join(p.read_text() for p in logs)
    assert "FAIL" in content
    # no destination files created
    assert not (dst / "a.txt").exists()


def test_stderr_side_file(spark, tree, tmp_path):
    """stderr goes to <rel_dst>.stderr with the same lazy semantics
    (ExecFilesMapper.java:86,108,119,148)."""
    dst = tmp_path / "out"
    distexec(spark, str(tree), str(dst), "sh -c 'echo eee 1>&2; cat'")
    assert (dst / "a.txt.stderr").read_text().strip() == "eee"
    assert (dst / "a.txt").read_text() == "Hello this is my string"


def test_redirect_err_to_out(spark, tree, tmp_path):
    """-redirectErrorToOut implemented for real (the reference parsed but
    never applied it, ExecFilesMapper.java:31,232)."""
    dst = tmp_path / "out"
    distexec(
        spark,
        str(tree / "a.txt"),
        str(dst),
        "sh -c 'echo eee 1>&2; cat'",
        redirect_err_to_out=True,
    )
    out = (dst / "a.txt").read_text()
    assert "eee" in out and "Hello this is my string" in out
    assert not (dst / "a.txt.stderr").exists()


def test_duplicate_destination_raises(spark, tmp_path):
    """Two srcs mapping to one rel_dst -> DuplicationError (exit -2
    semantics, DistExec.java:647-673,688-693)."""
    s1 = tmp_path / "s1"
    s2 = tmp_path / "s2"
    s1.mkdir()
    s2.mkdir()
    (s1 / "x.txt").write_text("1")
    (s2 / "x.txt").write_text("2")
    with pytest.raises(DuplicationError):
        distexec(spark, [str(s1 / "x.txt"), str(s2 / "x.txt")], str(tmp_path / "out"), "cat")


def test_missing_src_raises(spark, tmp_path):
    """Nonexistent source -> InvalidInputError accumulating all misses
    (DistExec.java:209-226)."""
    with pytest.raises(InvalidInputError) as ei:
        distexec(
            spark,
            [str(tmp_path / "nope1"), str(tmp_path / "nope2")],
            str(tmp_path / "out"),
            "cat",
        )
    assert len(ei.value.missing) == 2


def test_single_src_dir_special_root(spark, tree, tmp_path):
    """Single source dir + missing dst: children land directly under dst
    (the "special" root rule, DistExec.java:545,553)."""
    dst = tmp_path / "out"
    distexec(spark, str(tree), str(dst), "cat")
    assert (dst / "a.txt").exists()  # not dst/tree/a.txt


def test_multi_src_keeps_basename_prefix(spark, tmp_path):
    """With multiple sources each rebases against its parent, so the source
    basename is part of rel_dst (makeRelative, DistExec.java:388-410)."""
    s1 = tmp_path / "s1"
    s2 = tmp_path / "s2"
    (s1 / "d").mkdir(parents=True)
    s2.mkdir()
    (s1 / "d" / "x.txt").write_text("1")
    (s2 / "y.txt").write_text("2")
    dst = tmp_path / "out"
    distexec(spark, [str(s1), str(s2)], str(dst), "cat")
    assert (dst / "s1" / "d" / "x.txt").exists()
    assert (dst / "s2" / "y.txt").exists()


def test_transform_pipe_iconv_like(spark, tmp_path):
    """A real transforming command (tr, standing in for the README's iconv
    example, reference README.md:10)."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "f.txt").write_text("hello")
    dst = tmp_path / "out"
    distexec(spark, str(src), str(dst), "tr a-z A-Z")
    assert (dst / "f.txt").read_text() == "HELLO"


def test_many_files_balanced(spark, tmp_path):
    """Many small files: every file executes exactly once, results complete
    (split planning DistExec.java:132-177, one-map-per-file cap :419-426)."""
    src = tmp_path / "many"
    src.mkdir()
    import random

    rng = random.Random(42)
    for i in range(100):
        (src / f"f{i:03d}.bin").write_bytes(bytes(rng.randrange(256) for _ in range(rng.randrange(1, 2048))))
    dst = tmp_path / "out"
    res = distexec(spark, str(src), str(dst), "cat")
    assert res.filter(F.col("status") == "EXECUTED").count() == 100
    for i in range(100):
        assert (dst / f"f{i:03d}.bin").read_bytes() == (src / f"f{i:03d}.bin").read_bytes()


def test_cmd_timeout_kills_straggler(spark, tree, tmp_path):
    """A hung command is killed at cmd_timeout, FAILs that file only, and
    the job completes (straggler guard; the reference relied on the MR
    task timeout)."""
    import time as _time

    t0 = _time.time()
    res = distexec(
        spark, str(tree / "a.txt"), str(tmp_path / "out"), "sleep 300", cmd_timeout=2.0
    )
    rows = res.collect()
    assert _time.time() - t0 < 60  # did not wait out the sleep
    assert len(rows) == 1 and rows[0]["status"] == "FAIL"
    assert "timeout" in rows[0]["error"]


def test_metrics_bytes_count_success_only(spark, tree, tmp_path):
    """A command that pumps bytes then fails must not contribute to
    bytes_executed/bytes_written (reference increments byte counters on
    success only, ExecFilesMapper.java:115,152)."""
    res = distexec(spark, str(tree), str(tmp_path / "out"), "sh -c 'cat > /dev/null; exit 3'")
    m = metrics(res).collect()[0]
    assert m["fail"] == 3 and m["executed"] == 0
    assert m["bytes_executed"] == 0 and m["bytes_written"] == 0


def test_results_survive_reuse_after_run(spark, tree, tmp_path):
    """The returned results frame is durable: re-filtering/re-counting it
    later must not re-execute subprocesses (tmp dir is gone by then)."""
    dst = tmp_path / "out"
    res = distexec(spark, str(tree), str(dst), "cat")
    marker = dst / "a.txt"
    first = marker.stat().st_mtime_ns
    # act on the frame repeatedly — durable parquet, no recompute
    assert res.filter(F.col("status") == "EXECUTED").count() == 3
    assert res.count() == 3
    assert marker.stat().st_mtime_ns == first  # no re-run touched outputs


def test_update_mode_skips_fresh_destinations(spark, tree, tmp_path):
    """-update incremental skip (restored from DistCp heritage,
    src/reference/DistCp.java:1192-1237): second run skips everything; a
    touched source re-executes."""
    import time as _time

    dst = tmp_path / "out"
    r1 = distexec(spark, str(tree), str(dst), "cat", update=True)
    assert r1.filter(F.col("status") == "EXECUTED").count() == 3
    r2 = distexec(spark, str(tree), str(dst), "cat", update=True)
    assert r2.filter(F.col("status") == "SKIPPED").count() == 3
    _time.sleep(0.01)
    (tree / "a.txt").write_text("changed content")
    r3 = distexec(spark, str(tree), str(dst), "cat", update=True)
    rows = {r["rel_dst"]: r["status"] for r in r3.collect()}
    assert rows["a.txt"] == "EXECUTED"
    assert rows["sub/b.txt"] == "SKIPPED"
    assert (dst / "a.txt").read_text() == "changed content"


def test_update_hash_mode_content_compare(spark, tree, tmp_path):
    """update='hash' compares source *content* (DistCp needsUpdate intent,
    src/reference/DistCp.java:333-337,1192-1237): a touched-but-unchanged
    source is SKIPPED where mtime mode would re-execute; a content change
    re-executes; FAIL rows drop out of the state so they retry."""
    import time as _time

    dst = tmp_path / "out"
    r1 = distexec(spark, str(tree), str(dst), "cat", update="hash")
    assert r1.filter(F.col("status") == "EXECUTED").count() == 3
    assert (dst / "_distexec_state").is_dir()

    # touch without changing bytes: newer mtime, same content
    _time.sleep(0.01)
    content = (tree / "a.txt").read_text()
    (tree / "a.txt").write_text(content)
    out_mtime = (dst / "a.txt").stat().st_mtime_ns

    r2 = distexec(spark, str(tree), str(dst), "cat", update="hash")
    assert r2.filter(F.col("status") == "SKIPPED").count() == 3
    assert (dst / "a.txt").stat().st_mtime_ns == out_mtime  # untouched

    # same touch under mtime mode DOES re-execute (the documented contrast)
    r3 = distexec(spark, str(tree), str(dst), "cat", update="mtime")
    rows = {r["rel_dst"]: r["status"] for r in r3.collect()}
    assert rows["a.txt"] == "EXECUTED"

    # real content change under hash mode re-executes just that file
    (tree / "a.txt").write_text("brand new bytes")
    r4 = distexec(spark, str(tree), str(dst), "cat", update="hash")
    rows4 = {r["rel_dst"]: r["status"] for r in r4.collect()}
    assert rows4["a.txt"] == "EXECUTED"
    assert rows4["sub/b.txt"] == "SKIPPED"
    assert (dst / "a.txt").read_text() == "brand new bytes"


def test_preserve_mode_and_mtime(spark, tree, tmp_path):
    """-p finalize pass (DistCp heritage, src/reference/DistCp.java:662-712):
    destination files get the source's permission bits and mtime."""
    import os as _os

    src_file = tree / "a.txt"
    _os.chmod(src_file, 0o750)
    _os.utime(src_file, (1_600_000_000, 1_600_000_000))
    dst = tmp_path / "out"
    res = distexec(spark, str(tree), str(dst), "cat", preserve=True)
    assert res.filter(F.col("status") == "FAIL").count() == 0
    st = (dst / "a.txt").stat()
    assert st.st_mode & 0o7777 == 0o750
    assert abs(st.st_mtime - 1_600_000_000) < 1
    # without -p the mode is the process default, not the source's
    res2 = distexec(spark, str(tree), str(tmp_path / "out2"), "cat")
    assert res2.count() == 3
    assert (tmp_path / "out2" / "a.txt").stat().st_mode & 0o7777 != 0o750


def test_filelimit_truncates_prefix(spark, tree, tmp_path):
    """-filelimit keeps only the first N files in src_path order
    (src/reference/DistCp.java:773-778); dirs are unaffected."""
    res = distexec(spark, str(tree), str(tmp_path / "out"), "cat", filelimit=2)
    done = sorted(r["rel_dst"] for r in res.filter(F.col("status") == "EXECUTED").collect())
    # src_path order: a.txt, nomatch.txt, sub/b.txt -> first two kept
    assert done == ["a.txt", "nomatch.txt"]
    assert (tmp_path / "out" / "empty_dir").is_dir()  # dirs preserved


def test_sizelimit_truncates_prefix(spark, tree, tmp_path):
    """-sizelimit stops at the first file that would cross the byte
    budget; everything after the cut is dropped (strict prefix)."""
    # file sizes in src_path order: a.txt=23, nomatch.txt=20, sub/b.txt=31
    res = distexec(spark, str(tree), str(tmp_path / "out"), "cat", sizelimit=43)
    done = sorted(r["rel_dst"] for r in res.filter(F.col("status") == "EXECUTED").collect())
    assert done == ["a.txt", "nomatch.txt"]
    res2 = distexec(spark, str(tree), str(tmp_path / "out2"), "cat", sizelimit=42)
    done2 = sorted(r["rel_dst"] for r in res2.filter(F.col("status") == "EXECUTED").collect())
    assert done2 == ["a.txt"]  # nomatch.txt would cross 42 -> cut there


def test_update_rejects_bad_mode(spark, tree, tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="update must be"):
        distexec(spark, str(tree), str(tmp_path / "o"), "cat", update="crc")


def test_pipe_rows_line_filter(spark):
    """pipe_rows: per-partition subprocess line transform, 1:1 contract."""
    from hadoop_distexec_spark.pipe.rows import pipe_rows

    df = spark.createDataFrame([(i, f"word{i}") for i in range(100)], ["id", "w"]).repartition(4)
    out = pipe_rows(df, "tr a-z A-Z", "w", "up")
    got = {r["id"]: r["up"] for r in out.collect()}
    assert got == {i: f"WORD{i}" for i in range(100)}
    # non-1:1 command (grep dropping lines) must raise, not mis-zip
    import pytest as _pytest

    with _pytest.raises(Exception):
        pipe_rows(df, "grep word1", "w", "up").collect()


def test_split_plan_byte_balance(spark, tmp_path):
    """The distributed prefix-sum planner reproduces the reference's
    greedy byte-balance: every bin's byte total stays within one max-file
    of the target (DistExec.java:149-176 invariant)."""
    import random

    from hadoop_distexec_spark.pipe.executor import plan_partitions
    from hadoop_distexec_spark.sources.manifest import build_manifest

    src = tmp_path / "many"
    src.mkdir()
    rng = random.Random(7)
    sizes = [rng.randrange(1, 4096) for _ in range(200)]
    for i, n in enumerate(sizes):
        (src / f"f{i:03d}.bin").write_bytes(b"x" * n)
    manifest = build_manifest(spark, str(src))
    planned, n_tasks, cached = plan_partitions(manifest, n_tasks=8)
    rows = planned.collect()
    cached.unpersist()
    assert len(rows) == 200
    per_bin = {}
    for r in rows:
        per_bin[r["bin"]] = per_bin.get(r["bin"], 0) + r["size"]
    total = sum(sizes)
    target = -(-total // 8)
    assert set(per_bin) <= set(range(8))
    # greedy rule: a bin exceeds target by at most one file
    assert max(per_bin.values()) <= target + max(sizes)


def test_flat_manifest_replans_at_full_width(spark, tmp_path, monkeypatch):
    """A flat directory arrives as 1-2 listing partitions; the planner's
    cheap partition-count heuristic must re-plan at proper width once
    phase-1 counts reveal the manifest is large (otherwise all planning
    collapses onto 1-2 tasks no matter the cluster size). Threshold
    lowered so 120 files in one flat dir trip the redo; the plan stays
    byte-complete and balanced after the re-plan."""
    from hadoop_distexec_spark.pipe import executor
    from hadoop_distexec_spark.sources.manifest import build_manifest

    monkeypatch.setattr(executor, "PLAN_ROWS_PER_PART", 10)
    src = tmp_path / "flat"
    src.mkdir()
    for i in range(120):
        (src / f"f{i:03d}.bin").write_bytes(b"x" * (i + 1))
    manifest = build_manifest(spark, str(src))
    planned, n_tasks, cached = executor.plan_partitions(manifest, n_tasks=4)
    rows = planned.collect()
    n_parts = cached.rdd.getNumPartitions()
    cached.unpersist()
    assert len(rows) == 120
    # re-planned: 120 rows / 10-per-part floor => min(defaultParallelism, 12)
    assert n_parts == min(spark.sparkContext.defaultParallelism, 12)
    assert sum(r["size"] for r in rows) == sum(range(1, 121))
    assert set(r["bin"] for r in rows) <= set(range(4))


def test_tokenizer_and_exit_policy():
    """CommandLineUtil FSM semantics (CommandLineUtil.java:19-78)
    + grep-family exit policy (Executor.java:33-35)."""
    assert tokenize("iconv -f iso8859-1 -t utf-8") == ["iconv", "-f", "iso8859-1", "-t", "utf-8"]
    assert tokenize("sh -c 'echo a b'") == ["sh", "-c", "echo a b"]
    assert tokenize('grep "two words"') == ["grep", "two words"]
    with pytest.raises(ValueError):
        tokenize("sh -c 'unbalanced")
    # VERDICT r03 #6 — pin the Ant FSM's backslash semantics: backslash is
    # an ORDINARY character (no escape processing), unlike POSIX shlex.
    assert tokenize(r'a\b "c d" ' + "'e f'") == [r"a\b", "c d", "e f"]
    assert tokenize(r"grep foo\bar input") == ["grep", r"foo\bar", "input"]
    assert tokenize(r"sed s/a\/b/c/") == ["sed", r"s/a\/b/c/"]
    # adjacent quoted spans concatenate into one token; "" is an empty token
    assert tokenize('a"b c"d') == ["ab cd"]
    assert tokenize("printf ''") == ["printf", ""]
    assert tokenize("""say "it's fine\"""") == ["say", "it's fine"]
    assert exit_ok(["grep", "x"], 1)
    assert exit_ok(["/usr/bin/egrep", "x"], 1)
    assert not exit_ok(["grep", "x"], 2)
    assert not exit_ok(["cat"], 1)
    assert exit_ok(["cat"], 0)


def test_split_plan_bins_contiguous_and_deterministic(spark, tmp_path):
    """The prefix-sum rule implies bin ids are NONDECREASING in global
    src_path order (each bin is a contiguous byte range of the ordered
    manifest) — pins the JVM-side window/offset-map assignment (round 8)
    to the exact semantics the Python mapPartitionsWithIndex pass had,
    and that two plans of the same manifest agree row-for-row."""
    import random

    from hadoop_distexec_spark.pipe.executor import plan_partitions
    from hadoop_distexec_spark.sources.manifest import build_manifest

    src = tmp_path / "contig"
    src.mkdir()
    rng = random.Random(11)
    for i in range(150):
        (src / f"f{i:03d}.bin").write_bytes(b"x" * rng.randrange(1, 2048))
    manifest = build_manifest(spark, str(src))
    planned, n_tasks, cached = plan_partitions(manifest, n_tasks=8)
    rows = sorted(planned.collect(), key=lambda r: r["src_path"])
    bins = [r["bin"] for r in rows]
    assert bins == sorted(bins), "bins must be contiguous in src_path order"
    assert bins[0] == 0 and max(bins) <= 7
    planned2, _, cached2 = plan_partitions(manifest, n_tasks=8)
    rows2 = sorted(planned2.collect(), key=lambda r: r["src_path"])
    assert [(r["src_path"], r["bin"]) for r in rows] == [
        (r["src_path"], r["bin"]) for r in rows2
    ]
    cached.unpersist()
    cached2.unpersist()
