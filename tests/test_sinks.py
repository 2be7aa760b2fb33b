"""Partitioned sink + partition pruning proof."""

from hadoop_distexec_spark.sources.sinks import orders_by_year, read_partition_pruned
from tests.conftest import SF_SMALL


def test_partitioned_write_and_prune(spark, tmp_path):
    out = str(tmp_path / "orders_part")
    orders_by_year(spark, SF_SMALL, out)
    df = read_partition_pruned(spark, out, 1996)
    # correctness: only 1996 rows
    years = [r["order_year"] for r in df.select("order_year").distinct().collect()]
    assert years == [1996]
    # plan: the filter must be a PartitionFilter on the scan, pruning
    # directories before any file read
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "order_year" in plan.split("PartitionFilters", 1)[1][:200]


def test_sync_deletes_removes_extras_keeps_outputs(spark, tmp_path):
    """DistCp -delete heritage (DistCp.java:1240-1327) as an anti-join:
    stray dst files/dirs go, produced outputs and engine internals stay."""
    import os

    from hadoop_distexec_spark import distexec
    from hadoop_distexec_spark.pipe.sync import sync_deletes

    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("alpha\n")
    (src / "sub" / "b.txt").write_text("beta\n")
    dst = str(tmp_path / "dst")
    distexec(spark, str(src), dst, "cat")
    # strays: a file, a nested dir with a file, and an empty dir
    (tmp_path / "dst" / "stray.txt").write_text("x")
    os.makedirs(os.path.join(dst, "straydir", "deep"))
    with open(os.path.join(dst, "straydir", "deep", "c.txt"), "w") as f:
        f.write("y")

    dry = sync_deletes(spark, str(src), dst, dry_run=True)
    assert dry.count() >= 4  # stray.txt + straydir + straydir/deep + c.txt
    assert os.path.exists(os.path.join(dst, "stray.txt"))  # dry run: untouched

    deleted = {r["rel_dst"] for r in sync_deletes(spark, str(src), dst).collect()}
    assert "stray.txt" in deleted and "straydir/deep/c.txt" in deleted
    assert not os.path.exists(os.path.join(dst, "stray.txt"))
    assert not os.path.exists(os.path.join(dst, "straydir"))
    # produced outputs + internals survive
    assert open(os.path.join(dst, "a.txt")).read() == "alpha\n"
    assert open(os.path.join(dst, "sub", "b.txt")).read() == "beta\n"
    assert any(n.startswith("_distexec_") for n in os.listdir(dst))
    # idempotent: second sync deletes nothing
    assert sync_deletes(spark, str(src), dst).count() == 0
