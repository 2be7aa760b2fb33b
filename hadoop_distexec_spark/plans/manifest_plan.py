"""Manifest planning queries — the reference's setup()/planner re-expressed
relationally (SURVEY.md §2.1-2.3), oracle-checkable.

The reference's planner state is three SequenceFile manifests written during
a client-side tree walk (reference DistExec.java:526-614). To make every
planning step verifiable against DuckDB, these queries derive a
deterministic manifest from the ``documents`` fixture table (each document
is "a file": src_path from source/doc_id, size = n_chars). The *real*
filesystem manifest builder lives in
``hadoop_distexec_spark.sources.manifest`` and is exercised by the pipe
executor tests; the relational semantics here are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hadoop_distexec_spark.registry import register
from hadoop_distexec_spark.sources.tables import table

N_SPLITS = 32

# Shared oracle CTE: the documents-derived manifest (files + one dir row per
# distinct source, mirroring the walk emitting both: DistExec.java:568-570).
MANIFEST_CTE = """
WITH manifest AS (
  SELECT concat('/src/', source, '/doc_', CAST(doc_id AS VARCHAR), '.txt') AS src_path,
         n_chars AS size,
         FALSE AS is_dir
  FROM documents
  UNION ALL
  SELECT DISTINCT concat('/src/', source) AS src_path,
         CAST(0 AS BIGINT) AS size,
         TRUE AS is_dir
  FROM documents
)
"""


def manifest_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    files = docs.select(
        F.concat(
            F.lit("/src/"), "source", F.lit("/doc_"), F.col("doc_id").cast("string"), F.lit(".txt")
        ).alias("src_path"),
        F.col("n_chars").cast("long").alias("size"),
        F.lit(False).alias("is_dir"),
    )
    dirs = (
        docs.select(F.concat(F.lit("/src/"), "source").alias("src_path"))
        .distinct()
        .select("src_path", F.lit(0).cast("long").alias("size"), F.lit(True).alias("is_dir"))
    )
    return files.unionByName(dirs)


@register(
    "q_scan_manifest",
    oracle=MANIFEST_CTE + "SELECT src_path, size, is_dir FROM manifest",
)
def q_scan_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive tree scan -> manifest records, one per file and directory
    (reference setup() walk, DistExec.java:546-614)."""
    return manifest_df(spark, sf_dir)


@register(
    "q_rel_dst",
    oracle=MANIFEST_CTE
    + """
    SELECT src_path, regexp_replace(src_path, '^/src/', '') AS rel_dst
    FROM manifest WHERE NOT is_dir
    """,
)
def q_rel_dst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path rebase projection (makeRelative, reference DistExec.java:388-410):
    strip the root prefix, pure string projection in codegen."""
    m = manifest_df(spark, sf_dir)
    return m.filter(~F.col("is_dir")).select(
        "src_path", F.regexp_replace("src_path", "^/src/", "").alias("rel_dst")
    )


@register(
    "q_size_stats",
    oracle=MANIFEST_CTE
    + """
    SELECT COUNT(*) AS src_count,
           CAST(SUM(CASE WHEN is_dir THEN 0 ELSE 1 END) AS BIGINT) AS file_count,
           CAST(SUM(CASE WHEN is_dir THEN 1 ELSE 0 END) AS BIGINT) AS dir_count,
           CAST(SUM(size) AS BIGINT) AS byte_count
    FROM manifest
    """,
)
def q_size_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-time totals srcCount/fileCount/byteCount (reference
    DistExec.java:546-547,566,573-574) as a single hash aggregate."""
    m = manifest_df(spark, sf_dir)
    return m.agg(
        F.count(F.lit(1)).alias("src_count"),
        F.sum(F.when(F.col("is_dir"), 0).otherwise(1)).alias("file_count"),
        F.sum(F.when(F.col("is_dir"), 1).otherwise(0)).alias("dir_count"),
        F.sum("size").alias("byte_count"),
    )


@register(
    "q_filter_files",
    oracle=MANIFEST_CTE + "SELECT src_path, size FROM manifest WHERE NOT is_dir",
)
def q_filter_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dir/file routing predicate (reference DistExec.java:568-570;
    ExecFilesMapper.java:91) as a filter."""
    m = manifest_df(spark, sf_dir)
    return m.filter(~F.col("is_dir")).select("src_path", "size")


@register(
    "q_proj_manifest",
    oracle=MANIFEST_CTE
    + """
    SELECT regexp_replace(src_path, '^/src/', '') AS rel_dst, src_path
    FROM manifest WHERE NOT is_dir
    """,
)
def q_proj_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dst_files projection (rel_dst, src_path) — the second manifest the
    reference writes (DistExec.java:596-597)."""
    m = manifest_df(spark, sf_dir)
    return m.filter(~F.col("is_dir")).select(
        F.regexp_replace("src_path", "^/src/", "").alias("rel_dst"), "src_path"
    )


@register(
    "q_dup_check",
    oracle="""
    SELECT rel_dst, COUNT(*) AS n_srcs
    FROM (SELECT concat(source, '/part_', CAST(doc_id % 20 AS VARCHAR), '.txt') AS rel_dst
          FROM documents) t
    GROUP BY rel_dst
    HAVING COUNT(*) > 1
    """,
)
def q_dup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-destination check: the reference external-sorts dst_files
    and compares neighbors (DistExec.java:647-673); sort+neighbor-compare ≡
    groupBy(rel_dst).count() > 1, which Catalyst executes as a hash
    aggregate — no global sort at all. Here destinations are derived with
    deliberate collisions (doc_id % 20) so the check has rows to find."""
    docs = table(spark, sf_dir, "documents")
    dst = docs.select(
        F.concat(
            F.lit(""), "source", F.lit("/part_"), (F.col("doc_id") % 20).cast("string"), F.lit(".txt")
        ).alias("rel_dst")
    )
    return dst.groupBy("rel_dst").agg(F.count(F.lit(1)).alias("n_srcs")).filter(F.col("n_srcs") > 1)


@register(
    "q_split_plan",
    oracle=MANIFEST_CTE
    + f"""
    , files AS (SELECT src_path, size FROM manifest WHERE NOT is_dir),
    tot AS (SELECT SUM(size) AS total FROM files),
    c AS (SELECT src_path, size,
                 COALESCE(SUM(size) OVER (ORDER BY src_path
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          FROM files)
    SELECT src_path, size,
           CAST(LEAST(cum_before // ((total + {N_SPLITS - 1}) // {N_SPLITS}),
                      {N_SPLITS - 1}) AS INT) AS split_id
    FROM c, tot
    """,
)
def q_split_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-balanced split assignment — the reference's greedy prefix-sum
    bin-pack (ExecInputFormat.getSplits, DistExec.java:149-176) as a
    cumulative-sum window: split_id = cum_bytes_before / ceil(total/N).

    All integer arithmetic (exact in both engines). The global-order window
    runs on *manifest metadata* (one row per file), which is planning-scale
    even at 100 TB of data; the data itself is never sorted.
    """
    files = manifest_df(spark, sf_dir).filter(~F.col("is_dir")).select("src_path", "size")
    total = files.agg(F.sum("size").alias("total"))
    w = W.orderBy("src_path").rowsBetween(W.unboundedPreceding, -1)
    c = files.withColumn("cum_before", F.coalesce(F.sum("size").over(w), F.lit(0)))
    # integer `div` (exact in both engines; DuckDB twin is `//`)
    split_id = F.expr(
        f"cast(least(cum_before div ((total + {N_SPLITS - 1}) div {N_SPLITS}), "
        f"{N_SPLITS - 1}) as int)"
    )
    return c.crossJoin(F.broadcast(total)).select(
        "src_path", "size", split_id.alias("split_id")
    )


# ---------------------------------------------------------------------------
# compaction_plan — the small-files report over the manifest (round-8
# prep; REGISTERED r08 as q_compaction_plan)
# ---------------------------------------------------------------------------

COMPACT_SMALL = 256  # a file below this many bytes is "small"
COMPACT_TARGET = 4096  # compacted container size (the 128 MiB of the fixture)


def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-directory small-files report + compaction projection — THE
    classic HDFS operations audit the reference's DistCp heritage exists
    to act on: for each source directory, file/byte counts, how many
    files sit under the {COMPACT_SMALL}-byte small threshold, the bytes
    they hold, the file count AFTER packing the small files into
    {COMPACT_TARGET}-byte containers (exact ceil-division, the
    size-balanced split-plan arithmetic in reverse), and the resulting
    file-count reduction in exact ppm. The number an ops runbook reads
    before scheduling a distexec compaction pass; thresholds are
    absolute by design — file-size policy is measured in bytes, not
    corpus share (contrast the itemset rate cutoffs).

    Determinism: exact bigint counts/bytes; ceil division via the
    (x + d - 1) div d identity; ppm via ``div``; directories derive
    from the manifest path by one regexp both engines share.

    Shape at 100 TB: ONE map-side-combinable aggregate on the directory
    key over the file manifest (the same scan every manifest op reads);
    output is |directories| rows. Join-free, hint-free, no window over
    anything bigger than the output."""
    files = manifest_df(spark, sf_dir).filter(~F.col("is_dir"))
    per_dir = (
        files.select(
            F.regexp_replace("src_path", "/[^/]*$", "").alias("dir"),
            "size",
        )
        .groupBy("dir")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("size").alias("bytes"),
            F.sum(F.when(F.col("size") < COMPACT_SMALL, 1).otherwise(0)).alias(
                "n_small"
            ),
            F.sum(
                F.when(F.col("size") < COMPACT_SMALL, F.col("size")).otherwise(0)
            ).alias("small_bytes"),
        )
    )
    n_after = F.expr(
        f"n_files - n_small + CASE WHEN small_bytes = 0 THEN 0"
        f" ELSE (small_bytes + {COMPACT_TARGET} - 1) div {COMPACT_TARGET} END"
    ).cast("long")
    return per_dir.select(
        "dir",
        "n_files",
        "bytes",
        "n_small",
        "small_bytes",
        n_after.alias("n_after_compaction"),
        F.expr(
            f"(n_files - (n_files - n_small + CASE WHEN small_bytes = 0 THEN 0"
            f" ELSE (small_bytes + {COMPACT_TARGET} - 1) div {COMPACT_TARGET} END))"
            " * 1000000 div n_files"
        )
        .cast("long")
        .alias("reduction_ppm"),
    ).orderBy("dir")


COMPACTION_PLAN_ORACLE = (
    MANIFEST_CTE
    + f"""
    , per_dir AS (
      SELECT regexp_replace(src_path, '/[^/]*$', '') AS dir,
             COUNT(*) AS n_files,
             CAST(SUM(size) AS BIGINT) AS bytes,
             CAST(SUM(CASE WHEN size < {COMPACT_SMALL} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_small,
             CAST(SUM(CASE WHEN size < {COMPACT_SMALL} THEN size ELSE 0 END)
                  AS BIGINT) AS small_bytes
      FROM manifest WHERE NOT is_dir GROUP BY 1)
    SELECT dir, n_files, bytes, n_small, small_bytes,
           n_files - n_small + CASE WHEN small_bytes = 0 THEN 0
             ELSE (small_bytes + {COMPACT_TARGET} - 1) // {COMPACT_TARGET} END
             AS n_after_compaction,
           CAST((n_files - (n_files - n_small + CASE WHEN small_bytes = 0 THEN 0
                 ELSE (small_bytes + {COMPACT_TARGET} - 1) // {COMPACT_TARGET}
                 END)) * 1000000 // n_files AS BIGINT) AS reduction_ppm
    FROM per_dir ORDER BY dir
    """
)


# round-8 registration (parity-proven since r07, tests/test_round8_ops.py)
register("q_compaction_plan", oracle=COMPACTION_PLAN_ORACLE)(compaction_plan)
