#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes its full plan into Spark's no-op sink (write.format
("noop")) so scans, shuffles, and codegen all run but nothing is collected
to the driver. One warm-up query absorbs JVM/codegen startup before
timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_distexec_spark import registry  # noqa: E402
from hadoop_distexec_spark.session import get_spark  # noqa: E402

# headline set: the flagship star join, heavy aggregation, window, top-k,
# plus one of each extension family (dedup / similarity / text / streaming)
HEADLINE = [
    "q_agg_groupby",
    "q_join_multi",
    "q_join_broadcast",
    "q_topk",
    "q_win_running",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_sim_topk",
    "q_text_stats",
    "q_stream_tumble",
    "q_asof_join",
    "q_range_join",
    "q_dedup_embed",
    "q_dedup_groups",
    "q_doc_chunks",
    "q_split_train_test",
    # end-to-end composition: dedup -> clusters -> representative ->
    # split -> pack in one plan, measuring shared-intermediate reuse
    # across stages rather than per-operator cost (see SCALE.md)
    "q_corpus_pipeline",
]


def _bench_assignment_tiers(spark, sf_dir: str, reps: int = 256, k: int = 64) -> dict[str, float]:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from hadoop_distexec_spark.operators.llmops import _assign_hof, _assign_pandas
    from hadoop_distexec_spark.sources.tables import table

    e = table(spark, sf_dir, "embeddings")
    big = (
        e.crossJoin(spark.range(reps).select(F.col("id").alias("rep")))
        .select((F.col("vec_id") * reps + F.col("rep")).alias("vec_id"), "embedding", "label")
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    big.count()
    try:
        w = W.partitionBy("label").orderBy("vec_id")
        cents = (
            big.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .limit(k)
            .select(
                F.row_number().over(W.orderBy("vec_id")).cast("int").alias("cluster"),
                F.col("embedding").alias("centroid"),
            )
            .localCheckpoint(eager=True)
        )
        vec = big.select("vec_id", "embedding")
        out: dict[str, float] = {}
        for name, fn in (("assign_hof", _assign_hof), ("assign_pandas", _assign_pandas)):
            # small untimed pass first: the pandas tier's Arrow worker pool
            # may have been cycled by the preceding headline queries, and a
            # single timed run right after is bimodal (observed 0.5s vs 13s)
            fn(vec.limit(1000), cents).write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(3):  # keep the best warm trial
                t0 = time.perf_counter()
                fn(vec, cents).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 3)
        return out
    finally:
        big.unpersist()


def _bench_pipe_throughput(spark, n_files: int = 16, mb_per_file: int = 8) -> dict:
    """Time `distexec(tree, out, "cat")` over n_files x mb_per_file MiB of
    deterministic bytes; report MB/s through the executor pipe (read ->
    child process -> commit, per file)."""
    import hashlib
    import shutil
    import tempfile

    from hadoop_distexec_spark import distexec

    base = tempfile.mkdtemp(prefix="bench_pipe_")
    tree = os.path.join(base, "tree")
    os.makedirs(tree)
    block = hashlib.sha256(b"bench").digest() * (1024 * 1024 // 32)  # 1 MiB
    for i in range(n_files):
        with open(os.path.join(tree, f"f{i:03d}.bin"), "wb") as fh:
            for _ in range(mb_per_file):
                fh.write(block)
    try:
        # untimed priming run: the first distexec in a session pays
        # executor-side classloading/buffer warmup (measured 3x the steady
        # state); the steady state is what the throughput number means
        distexec(spark, tree, os.path.join(base, "warm"), "cat")
        best = float("inf")
        n_ok = 0
        for t in range(2):
            t0 = time.perf_counter()
            res = distexec(spark, tree, os.path.join(base, f"out{t}"), "cat")
            n_ok = res.filter(res.status == "EXECUTED").count()
            best = min(best, time.perf_counter() - t0)
        mb = n_files * mb_per_file
        return {
            "pipe_mb": mb,
            "pipe_files": n_ok,
            "pipe_sec": round(best, 3),
            "pipe_mbps": round(mb / best, 1),
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    specs = registry.specs()

    # warm-up: run the whole headline set once at the smallest SF so JVM
    # JIT, whole-stage codegen compilation, AQE machinery, and the Python
    # worker pool are warm for every plan shape before anything is timed —
    # the timed sf runs then measure the operators, not JVM cold-start
    warm_dir = "/root/testdata/sf0.001"
    for qid in ["q_agg_groupby"] + HEADLINE:
        try:
            specs[qid].fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # still bench the rest
            print(f"warmup {qid} failed: {exc}", file=sys.stderr)
    spark.catalog.clearCache()

    # The headline set — the driver-graded number — is timed first, right
    # after its warmup pass; supplementary sections (tiers, pipe) follow.
    # One broken query must never zero the whole artifact (BENCH_r02 died
    # on a single AnalysisException): isolate each query, record its error,
    # and always emit the JSON line.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for qid in HEADLINE:
        # queries are independent; don't let one query's persisted
        # intermediates (e.g. the dedup shingle cache) skew the next
        # query's memory/GC profile
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            specs[qid].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[qid] = round(time.perf_counter() - t0, 3)
        except Exception as exc:
            timings[qid] = round(time.perf_counter() - t0, 3)
            errors[qid] = f"{type(exc).__name__}: {exc}"[:500]

    # scorer-tier comparison (not part of the headline total): one k-means
    # ASSIGNMENT round — the per-iteration hot path — with the
    # interpreted-HOF scorer vs the Arrow-batched BLAS pandas_udf scorer.
    # The fixture embeddings table is tiny (2k rows at sf0.1), so the
    # workload is made assignment-heavy the way a real corpus is:
    # replicated to 512k distinct vec_ids and scored against k=64
    # centroids (the HOF tier pays a 64x crossJoin row expansion +
    # interpreted arithmetic; the pandas tier one BLAS call per batch —
    # measured 4.5x faster here and widening with row count, since the
    # HOF tier scales linearly while the BLAS tier is overhead-bound).
    tiers: dict[str, float] = {}
    try:
        tiers = _bench_assignment_tiers(spark, sf_dir)
    except Exception as exc:
        errors["tiers"] = f"{type(exc).__name__}: {exc}"[:500]

    # pipe-core throughput: the reference IS a per-file pipe tool, so the
    # truest baseline comparison is bytes/sec through our executor pipe
    # (reference constants: 256 MiB/map target, 128 KiB stream buffers —
    # BASELINE.md). Deterministic tree, identity command, executor-parallel.
    pipe = {}
    try:
        pipe = _bench_pipe_throughput(spark)
    except Exception as exc:
        errors["pipe"] = f"{type(exc).__name__}: {exc}"[:500]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "tiers": tiers,
        "sf": sf,
    }
    out.update(pipe)
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
