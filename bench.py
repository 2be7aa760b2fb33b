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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    specs = registry.specs()

    # warm-up: JVM + Python worker pool + codegen paths
    try:
        specs["q_agg_groupby"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception as exc:  # still bench the rest
        print(f"warmup failed: {exc}", file=sys.stderr)

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

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
