"""Cap-sensitivity operating curve for the registered capped tiers
(VERDICT r08 next-round #6): measure, per cap in {16, 64, 128, 256},
the label-blocked capped edge build's cost and the capped dedup
clusters' co-membership recall vs the exact tier — so the r09
registration ships with a curve, not the single cap=16 point.

The exact side (q_dedup_embed edges + connected components) is built
ONCE per lane and reused across caps; only the capped side re-runs.
Runs both lanes by default:
  - sf0.01 (natural graph; the driver CORRECTNESS scale), and
  - the replicated 10x adversarial lane (/tmp/sf1_stress, built by
    scripts/sf1_stress.py — shared labels make every cell 10x and the
    pair space 100x; run that script first if the dir is missing).

Prints one JSON line per (lane, cap); paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CAPS = [16, 64, 128, 256]
LANES = {
    "sf0.01": "/root/testdata/sf0.01",
    "10x": "/tmp/sf1_stress",
}


def main() -> None:
    from pyspark.sql import functions as F

    from hadoop_distexec_spark.operators.llmops import (
        embed_edges_capped,
        q_dedup_embed,
    )
    from hadoop_distexec_spark.operators.pipeline import connected_components
    from hadoop_distexec_spark.session import get_spark
    from hadoop_distexec_spark.sources.tables import table

    spark = get_spark("cap_sensitivity")
    rows = []
    for lane, sf_dir in LANES.items():
        if not os.path.isdir(sf_dir):
            print(f"# lane {lane}: {sf_dir} missing, skipped", file=sys.stderr)
            continue
        nodes = table(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("doc_id")
        )
        t0 = time.perf_counter()
        exact = (
            q_dedup_embed(spark, sf_dir)
            .select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
            .localCheckpoint(eager=True)
        )
        n_exact = exact.count()
        exact_sec = time.perf_counter() - t0
        for cap in CAPS:
            t0 = time.perf_counter()
            capped = (
                embed_edges_capped(spark, sf_dir, cap=cap)
                .select(
                    F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
                )
                .localCheckpoint(eager=True)
            )
            n_capped = capped.count()
            build_sec = time.perf_counter() - t0
            lab = connected_components(nodes, capped).withColumnRenamed(
                "component", "c"
            )
            probe = (
                exact.join(
                    lab.select(F.col("doc_id").alias("doc_a"), F.col("c").alias("ca")),
                    "doc_a",
                )
                .join(
                    lab.select(F.col("doc_id").alias("doc_b"), F.col("c").alias("cb")),
                    "doc_b",
                )
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.when(F.col("ca") == F.col("cb"), 1).otherwise(0)).alias(
                        "co"
                    ),
                )
                .collect()[0]
            )
            stats = (
                lab.groupBy("c")
                .count()
                .agg(F.count(F.lit(1)).alias("nc"), F.max("count").alias("mx"))
                .collect()[0]
            )
            row = {
                "lane": lane,
                "cap": cap,
                "n_exact_edges": n_exact,
                "exact_build_sec": round(exact_sec, 1),
                "n_capped_edges": n_capped,
                "capped_build_sec": round(build_sec, 1),
                "edge_recall_ppm": n_capped * 1_000_000 // n_exact if n_exact else None,
                "comember_recall_ppm": (
                    int(probe["co"]) * 1_000_000 // int(probe["n"])
                    if probe["n"]
                    else None
                ),
                "n_clusters": int(stats["nc"]),
                "max_cluster": int(stats["mx"]),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"cap_sensitivity": rows}))


if __name__ == "__main__":
    main()
