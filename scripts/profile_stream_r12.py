#!/usr/bin/env python
"""Decompose the streaming harness queries' wall time (guide §1):
streaming run vs batch twin vs exceptAll assertion, for
q_stream_outer_join / q_stream_full_outer / q_stream_join_data.

Usage: python scripts/profile_stream_r12.py [shuffle_partitions]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from hadoop_distexec_spark.session import get_spark  # noqa: E402
from hadoop_distexec_spark.sources.tables import table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from hadoop_distexec_spark.streaming import windows as w

    spark = get_spark("profile_stream")
    if len(sys.argv) > 1:
        spark.conf.set("spark.sql.shuffle.partitions", sys.argv[1])
        print(f"shuffle.partitions={sys.argv[1]}")

    # warm: one full bounded run at sf0.001
    t0 = time.perf_counter()
    ev = w.read_events_stream(spark, "/root/testdata/sf0.001")
    w._run_bounded(w.streaming_left_outer(ev, ev), "append")
    print(f"warm bounded run sf0.001: {time.perf_counter()-t0:.2f}s")

    for trial in range(2):
        print(f"--- trial {trial} (sf0.1, left outer) ---")
        t0 = time.perf_counter()
        ev = w.read_events_stream(spark, SF_DIR)
        print(f"  read_events_stream: {time.perf_counter()-t0:.2f}s")

        t0 = time.perf_counter()
        got = w._run_bounded(w.streaming_left_outer(ev, ev), "append")
        print(f"  _run_bounded(left_outer): {time.perf_counter()-t0:.2f}s")

        t0 = time.perf_counter()
        batch_ev = table(spark, SF_DIR, "events")
        side_max = batch_ev.groupBy().agg(
            F.max(F.when(F.col("event_type") == "click", F.unix_micros("ts"))).alias("c"),
            F.max(F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))).alias("p"),
        ).collect()[0]
        print(f"  side_max collect: {time.perf_counter()-t0:.2f}s")

        wm_us = min(side_max["c"], side_max["p"]) - w.OUTER_WM_DELAY_US
        cutoff = wm_us - w.OUTER_CLOSE_US
        batch = w.streaming_left_outer(batch_ev, batch_ev)
        got_c = got.filter(F.col("click_ts_us") <= cutoff)
        batch_c = batch.filter(F.col("click_ts_us") <= cutoff)

        t0 = time.perf_counter()
        mism = got_c.exceptAll(batch_c).unionAll(batch_c.exceptAll(got_c)).count()
        print(f"  exceptAll x2 + count: {time.perf_counter()-t0:.2f}s (mism={mism})")

        t0 = time.perf_counter()
        got_c.write.format("noop").mode("overwrite").save()
        print(f"  noop(final got_c): {time.perf_counter()-t0:.2f}s")


if __name__ == "__main__":
    main()
