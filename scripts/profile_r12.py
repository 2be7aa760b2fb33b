#!/usr/bin/env python
"""Round-12 optimization profiler (guide §1: measure first).

Usage:
    python scripts/profile_r12.py plan  <qid> [out_path]   # .explain("formatted") -> file
    python scripts/profile_r12.py time  <qid> [trials]     # warmup at sf0.001 + best-of-N at sf0.1
    python scripts/profile_r12.py jobs  <qid>              # timed run + per-job wall decomposition

The `jobs` mode registers a SparkListener-free decomposition: it samples
spark.sparkContext.statusTracker job ids before/after and prints the job
count (the blocking-job-overhead signal for the iterative operators).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from hadoop_distexec_spark import registry  # noqa: E402
from hadoop_distexec_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode, qid = sys.argv[1], sys.argv[2]
    spark = get_spark(f"profile_{qid}")
    spec = registry.specs()[qid]

    if mode == "plan":
        out_path = sys.argv[3] if len(sys.argv) > 3 else f"plans/r12/{qid}_plan.txt"
        df = spec.fn(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            f.write(txt)
        print(f"wrote {out_path} ({len(txt)} bytes)")
        return

    # warm: full run at sf0.001 so codegen/JIT/python-worker pools are hot
    spark.sparkContext.setJobDescription(f"warm {qid}")
    _noop(spec.fn(spark, WARM_DIR))
    spark.catalog.clearCache()

    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    st = spark.sparkContext.statusTracker()
    times = []
    for t in range(trials):
        import gc

        spark.catalog.clearCache()
        gc.collect()
        jobs_before = len(st.getJobIdsForGroup(None) or [])
        spark.sparkContext.setJobDescription(f"timed {qid} #{t}")
        t0 = time.perf_counter()
        _noop(spec.fn(spark, SF_DIR))
        dt = time.perf_counter() - t0
        jobs_after = len(st.getJobIdsForGroup(None) or [])
        times.append(dt)
        print(f"trial {t}: {dt:.3f}s  jobs={jobs_after - jobs_before}")
    print(f"{qid}: best {min(times):.3f}s  spread {max(times) - min(times):.3f}s")


if __name__ == "__main__":
    main()
