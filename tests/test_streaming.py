"""Genuine Structured Streaming path: file source -> watermarked window
aggregates -> memory sink, driven to completion with processAllAvailable.
(The batch-mode twins are covered by the oracle parity suite.)

Append-mode + watermark semantics: windows are only emitted once the
watermark passes their end, so the windows containing the stream's final
events are never finalized — that's the operator's contract, and the tests
assert accordingly (complete mode for the tumbling check, emitted-subset
for sessions)."""

from hadoop_distexec_spark.sources.tables import table
from hadoop_distexec_spark.streaming.windows import (
    q_stream_session,
    q_stream_tumble,
    read_events_stream,
    streaming_dedup,
    streaming_session,
    streaming_tumble,
    streaming_user_stats,
)

SF = "/root/testdata/sf0.001"


def _run_stream(df, name, mode):
    q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_tumble_matches_batch(spark):
    """In complete mode every window is emitted; the streaming tumbling
    aggregate over the full file must equal the batch window query."""
    events = read_events_stream(spark, SF)
    _run_stream(streaming_tumble(events), "tumble_out", "complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tumble_out").collect()
    }
    expect = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in q_stream_tumble(spark, SF).collect()
    }
    assert set(got) == set(expect)
    for k, (n, _) in expect.items():
        assert got[k][0] == n


def test_streaming_session_append_is_finalized_subset(spark):
    """Append mode emits only sessions the watermark has closed; every
    emitted session must match the batch gaps-and-islands result, and the
    only missing ones are the final (unclosed) per-user sessions."""
    events = read_events_stream(spark, SF)
    _run_stream(streaming_session(events, watermark="0 seconds"), "session_out", "append")
    got = {
        (r["user_id"], r["session_start_us"]): r["n_events"]
        for r in spark.sql("SELECT * FROM session_out").collect()
    }
    batch = {
        (r["user_id"], r["session_start_us"]): r["n_events"]
        for r in q_stream_session(spark, SF).collect()
    }
    assert got, "no sessions emitted"
    for k, n in got.items():
        assert batch[k] == n, f"session {k} disagrees with batch"
    # append mode withholds at most the last session per user
    missing = set(batch) - set(got)
    n_users = table(spark, SF, "events").select("user_id").distinct().count()
    assert len(missing) <= n_users


def test_streaming_late_data_dropped_by_watermark(spark, tmp_path):
    """Events older than the watermark are dropped, not job-fatal — the
    time-based analog of the reference's per-record failure tolerance
    (SURVEY.md §2.5). Two file batches: batch 2 contains one event far
    behind the watermark; its window must not (re)appear in append output."""
    import datetime as dt

    from pyspark.sql import functions as F, types as T

    src = tmp_path / "stream_src"
    src.mkdir()
    chk = str(tmp_path / "chk")
    base = dt.datetime(2024, 6, 1, 0, 0, 0)

    def write_batch(name, rows):
        pdf = [(i, int((base + dt.timedelta(minutes=m)).timestamp() * 1e9), 1, "click", 1.0, "{}")
               for i, m in rows]
        df = spark.createDataFrame(
            pdf, "event_id long, ts long, user_id long, event_type string, value double, props string"
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(src / name))

    # batch 1: events at minute 0..50 -> watermark advances to max-10min
    write_batch("b1.parquet", [(i, m) for i, m in enumerate(range(0, 60, 10))])

    stream = (
        spark.readStream.schema(
            T.StructType([
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.LongType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("props", T.StringType()),
            ])
        )
        .format("parquet")
        .load(str(src))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp(F.col("window.start")).alias("ws"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        emitted_1 = {r["ws"]: r["n"] for r in spark.sql("SELECT * FROM late_out").collect()}
        # batch 2: one very-late event (minute 5, far behind watermark ~min 40)
        # and one fresh event advancing time
        write_batch("b2.parquet", [(100, 5), (101, 70)])
        q.processAllAvailable()
        emitted_2 = {r["ws"]: r["n"] for r in spark.sql("SELECT * FROM late_out").collect()}
    finally:
        q.stop()
    base_epoch = int(base.timestamp())
    late_window = base_epoch + 0  # the minute-5 event falls in window [0,10)
    # the late event must not create/update its (already-emitted) window with n=2
    assert emitted_2.get(late_window) == emitted_1.get(late_window)
    # progress shows the drop accounted by the watermark
    assert len(emitted_2) >= len(emitted_1)


def test_streaming_dedup_bounded_state(spark):
    """dropDuplicatesWithinWatermark passes each unique event_id once
    (the fixture has no dup ids, so count is preserved)."""
    events = read_events_stream(spark, SF)
    _run_stream(streaming_dedup(events), "dedup_out", "append")
    n = spark.sql("SELECT count(*) c FROM dedup_out").collect()[0]["c"]
    assert n == table(spark, SF, "events").count()


def test_streaming_user_stats_stateful(spark):
    """applyInPandasWithState: final per-user running totals equal the
    batch aggregate (update mode re-emits; take the max-count row)."""
    from pyspark.sql import functions as F

    events = read_events_stream(spark, SF)
    _run_stream(streaming_user_stats(events), "ustats_out", "update")
    final = {
        r["user_id"]: r["n_events"]
        for r in spark.sql(
            "SELECT user_id, max(n_events) AS n_events FROM ustats_out GROUP BY user_id"
        ).collect()
    }
    batch = {
        r["user_id"]: r["n"]
        for r in table(spark, SF, "events").groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert final == batch


def test_streaming_join_matches_batch(spark):
    """Stream-stream click->purchase attribution: the streaming join over
    the full file (append mode, all watermarks passed at EOF... join rows
    are emitted as both sides arrive) must equal the equivalent batch
    join."""
    from hadoop_distexec_spark.streaming.windows import streaming_join

    events = read_events_stream(spark, SF)
    _run_stream(streaming_join(events, events), "sjoin_out", "append")
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM sjoin_out").collect()
    }
    e = table(spark, SF, "events")
    c = e.filter("event_type = 'click'").selectExpr(
        "event_id AS click_id", "user_id AS cu", "ts AS cts"
    )
    p = e.filter("event_type = 'purchase'").selectExpr(
        "event_id AS purchase_id", "user_id AS pu", "ts AS pts"
    )
    from pyspark.sql import functions as F

    batch = {
        (r["click_id"], r["purchase_id"])
        for r in c.join(
            p,
            (F.col("cu") == F.col("pu"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 MINUTES")),
        ).collect()
    }
    assert batch, "fixture produced no click->purchase pairs"
    assert got == batch


def test_foreach_batch_sink_idempotent_layout(spark, tmp_path):
    """foreachBatch parquet sink: rows land partitioned by batch id, and
    the union of batches equals the stream input exactly once."""
    from hadoop_distexec_spark.streaming.windows import write_stream_foreach_batch

    events = read_events_stream(spark, SF).select("event_id", "user_id", "value")
    out, chk = str(tmp_path / "out"), str(tmp_path / "chk")
    q = write_stream_foreach_batch(events, out, chk)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    written = spark.read.parquet(out)
    assert "_batch_id" in written.columns
    assert written.count() == table(spark, SF, "events").count()
    assert written.select("event_id").distinct().count() == written.count()
