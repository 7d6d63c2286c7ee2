"""Structured Streaming operators (additive vs the batch-only
reference — SURVEY §2.9): streaming result == batch twin; session
windows partition events."""

from __future__ import annotations

import pyspark.sql.functions as F

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.streaming.windows import (
    run_stream_to_memory,
    sessionize_events,
    tumbling_window_counts,
    tumbling_window_counts_batch,
)


def test_streaming_matches_batch_twin(spark, sf_dir):
    stream_df = tumbling_window_counts(spark, sf_dir)
    assert stream_df.isStreaming
    result = run_stream_to_memory(stream_df, "tumbling_test")
    batch = tumbling_window_counts_batch(spark, sf_dir)
    s = {tuple(r) for r in result.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b, f"stream-vs-batch diff: {s ^ b}"


def test_session_windows_cover_all_events(spark, sf_dir):
    sessions = sessionize_events(spark, sf_dir)
    total_in_sessions = sessions.agg(F.sum("n_events")).collect()[0][0]
    total = t(spark, sf_dir, "events").count()
    assert total_in_sessions == total


def test_session_windows_disjoint_per_user(spark, sf_dir):
    s = sessionize_events(spark, sf_dir).alias("s1")
    s2 = sessionize_events(spark, sf_dir).alias("s2")
    overlaps = (
        s.join(
            s2,
            (F.col("s1.user_id") == F.col("s2.user_id"))
            & (F.col("s1.session_start") < F.col("s2.session_start"))
            & (F.col("s2.session_start") < F.col("s1.session_end")),
        )
    ).count()
    assert overlaps == 0


def test_stateful_running_totals_matches_batch(spark, sf_dir):
    from presto_on_ray_spark.streaming.stateful import (
        running_totals_batch,
        running_totals_stream,
    )

    sdf = running_totals_stream(spark, sf_dir)
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("stateful_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink may hold one row per key per batch; take
    # the last emission per key (max running_count)
    import pyspark.sql.functions as F

    got = (
        spark.table("stateful_totals")
        .groupBy("event_type")
        .agg(
            F.max("running_count").alias("running_count"),
            F.max("running_value").alias("running_value"),
        )
    )
    batch = running_totals_batch(spark, sf_dir)
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in batch.collect()}


def test_streaming_dedup_bounds_match_batch_keys(spark, sf_dir):
    from presto_on_ray_spark.streaming.windows import (
        streaming_dedup,
        streaming_dedup_batch,
    )

    sdf = streaming_dedup(spark, sf_dir)
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("stream_dedup")
    batch = streaming_dedup_batch(spark, sf_dir)
    # one surviving row per key, and the same key set as the batch twin
    gk = {(r.user_id, r.event_type) for r in got.collect()}
    bk = {(r.user_id, r.event_type) for r in batch.collect()}
    assert gk == bk
    assert got.count() == len(gk)


def test_foreachbatch_parquet_sink_roundtrip(spark, sf_dir, tmp_path_factory):
    import os
    import shutil

    from presto_on_ray_spark.operators._util import t as _t
    from presto_on_ray_spark.streaming.windows import stream_to_parquet_foreachbatch

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp_io", "febatch"
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    try:
        stream_to_parquet_foreachbatch(
            spark, sf_dir, out_dir=f"{base}/out", checkpoint_dir=f"{base}/ckpt"
        )
        back = spark.read.parquet(f"{base}/out/batch=0")
        total = _t(spark, sf_dir, "events").count()
        assert back.count() == total
        # every event made it through the stream exactly once
        src_ids = {r.event_id for r in _t(spark, sf_dir, "events").select("event_id").collect()}
        got_ids = {r.event_id for r in back.select("event_id").collect()}
        assert got_ids == src_ids
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stream_stream_join_matches_batch(spark, sf_dir):
    from presto_on_ray_spark.streaming.windows import (
        stream_stream_join,
        stream_stream_join_batch,
    )

    sdf = stream_stream_join(spark, sf_dir)
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.table("ss_join").collect()}
    expected = {tuple(r) for r in stream_stream_join_batch(spark, sf_dir).collect()}
    assert got == expected
    assert len(expected) > 0  # the fixture must actually exercise the join


def test_stream_stream_left_join_matches_batch(spark, sf_dir, tmp_path):
    """Left-outer stream-stream join: every unmatched purchase must
    surface with null click columns once the watermark closes past its
    horizon — matching the batch left join exactly. A far-future
    sentinel event (an event_type neither side selects) is appended to
    a temp copy of the fixture so the final watermark advances past ALL
    real rows; without it, Structured Streaming correctly withholds the
    null rows still inside the closing horizon."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from presto_on_ray_spark.streaming.windows import (
        stream_stream_left_join,
    )
    from presto_on_ray_spark import suite

    src = pq.read_table(f"{sf_dir}/events.parquet")
    max_ts = max(src.column("ts").to_pylist())
    import datetime

    # One sentinel per side, typed so it passes each side's event_type
    # filter (a filter ahead of withWatermark would hide any other type
    # from watermark tracking); user_id=-1 matches nothing, and the
    # purchase sentinel is excluded from the comparison by id.
    far = max_ts + datetime.timedelta(days=30)
    sentinel = pa.table({
        "event_id": [10**9, 10**9 + 1],
        "ts": pa.array([far, far], type=src.schema.field("ts").type),
        "user_id": [-1, -1],
        "event_type": ["click", "purchase"],
        "value": [0.0, 0.0],
        "props": ["{}", "{}"],
    }).select(src.schema.names).cast(src.schema)
    pq.write_table(pa.concat_tables([src, sentinel]), str(tmp_path / "events.parquet"))

    sdf = stream_stream_left_join(spark, str(tmp_path))
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("ss_left_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["purchase_id"], r["click_id"], r["p_user"], r["amount"])
        for r in spark.table("ss_left_join").collect()
        if r["purchase_id"] < 10**9
    }
    expected = {
        tuple(r)
        for r in suite.QUERIES["stream_interval_left_join_batch"](spark, sf_dir).collect()
    }
    assert got == expected
    # the fixture must exercise BOTH matched and null-click rows
    assert any(c is not None for (_, c, _, _) in expected)
    assert any(c is None for (_, c, _, _) in expected)


def test_stream_stream_full_join_matches_batch(spark, sf_dir, tmp_path):
    """Full-outer stream-stream join drained with availableNow + the
    same watermark sentinels: both unmatched purchases and unmatched
    clicks must null-pad, matching the batch full join."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from presto_on_ray_spark import suite
    from presto_on_ray_spark.streaming.windows import stream_stream_full_join

    src = pq.read_table(f"{sf_dir}/events.parquet")
    max_ts = max(src.column("ts").to_pylist())
    far = max_ts + datetime.timedelta(days=30)
    sentinel = pa.table({
        "event_id": [10**9, 10**9 + 1],
        "ts": pa.array([far, far], type=src.schema.field("ts").type),
        "user_id": [-1, -1],
        "event_type": ["click", "purchase"],
        "value": [0.0, 0.0],
        "props": ["{}", "{}"],
    }).select(src.schema.names).cast(src.schema)
    pq.write_table(pa.concat_tables([src, sentinel]), str(tmp_path / "events.parquet"))

    sdf = stream_stream_full_join(spark, str(tmp_path))
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("ss_full_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def key(r):
        return (r["purchase_id"], r["click_id"], r["p_user"], r["c_user"], r["amount"])

    sentinel_ids = {10**9, 10**9 + 1}
    got = {
        key(r)
        for r in spark.table("ss_full_join").collect()
        if (r["purchase_id"] not in sentinel_ids)
        and (r["click_id"] not in sentinel_ids)
    }
    expected = {
        key(r)
        for r in suite.QUERIES["stream_interval_full_join_batch"](spark, sf_dir).collect()
    }
    assert got == expected
    # all three row classes must occur: matched, purchase-only, click-only
    assert any(p is not None and c is not None for (p, c, _, _, _) in expected)
    assert any(c is None for (_, c, _, _, _) in expected)
    assert any(p is None for (p, _, _, _, _) in expected)


def test_streaming_dedup_within_watermark_covers_all_keys(spark, sf_dir):
    """dropDuplicatesWithinWatermark (bounded state age): with a delay
    horizon wider than the fixture's event-time span it must agree with
    the unbounded-state dedup's key set while carrying expirable state;
    outputs never duplicate beyond once-per-horizon."""
    from presto_on_ray_spark.streaming.windows import (
        streaming_dedup_batch,
        streaming_dedup_within_watermark,
    )

    sdf = streaming_dedup_within_watermark(spark, sf_dir, delay="3650 days")
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("stream_dedup_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("stream_dedup_wm")
    batch = streaming_dedup_batch(spark, sf_dir)
    gk = {(r.user_id, r.event_type) for r in got.collect()}
    bk = {(r.user_id, r.event_type) for r in batch.collect()}
    assert gk == bk
    assert got.count() == len(gk)


def test_streaming_with_rocksdb_state_store(spark, sf_dir):
    """ROADMAP item 5: the RocksDB state store (the production choice
    for large streaming state — state lives off-heap/on-disk instead of
    in executor JVM heap) drives the same tumbling-window aggregation
    to the same result as the batch twin, and the progress metrics
    prove RocksDB actually backed the stateful operator."""
    import json

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        sdf = tumbling_window_counts(spark, sf_dir)
        # complete mode: append withholds windows the watermark hasn't
        # closed, so the tail of the bounded replay would be missing
        q = (
            sdf.writeStream.format("memory")
            .queryName("rocksdb_tumbling")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = q.lastProgress
        ops = (progress or {}).get("stateOperators", [])
        metrics = json.dumps(ops)
        assert "rocksdb" in metrics.lower(), metrics[:500]
        got = {
            tuple(r)
            for r in spark.table("rocksdb_tumbling")
            .select("window_start", "event_type", "n_events")
            .collect()
        }
        batch = {
            tuple(r)
            for r in tumbling_window_counts_batch(spark, sf_dir)
            .select("window_start", "event_type", "n_events")
            .collect()
        }
        assert got == batch
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_streaming_dedup_late_duplicate_injection(spark, tmp_path):
    """r6 (VERDICT #7): multi-batch dropDuplicatesWithinWatermark run
    with DELIBERATE late duplicates, mirroring the batch keeper
    semantics within the horizon. Watermarks (delay 1h) lag one batch
    and state eviction runs as batches process, so the timeline spans
    three micro-batches (maxFilesPerTrigger=1):

    batch 1 (sets watermark 11:00 via the 12:00 row):
      k1@10:00 twice   -> one keeper (in-batch duplicate suppressed)
      k2@09:30         -> keeper; state expires at 10:30
      k4@11:50         -> keeper; state alive until 12:50
    batch 2 (watermark 11:00 -> 12:00 via the 13:00 row; k2's expired
             state is evicted as this batch processes):
      k1@10:30  LATE (older than watermark)    -> dropped, never emitted
      k4@11:55  duplicate within live horizon  -> suppressed by state
    batch 3:
      k2@12:30  after k2's state was evicted   -> re-admitted as new
      k4@12:40  still within k4's live horizon -> suppressed
      k3@12:45  brand new                      -> keeper
    """
    import datetime as dt
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()

    def write_batch(name, rows, mtime):
        tbl = pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us", tz="UTC")
                ),
                "seq": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        path = str(src / name)
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    def t(hh, mm):
        return dt.datetime(2024, 6, 1, hh, mm, tzinfo=dt.timezone.utc)

    now = time.time()
    write_batch(
        "b1.parquet",
        [("k1", t(10, 0), 1), ("k1", t(10, 0), 2), ("k2", t(9, 30), 3),
         ("k4", t(11, 50), 4), ("wm", t(12, 0), 5)],
        now - 120,
    )
    write_batch(
        "b2.parquet",
        [("k1", t(10, 30), 6), ("k4", t(11, 55), 7), ("wm2", t(13, 0), 10)],
        now - 60,
    )
    write_batch(
        "b3.parquet",
        [("k2", t(12, 30), 8), ("k4", t(12, 40), 11), ("k3", t(12, 45), 9)],
        now,
    )

    schema = "k string, ts timestamp, seq bigint"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["k"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("late_dup_injection")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("late_dup_injection").collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r.seq)

    # in-batch duplicate suppressed: exactly one k1 keeper, from batch 1
    assert len(by_key["k1"]) == 1 and by_key["k1"][0] in (1, 2)
    # the late k1@10:30 (seq 6) must never surface
    assert 6 not in {s for seqs in by_key.values() for s in seqs}
    # duplicates within the live horizon suppressed: k4 keeps batch 1's row
    assert by_key["k4"] == [4]
    # k2 re-admitted after its state expired (windowed semantics contract)
    assert sorted(by_key["k2"]) == [3, 8]
    # brand-new key in batch 3 kept
    assert by_key["k3"] == [9]
    assert set(by_key) == {"k1", "k2", "k3", "k4", "wm", "wm2"}
    spark.catalog.dropTempView("late_dup_injection")


def test_events_stream_reads_dataset_directory(spark, sf_dir, tmp_path):
    """_events_stream must handle a Spark-written dataset DIRECTORY
    (what a production corpus looks like), not just the fixture's
    single-file layout — the pathGlobFilter-only form silently
    streamed zero rows from a directory (caught on the sf1 rung)."""
    from presto_on_ray_spark.sources.tables import load_table
    from presto_on_ray_spark.streaming.windows import (
        tumbling_window_counts,
        tumbling_window_counts_batch,
    )

    dir_sf = str(tmp_path / "dirlayout")
    load_table(spark, sf_dir, "events").write.parquet(f"{dir_sf}/events.parquet")
    agg = tumbling_window_counts(spark, dir_sf)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("dir_layout_tumbling")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(240), "availableNow run did not finish"
        mem = spark.table("dir_layout_tumbling")
        batch = tumbling_window_counts_batch(spark, sf_dir)
        cols = mem.columns
        assert mem.count() > 0
        assert (
            mem.select(*cols).exceptAll(batch.select(*cols)).count() == 0
            and batch.select(*cols).exceptAll(mem.select(*cols)).count() == 0
        )
    finally:
        q.stop()
        spark.catalog.dropTempView("dir_layout_tumbling")
