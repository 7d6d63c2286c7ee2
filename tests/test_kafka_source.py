"""Kafka source wiring: availability gate, decode path, and pipeline
source-agnosticism (the container ships no Kafka jar, so the wire
decode is proven over a parquet-derived frame with the Kafka wire
shape — binary value + broker timestamp)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from presto_on_ray_spark.sources.kafka import (
    decode_event_records,
    kafka_available,
    read_events_stream,
)
from presto_on_ray_spark.sources.tables import load_table


def test_connector_absent_gives_clear_error(spark):
    # this container has no spark-sql-kafka jar; the gate must say so
    # up front rather than failing inside the source resolution
    assert kafka_available(spark) is False
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        read_events_stream(spark, "localhost:9092", "events")


def test_decode_event_records_roundtrip(spark, sf_dir):
    """Events → JSON wire records (as Kafka would carry them) →
    decode_event_records recovers the typed rows exactly."""
    events = load_table(spark, sf_dir, "events").limit(200)
    wire = events.select(
        F.to_json(
            F.struct("event_id", "user_id", "event_type", "value", "ts", "props")
        )
        .cast("binary")
        .alias("value"),
        # broker append time: event time + delivery delay
        (F.col("ts") + F.expr("INTERVAL 5 SECONDS")).alias("timestamp"),
    )
    decoded = decode_event_records(wire)
    assert [f.name for f in decoded.schema.fields] == [
        "event_id", "user_id", "event_type", "value", "ts", "props",
    ]
    orig = {r.event_id: r for r in events.collect()}
    got = {r.event_id: r for r in decoded.collect()}
    assert set(got) == set(orig)
    some = next(iter(orig))
    assert got[some].event_type == orig[some].event_type
    # payload time wins over broker time; the JSON wire format carries
    # millisecond precision, so compare at ms truncation
    assert got[some].ts.replace(microsecond=got[some].ts.microsecond) == got[some].ts
    delta = abs(got[some].ts - orig[some].ts).total_seconds()
    assert delta < 0.001, "payload ts (ms precision) must win over broker ts (+5 s)"


def test_decoded_records_drive_the_streaming_pipeline(spark, sf_dir):
    """Source-agnosticism: the tumbling-window aggregation consumes the
    Kafka-decoded frame exactly as it consumes the parquet-backed
    events (same shape as streaming/windows.py tumbling_window_counts)."""

    def windowed(df):
        return (
            df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(30,2)")).cast("double").alias("total_value"),
            )
            .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        )

    events = load_table(spark, sf_dir, "events")
    wire = events.select(
        F.to_json(
            F.struct("event_id", "user_id", "event_type", "value", "ts", "props")
        ).cast("binary").alias("value"),
        F.col("ts").alias("timestamp"),
    )
    decoded = decode_event_records(wire)
    via_kafka_shape = windowed(decoded).collect()
    direct = windowed(events).collect()
    assert sorted(map(tuple, via_kafka_shape)) == sorted(map(tuple, direct))
