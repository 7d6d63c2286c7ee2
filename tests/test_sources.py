"""Source/sink parity (SURVEY §2.1): file-format round-trips
(the Hive-connector formats bundled in the launched distribution —
reference launcher.py:176-179), partitioned layout, CTAS-style writes.
Writes stay inside the repo (.tmp_io/, gitignored)."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
import pytest

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.sources.tables import read_files

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp_io")


@pytest.fixture(scope="module", autouse=True)
def _tmpdir():
    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(TMP, exist_ok=True)
    yield
    shutil.rmtree(TMP, ignore_errors=True)


def _nation(spark, sf_dir):
    return t(spark, sf_dir, "nation")


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip_formats(spark, sf_dir, fmt):
    df = _nation(spark, sf_dir)
    path = f"{TMP}/nation_{fmt}"
    writer = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)
    options = {"header": "true", "inferSchema": "true"} if fmt == "csv" else {}
    back = read_files(spark, fmt, path, **options)
    assert back.count() == df.count()
    orig = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in df.collect()}
    got = {
        (int(r.n_nationkey), r.n_name, int(r.n_regionkey)) for r in back.collect()
    }
    assert got == orig


def test_partitioned_write_prunes(spark, sf_dir):
    """Partition-by layout + partition pruning: the 100 TB storage
    pattern. The pruned read must only touch the matching directory."""
    df = t(spark, sf_dir, "orders")
    path = f"{TMP}/orders_by_status"
    df.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path)
    pruned = back.filter(F.col("o_orderstatus") == "F")
    from presto_on_ray_spark.plans.inspect import explain_formatted

    plan = explain_formatted(pruned)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan
    exact = df.filter(F.col("o_orderstatus") == "F").count()
    assert pruned.count() == exact


def test_ctas_style_write_and_read_back_table(spark, sf_dir):
    """CREATE TABLE AS / INSERT parity: write a derived relation, read
    it back as a registered view."""
    agg = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )
    path = f"{TMP}/ctas_agg"
    agg.write.mode("overwrite").parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("ctas_agg")
    assert {tuple(r) for r in spark.table("ctas_agg").collect()} == {
        tuple(r) for r in agg.collect()
    }


def test_jdbc_reader_builds_partitioned_scan(spark):
    """No database server exists in this environment; assert the JDBC
    scan surface (the reference's only connector, mysql.properties:1-4)
    fails with a driver/connection error — not an API error — proving
    the reader plumbing is wired."""
    from presto_on_ray_spark.sources.tables import read_jdbc

    with pytest.raises(Exception) as ei:
        read_jdbc(
            spark,
            "jdbc:mysql://localhost:3306/test",
            "user",
            properties={"user": "x", "password": "y"},
            partition_column="id",
            lower_bound=0,
            upper_bound=100,
            num_partitions=4,
        ).count()
    msg = str(ei.value)
    assert "No suitable driver" in msg or "Communications" in msg or "connect" in msg.lower()


def test_jdbc_roundtrip_embedded_derby(spark, sf_dir):
    """Real JDBC federation (the reference's entire connector story,
    mysql.properties:1-4): write nation through the JDBC sink into an
    embedded Derby database, read it back through a partitioned JDBC
    scan, compare relations."""
    import pyspark.sql.functions as F

    from presto_on_ray_spark.sources.tables import read_jdbc, write_jdbc

    url = f"jdbc:derby:{TMP}/derbydb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = _nation(spark, sf_dir).withColumn(
        "n_nationkey", F.col("n_nationkey").cast("int")
    )
    write_jdbc(df, url, "nation_rt", mode="overwrite", properties=props)
    back = read_jdbc(
        spark,
        url,
        "nation_rt",
        properties=props,
        partition_column="n_nationkey",
        lower_bound=0,
        upper_bound=25,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4  # partitioned range scan
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}
    # predicate pushdown into the remote SQL
    filtered = back.filter(F.col("n_nationkey") < 5)
    assert filtered.count() == df.filter(F.col("n_nationkey") < 5).count()


def test_text_format_roundtrip(spark, sf_dir):
    """`text` source format (SURVEY §2.1 Hive-connector text parity):
    one string column per line."""
    d = _nation(spark, sf_dir).select(F.concat_ws("|", "n_nationkey", "n_name"))
    path = f"{TMP}/nation_text"
    d.write.mode("overwrite").text(path)
    back = read_files(spark, "text", path)
    assert back.columns == ["value"]
    assert back.count() == 25
    parsed = back.select(F.split_part(F.col("value"), F.lit("|"), F.lit(2)).alias("n_name"))
    names = {r.n_name for r in parsed.collect()}
    assert "NATION_0" in names and len(names) == 25


def test_events_ts_loads_as_timestamp_for_both_physical_types(spark, tmp_path):
    """load_table('events') must handle every ts physical type the testdata
    has shipped with: TIMESTAMP(NANOS) (read as bigint under nanosAsLong),
    TIMESTAMP(MICROS) tz-naive (read as timestamp_ntz), and plain
    session-TZ timestamp — all surfacing a TimestampType column with the
    same instant (VERDICT r3 item #1: the round-3 regression assumed a
    physical type the file no longer had)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from presto_on_ray_spark.sources.tables import load_table

    instant = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
    nanos = int(instant.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000) * 1000

    cases = {
        "nanos": pa.table(
            {"event_id": [1], "ts": pa.array([nanos], type=pa.timestamp("ns"))}
        ),
        "micros": pa.table(
            {"event_id": [1], "ts": pa.array([instant], type=pa.timestamp("us"))}
        ),
        "micros_utc": pa.table(
            {"event_id": [1], "ts": pa.array([instant], type=pa.timestamp("us", tz="UTC"))}
        ),
    }
    for label, table in cases.items():
        d = tmp_path / label
        d.mkdir()
        pq.write_table(table, str(d / "events.parquet"))
        df = load_table(spark, str(d), "events")
        assert dict(df.dtypes)["ts"] == "timestamp", (label, df.dtypes)
        [row] = df.collect()
        assert row["ts"] == instant, (label, row["ts"])


def test_federated_join_jdbc_with_parquet(spark, sf_dir):
    """The reference's actual use case is SQL federation (a MySQL
    catalog queried next to warehouse data): join a JDBC-resident
    dimension with a parquet fact in ONE query and check both the
    result and the plan — a JDBCRelation scan feeding a broadcast join
    against the parquet scan, with the dimension filter pushed to the
    remote database."""
    import pyspark.sql.functions as F

    from presto_on_ray_spark.sources.tables import load_table, read_jdbc, write_jdbc

    url = f"jdbc:derby:{TMP}/derbydb_fed;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    nation = load_table(spark, sf_dir, "nation").withColumn(
        "n_nationkey", F.col("n_nationkey").cast("int")
    )
    write_jdbc(nation, url, "nation_dim", mode="overwrite", properties=props)

    dim = read_jdbc(spark, url, "nation_dim", properties=props).filter(
        F.col("n_regionkey") == 1
    )
    cust = load_table(spark, sf_dir, "customer")
    fed = (
        cust.join(
            F.broadcast(dim), cust["c_nationkey"] == dim["n_nationkey"]
        )
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )
    plan = fed._jdf.queryExecution().executedPlan().toString()
    assert "JDBCRelation" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # the dimension predicate reaches the remote scan, not a local filter
    assert "PushedFilters" in plan and "N_REGIONKEY" in plan.upper(), plan

    local_dim = nation.filter(F.col("n_regionkey") == 1)
    expected = {
        (r["n_name"], r["n_customers"])
        for r in cust.join(
            local_dim, cust["c_nationkey"] == local_dim["n_nationkey"]
        )
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
        .collect()
    }
    assert {(r["n_name"], r["n_customers"]) for r in fed.collect()} == expected
    assert expected  # region 1 must actually have customers in the fixture
