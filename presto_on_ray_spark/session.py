"""SparkSession construction tuned for the engine.

The reference's "cluster sizing" surface is JVM heap flags and per-query
memory caps written into config files (reference: presto-mgr.py:18-22,
:65-84). In Spark those map onto SparkConf; this module centralizes the
conf we want both locally (local[N]) and on a real cluster.

Scale stance (100 TB design, tested on local[32]):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and broadcast-join demotion/promotion replace hand-tuning per query.
- shuffle.partitions is only the *initial* number; AQE coalesces. On a
  1000-executor cluster you'd raise initialPartitionNum instead.
- Arrow enabled: every pandas UDF crossing is vectorized.
- session timezone pinned UTC so timestamp semantics are stable across
  driver/executors and match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "presto-on-ray-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # r15 (guide §2.2): size post-shuffle partitions by the
        # advisory BYTE target, not up to the core count — with the
        # default parallelismFirst=true every sub-64MB shuffle still
        # fans out to `cpus` near-empty reduce tasks, which is pure
        # scheduling overhead locally and the small-partition
        # anti-pattern at cluster scale (Spark's own docs recommend
        # false on busy clusters). Parallelism for large inputs is
        # unaffected (partitions are created per advisory bytes).
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            "false",
        )
        # r15: let AQE re-optimize (coalesce) the plans of CACHED
        # relations too. The engine persists every reused index/feature
        # relation; with the default=false those caches freeze the
        # initial shuffle fan-out, so every downstream stage over a
        # cache runs `cpus` tasks regardless of size (measured: the
        # ingest-chain key dropped 1866 -> 197 tasks with identical
        # results — the suite's oracles are partitioning-insensitive
        # by construction, integer/order-insensitive aggregates).
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Small dims (region/nation/supplier/customer at low SF) should
        # always broadcast; 64 MB covers every dim at sf0.1 while at
        # cluster scale AQE re-checks actual sizes at runtime.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Single large parquet files must still parallelize: cap split
        # size so local[32] gets >=32 input partitions at sf0.1.
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.timeType.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    # Deployment-specific overrides without code edits (r15): a JSON
    # object of conf key/values in $SPARK_GRAFT_EXTRA_CONF — how a
    # cluster run re-tunes the scale-dependent knobs above (advisory
    # partition size, broadcast threshold, split size) while the
    # defaults stay sized for the driver's local[cpus] bench.
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if env_conf:
        import json

        try:
            parsed = json.loads(env_conf)
        except ValueError as e:
            raise ValueError(
                f"$SPARK_GRAFT_EXTRA_CONF is not valid JSON: {env_conf!r} ({e})"
            ) from e
        if not isinstance(parsed, dict):
            raise ValueError(
                "$SPARK_GRAFT_EXTRA_CONF must be a JSON object of conf "
                f"key/values, got {type(parsed).__name__}: {env_conf!r}"
            )
        for k, v in parsed.items():
            builder = builder.config(k, str(v))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return spark


def apply_session_defaults(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-built session.

    The driver hands ``entry(spark)`` a session we did not construct
    (mirroring how the reference attaches its CLI to an already-running
    coordinator, presto-mgr.py:268-273). Static conf (memory, master)
    cannot change post-launch, but these SQL confs can.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"
    )
    spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
    )
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Presto has a first-class TIME type (SURVEY §1.2); Spark 4.1 ships
    # one behind this flag (literal, casts, hour/minute/second/extract,
    # ordering, parquet round-trip all native once enabled).
    spark.conf.set("spark.sql.timeType.enabled", "true")
    return spark
