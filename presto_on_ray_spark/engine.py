"""Engine — the front door (SURVEY §3.3, §7 milestone 0).

The reference's user surface is: start a cluster, attach a catalog,
connect a SQL REPL (reference: presto-mgr.py:248-281). On Spark the
cluster/catalog plumbing is the platform's job, so the engine is a thin,
testable library over an existing SparkSession:

    eng = Engine(spark)                      # ~ start + connect
    eng.register_tables("/root/testdata/sf0.01")   # ~ catalog attach
    eng.sql("SELECT approx_distinct(l_orderkey) FROM lineitem")
    eng.table("lineitem").groupBy(...)       # DataFrame front door

Both front doors converge on one Catalyst logical plan (SURVEY §3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from presto_on_ray_spark import dialect
from presto_on_ray_spark.functions.registry import (
    register_function,
    register_presto_functions,
)
from presto_on_ray_spark.session import apply_session_defaults
from presto_on_ray_spark.sources.tables import load_table, register_tables


class Engine:
    def __init__(self, spark: SparkSession):
        self.spark = apply_session_defaults(spark)
        register_presto_functions(spark)
        self._sf_dir: str | None = None

    # -- catalog ------------------------------------------------------
    def register_tables(self, sf_dir: str, names: list[str] | None = None) -> "Engine":
        """Attach the fixture parquet catalog as temp views."""
        register_tables(self.spark, sf_dir, names)
        self._sf_dir = sf_dir
        return self

    def table(self, name: str) -> DataFrame:
        import os

        from presto_on_ray_spark.sources.tables import TABLES

        if (
            self._sf_dir is not None
            and name in TABLES
            and os.path.exists(os.path.join(self._sf_dir, f"{name}.parquet"))
        ):
            return load_table(self.spark, self._sf_dir, name)
        # anything else (user temp views, catalog tables) resolves
        # through the session catalog
        return self.spark.table(name)

    # -- SQL front door ----------------------------------------------
    def sql(
        self,
        text: str,
        *,
        max_input_bytes: int | None = None,
        pool: str | None = None,
    ) -> DataFrame:
        """Run Presto-dialect SQL (translated) on Spark.

        ``max_input_bytes`` applies admission control (the engine's
        rendering of the reference's query.max-memory caps,
        presto-mgr.py:18-22 — rejects before execution when Catalyst's
        input estimate exceeds the budget); ``pool`` tags this thread's
        actions with a FAIR scheduler pool for per-query isolation.
        See resource_pools.py."""
        df = self.spark.sql(dialect.translate(text))
        if max_input_bytes is not None:
            from presto_on_ray_spark.resource_pools import admit_or_raise

            admit_or_raise(df, max_input_bytes)
        if pool is not None:
            self.spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
        return df

    def spark_sql(self, text: str) -> DataFrame:
        """Run native Spark SQL untranslated."""
        return self.spark.sql(text)

    # -- extensibility (SURVEY §2.10) --------------------------------
    def register_function(self, name: str, fn, return_type) -> "Engine":
        register_function(self.spark, name, fn, return_type)
        return self

    # -- introspection ------------------------------------------------
    def explain(self, df_or_sql) -> str:
        """Formatted physical plan — the engine's perf feedback loop."""
        from presto_on_ray_spark.plans.inspect import explain_formatted

        df = self.sql(df_or_sql) if isinstance(df_or_sql, str) else df_or_sql
        return explain_formatted(df)
