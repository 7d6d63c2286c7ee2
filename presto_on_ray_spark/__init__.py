"""presto_on_ray_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference system yifeif/presto-on-ray (a Ray control plane launching
stock Presto 0.248; see /root/reference/presto-mgr.py:13). The reference
delegates every query capability to the Presto JVM; this package
re-expresses that entire behavioral contract Spark-first:

- ``Engine`` — the front door: table registration, Presto-dialect SQL,
  DataFrame combinators (reference entry point: presto-mgr.py:268-273,
  the presto-cli `connect` verb).
- ``operators/`` — one module per SURVEY.md §2 operator family, each
  query paired with a DuckDB oracle for differential testing.
- ``functions/`` — the Presto scalar-function surface (SURVEY §2.8)
  as Spark builtins + registered shims.
- ``sources/`` — parquet/JDBC/CSV/JSON readers and writers (SURVEY §2.1).
- ``streaming/`` — additive Structured Streaming operators (the
  reference has none, SURVEY §2.9).
"""

from presto_on_ray_spark.engine import Engine
from presto_on_ray_spark.session import get_spark

__all__ = ["Engine", "get_spark"]
__version__ = "0.1.0"
