"""Driver-environment simulation: the grading driver builds its OWN
SparkSession (plain defaults — no engine conf) and calls
__spark_entry__ functions. Run that exact flow in a pristine
subprocess: default session, entry(), and the queries most sensitive to
session state (timezone, legacy parquet conf, pandas UDF registration).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import json, sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("driver-sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

out = {}
df = e.entry(spark)
rows = df.collect()
out["entry_rows"] = len(rows)
out["entry_cols"] = len(df.columns)

qs = e.queries()
for name in [
    "datetime_functions",        # session timezone sensitivity
    "json_extract_ops",          # events nanos conf sensitivity
    "datetime_mysql_patterns",   # pandas UDF registration
    "grouped_pandas_zscore",     # applyInPandas
    "dedup_minhash_lsh",         # persist barriers
    # composed coverage suites in the driver window (multi-member:
    # any session sensitivity in a member surfaces here first)
    "cov_scalar_orders",
    "cov_scalar_fixtures",
    "cov_windows_wide",
    "cov_sketch_exact",
    "cov_tpch_adapted",
    "dedup_lsh_keepers",
    "similarity_ivf_exact",
]:
    out[name] = qs[name](spark, "/root/testdata/sf0.001").count()

out["tz_after"] = spark.conf.get("spark.sql.session.timeZone")
print("RESULT:" + json.dumps(out))
spark.stop()
"""


def test_entry_and_sensitive_queries_on_default_session():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT % {"repo": REPO}],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, proc.stdout[-2000:]
    out = json.loads(line[0][len("RESULT:") :])
    assert out["entry_rows"] > 0 and out["entry_cols"] == 10
    assert out["datetime_functions"] == 301
    assert out["cov_scalar_orders"] > 0
    assert out["cov_scalar_fixtures"] > 0
    assert out["cov_windows_wide"] > 0
    assert out["cov_sketch_exact"] > 0
    assert out["dedup_lsh_keepers"] > 0
    assert out["similarity_ivf_exact"] > 0
    assert out["cov_tpch_adapted"] > 0
    assert out["json_extract_ops"] == 201
    assert out["datetime_mysql_patterns"] == 101
    assert out["grouped_pandas_zscore"] > 0
    assert out["dedup_minhash_lsh"] >= 0
    assert out["tz_after"] == "UTC"
