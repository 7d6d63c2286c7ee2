"""FULL dress rehearsal of the driver's correctness pass: every one of
the 50 window queries on a PRISTINE default SparkSession (no engine
session tuning — the exact environment the grading driver builds),
compared against its DuckDB oracle at sf0.01. The round-3 regression
(events loader vs session conf) is the class of failure only this
pristine-session replica can catch; test_oracle_differential runs on
the tuned conftest session. Slow (~4-6 min) — the last gate before a
snapshot."""

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
    SparkSession.builder.master("local[8]")
    .appName("driver-rehearsal")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from presto_on_ray_spark import suite
from tests.oracle_harness import duckdb_connection, run_one

suite.load_all()
sf = "/root/testdata/sf0.01"
con = duckdb_connection(sf)
failures = {}
for name in suite.CURATED_50:
    try:
        if name in suite.ORACLES:
            problems = run_one(
                spark, con, name, suite.QUERIES[name], suite.ORACLES[name], sf
            )
            if problems:
                failures[name] = "; ".join(problems)
        else:
            n = suite.QUERIES[name](spark, sf).count()
            if n < 0:
                failures[name] = "negative count"
    except Exception as exc:  # noqa: BLE001 - report, don't abort the sweep
        failures[name] = f"EXC: {type(exc).__name__}: {str(exc)[:200]}"
print("RESULT:" + json.dumps(failures))
spark.stop()
"""


def test_all_50_window_rows_green_on_pristine_session():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT % {"repo": REPO}],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, proc.stdout[-2000:]
    failures = json.loads(line[0][len("RESULT:") :])
    assert failures == {}, f"driver-window rows failing on pristine session: {failures}"
