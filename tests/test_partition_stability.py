"""Partition-count independence: the suite's determinism contract
(decimal accumulation, unique tie-breaks, rounded-then-decimal float
terms) must hold under a hostile shuffle-partition count, not just the
conftest default — the property the driver's value-hash gate rests on.
Runs the most order-sensitive oracle queries at shuffle.partitions=7
(prime, unaligned with cores or file splits) and at 1."""

from __future__ import annotations

import pytest

from presto_on_ray_spark import suite
from tests.oracle_harness import duckdb_connection, run_one

suite.load_all()

# order-sensitive shapes: float aggregation, window frames, iterative
# clustering, portable digests, decimal-summed log terms
SENSITIVE = [
    "q1_pricing_summary",
    "checksum_portable",
    "hll_portable_distinct",
    "agg_entropy",
    "text_lm_score",
    "dedup_neardup_clusters",
    "window_range_frame",
]


@pytest.fixture(scope="module")
def con(sf_correct):
    c = duckdb_connection(sf_correct)
    yield c
    c.close()


@pytest.mark.parametrize("partitions", ["7", "1"])
def test_oracles_stable_across_shuffle_partitioning(
    spark, con, sf_correct, partitions
):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", partitions)
    try:
        for name in SENSITIVE:
            problems = run_one(
                spark, con, name, suite.QUERIES[name],
                suite.ORACLES[name], sf_correct,
            )
            assert not problems, (
                f"{name} @ shuffle.partitions={partitions}: "
                + "; ".join(problems)
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
