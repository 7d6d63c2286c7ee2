"""Sketch-as-value pipeline (Presto approx_set / merge / cardinality —
SURVEY §2.4 approximate, §7 milestone 3 hard-list item 1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_on_ray_spark.functions.sketches import hll_pipeline_sparse
from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query


@query("hll_sketch_pipeline")
def hll_sketch_pipeline(spark, sf_dir):
    """The mergeable-sketch workflow Presto users run: build per-group
    sketches (approx_set), roll them up a hierarchy level by merging
    (merge), read estimates at the rolled-up level (cardinality).
    Distinct customers per orderpriority, rolled up to orderstatus.

    Executed in the sparse register form (hll_pipeline_sparse): since
    only the rolled-up estimate is consumed, the dense array<int> value
    never needs materializing — every stage is a plain MAX/SUM hash
    aggregate, estimates bit-identical to the dense approx_set/merge/
    cardinality path (equivalence pinned in tests/test_sketches.py).
    Rows-only driver check; error bounds asserted in tests."""
    o = t(spark, sf_dir, "orders")
    return hll_pipeline_sparse(
        o,
        ["o_orderstatus", "o_orderpriority"],
        ["o_orderstatus"],
        "o_custkey",
        out_col="approx_customers",
    )


@query("checksum_agg")
def checksum_agg(spark, sf_dir):
    """Presto checksum(x): order-insensitive aggregate digest. Built as
    bit_xor over per-row xxhash64 — associative/commutative, so the
    distributed fold is deterministic regardless of row order.
    Rows-only driver check (hash constants are engine-specific);
    order-invariance asserted in tests/test_sketches.py."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_xor(F.xxhash64("l_orderkey", "l_linenumber", "l_quantity")).alias(
            "checksum"
        )
    )


@query("qdigest_sketch_pipeline")
def qdigest_sketch_pipeline(spark, sf_dir):
    """Presto approx_percentile-as-value workflow (qdigest-lite): build
    per-priority quantile sketches, merge to the status level, read p50
    and p90 from the merged sketch. Rows-only driver check; bucket-width
    accuracy and exact mergeability pinned in tests/test_sketches.py."""
    from presto_on_ray_spark.functions.sketches import (
        qsketch_agg,
        qsketch_merge_grouped,
        qsketch_quantile,
    )

    lo, hi = 0.0, 600000.0
    o = t(spark, sf_dir, "orders")
    per_prio = qsketch_agg(
        o, ["o_orderstatus", "o_orderpriority"], "o_totalprice", lo, hi
    )
    rolled = qsketch_merge_grouped(per_prio, ["o_orderstatus"], "qsk")
    return rolled.select(
        "o_orderstatus",
        F.round(qsketch_quantile("merged", 0.5, lo, hi), 2).alias("p50_price"),
        F.round(qsketch_quantile("merged", 0.9, lo, hi), 2).alias("p90_price"),
    )


@query("ddsketch_pipeline")
def ddsketch_pipeline(spark, sf_dir):
    """Adaptive quantile sketch workflow (DDSketch-style log buckets —
    the qdigest fidelity upgrade): build per-priority sketches, merge
    to the status level, read p50/p90/p99 with a ~1% RELATIVE error
    guarantee and no declared value range. Rows-only driver check;
    error bounds + exact mergeability in tests/test_sketches.py."""
    from presto_on_ray_spark.functions.sketches import (
        ddsketch_agg,
        ddsketch_merge_grouped,
        ddsketch_quantile,
    )

    o = t(spark, sf_dir, "orders")
    per_prio = ddsketch_agg(
        o, ["o_orderstatus", "o_orderpriority"], "o_totalprice"
    )
    rolled = ddsketch_merge_grouped(per_prio, ["o_orderstatus"], "dds")
    return rolled.select(
        "o_orderstatus",
        F.round(ddsketch_quantile("merged", 0.5), 2).alias("p50_price"),
        F.round(ddsketch_quantile("merged", 0.9), 2).alias("p90_price"),
        F.round(ddsketch_quantile("merged", 0.99), 2).alias("p99_price"),
    )
