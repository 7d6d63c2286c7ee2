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


# Cross-engine 60-bit row digest: md5 (byte-identical in every engine)
# → first 15 hex chars → bigint. xxhash64 is the fast JVM-side digest
# for production paths (checksum_agg); this portable form is what makes
# order-insensitive checksums and HLL registers exactly reproducible by
# the DuckDB oracle.
def _portable_h60(*cols):
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *cols)), 1, 15), 16, 10
    ).cast("long")


def _h60_sql(expr: str) -> str:
    """DuckDB SQL for the same 60-bit digest: parse 15 hex chars as
    shifted digit values (exact bigint arithmetic, no hex-cast needed).

    The lambda variable is deliberately collision-proof: DuckDB lambda
    variables SHADOW outer columns, so when ``expr`` referenced a
    column named ``i`` the digest silently hashed the lambda index
    instead (round-8 `dedup_substring_windows` oracle bug — every
    window of a doc hashed identically). Even so, prefer passing a
    NAMED column materialized in an inner subquery over inlining a
    complex expression (pinned by tests/test_sketches.py)."""
    return f"""
      CAST(LIST_SUM(LIST_TRANSFORM(range(1,16),
        __h60_pos -> (strpos('0123456789abcdef', substr(md5({expr}), CAST(__h60_pos AS INTEGER), 1)) - 1)::BIGINT
             << (4*(15-CAST(__h60_pos AS INTEGER))))) AS BIGINT)
    """


@query(
    "checksum_portable",
    oracle=f"""
    SELECT l_returnflag, BIT_XOR(h60) AS checksum
    FROM (SELECT l_returnflag,
                 {_h60_sql("concat_ws('|', l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT))")} AS h60
          FROM lineitem)
    GROUP BY l_returnflag
    """,
)
def checksum_portable(spark, sf_dir):
    """Presto checksum(x) with a cross-engine-reproducible digest:
    bit_xor over a 60-bit md5-derived row hash — associative and
    commutative, so the distributed fold is order-free, and the DuckDB
    oracle reproduces the exact value (the xxhash64 production twin is
    checksum_agg). One hash + one XOR aggregate per row; scales as a
    plain distributive aggregation."""
    li = t(spark, sf_dir, "lineitem")
    h60 = _portable_h60(
        F.col("l_orderkey"), F.col("l_linenumber"), F.col("l_quantity").cast("long")
    )
    return li.groupBy("l_returnflag").agg(F.bit_xor(h60).alias("checksum"))


# Raw-estimator constant for the portable HLL: alpha(256) * 256^2 * 2^53
# (fixed-point scale 2^53 keeps the register sum exact in a bigint).
_HLL_PORTABLE_C = 0.7213 / (1 + 1.079 / 256) * 65536.0 * float(1 << 53)


@query(
    "hll_portable_distinct",
    oracle=f"""
    WITH h AS (
      SELECT o_orderstatus, {_h60_sql("concat_ws('|', 'c', o_custkey)")} AS h60
      FROM orders
    ),
    r AS (
      SELECT o_orderstatus, h60 % 256 AS reg,
             MAX(CASE WHEN (h60 // 256) = 0 THEN 53
                      ELSE 53 - LENGTH(bin(h60 // 256)) END) AS r
      FROM h GROUP BY 1, 2
    ),
    a AS (
      SELECT o_orderstatus, SUM(1::BIGINT << (53 - r)) AS sp, COUNT(*) AS n
      FROM r GROUP BY 1
    )
    SELECT o_orderstatus,
           CAST(FLOOR({_HLL_PORTABLE_C!r} /
                CAST(sp + (256 - n) * (1::BIGINT << 53) AS DOUBLE)) AS BIGINT)
             AS approx_customers
    FROM a
    """,
)
def hll_portable_distinct(spark, sf_dir):
    """approx_distinct whose HLL registers AND estimate the oracle
    reproduces exactly — the hash-green twin of the xxhash64 pipelines:

    - row hash: the portable 60-bit md5 digest (identical both engines);
    - register = hash mod 256, rank = 53 - floor(log2(suffix)) with
      floor(log2) computed EXACTLY as length(bin(x)) - 1 (no float log);
    - estimate = raw harmonic mean in fixed point: sum of 2^(53-rank)
      as exact bigints (max 256*2^53 = 2^61, no overflow), one double
      division at the end — bit-identical cross-engine.

    The raw estimator only (no small-range linear-counting branch: its
    ln() is the one non-reproducible float op; the production xxhash64
    paths in functions/sketches.py keep the correction). Estimate error
    vs true distinct is within the 256-register ~6.5% bound (asserted
    in tests/test_sketches.py). Same scale shape as every HLL here:
    groupBy(group, register) max — shuffle state ≤ |groups|·256."""
    o = t(spark, sf_dir, "orders")
    hh = _portable_h60(F.lit("c"), F.col("o_custkey"))
    regs = (
        o.select(
            "o_orderstatus",
            F.pmod(hh, F.lit(256)).cast("int").alias("_reg"),
            F.shiftrightunsigned(hh, 8).alias("_s"),
        )
        .withColumn(
            "_rank",
            F.when(F.col("_s") == 0, F.lit(53))
            .otherwise(53 - F.length(F.bin(F.col("_s"))))
            .cast("int"),
        )
        .groupBy("o_orderstatus", "_reg")
        .agg(F.max("_rank").alias("_r"))
    )
    agg = regs.groupBy("o_orderstatus").agg(
        F.sum(F.expr("shiftleft(1L, 53 - _r)")).alias("_sp"),
        F.count("*").alias("_n"),
    )
    s_int = F.col("_sp") + (F.lit(256).cast("long") - F.col("_n")) * F.lit(1 << 53).cast("long")
    return agg.select(
        "o_orderstatus",
        F.floor(F.lit(_HLL_PORTABLE_C) / s_int.cast("double"))
        .cast("long")
        .alias("approx_customers"),
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


@query(
    "qdigest_sketch_pipeline",
    oracle="""
    WITH b AS (
      SELECT o_orderstatus,
             CAST(LEAST(GREATEST(FLOOR(CAST(o_totalprice AS DOUBLE) / 2343.75), 0), 255) AS INTEGER) AS bkt
      FROM orders
    ),
    c AS (SELECT o_orderstatus, bkt, COUNT(*) AS n FROM b GROUP BY 1, 2),
    cum AS (
      SELECT o_orderstatus, bkt,
             SUM(n) OVER (PARTITION BY o_orderstatus ORDER BY bkt) AS cum,
             SUM(n) OVER (PARTITION BY o_orderstatus) AS total
      FROM c
    ),
    q AS (
      SELECT o_orderstatus,
             MIN(CASE WHEN cum >= CAST(CEIL(total * 0.5) AS BIGINT) THEN bkt END) AS b50,
             MIN(CASE WHEN cum >= CAST(CEIL(total * 0.9) AS BIGINT) THEN bkt END) AS b90
      FROM cum GROUP BY 1
    )
    SELECT o_orderstatus,
           ROUND(0.0 + (CAST(b50 AS DOUBLE) + 0.5) * 2343.75, 2) AS p50_price,
           ROUND(0.0 + (CAST(b90 AS DOUBLE) + 0.5) * 2343.75, 2) AS p90_price
    FROM q
    """,
)
def qdigest_sketch_pipeline(spark, sf_dir):
    """Presto approx_percentile-as-value workflow (qdigest-lite): build
    per-priority quantile sketches, merge to the status level, read p50
    and p90 from the merged sketch.

    Hash-green against a DuckDB oracle, because the fixed-bucket sketch
    is DETERMINISTIC, not merely approximate: bucket assignment is one
    IEEE double divide + floor (identical both engines), counts are
    exact integers, merge is element-wise add (exact), and the quantile
    walk (first bucket whose cumulative count reaches ceil(p*total)) is
    integer arithmetic. The oracle recomputes the same walk directly at
    the status level — valid because merge-to-coarse of exact counts
    equals counting at the coarse level. Bucket-width accuracy and
    mergeability are additionally pinned in tests/test_sketches.py."""
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
