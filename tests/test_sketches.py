"""HLL sketch-as-value: error bounds, mergeability, checksum
order-invariance."""

from __future__ import annotations

import pyspark.sql.functions as F

from presto_on_ray_spark import suite
from presto_on_ray_spark.functions.sketches import (
    approx_set,
    hll_cardinality,
    hll_merge,
)
from presto_on_ray_spark.operators._util import t

suite.load_all()


def test_hll_estimate_within_error(spark, sf_correct):
    o = t(spark, sf_correct, "orders")
    sk = approx_set(o, ["o_orderstatus"], "o_custkey")
    est = {
        r.o_orderstatus: r.e
        for r in sk.select(
            "o_orderstatus", hll_cardinality("hll").alias("e")
        ).collect()
    }
    exact = {
        r.o_orderstatus: r.d
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    for k, ex in exact.items():
        rel = abs(est[k] - ex) / ex
        assert rel < 0.15, f"{k}: est={est[k]} exact={ex} rel={rel}"


def test_hll_merge_equals_rebuild(spark, sf_correct):
    """merge(sketch(A), sketch(B)) must equal sketch(A ∪ B) exactly —
    register-wise max is lossless w.r.t. building over the union."""
    o = t(spark, sf_correct, "orders")
    a = o.filter(F.col("o_orderkey") % 2 == 0)
    b = o.filter(F.col("o_orderkey") % 2 == 1)
    sa = approx_set(a.withColumn("g", F.lit(1)), ["g"], "o_custkey", "ha")
    sb = approx_set(b.withColumn("g", F.lit(1)), ["g"], "o_custkey", "hb")
    merged = (
        sa.join(sb, "g")
        .select(hll_merge(F.col("ha"), F.col("hb")).alias("m"))
        .collect()[0]
        .m
    )
    full = (
        approx_set(o.withColumn("g", F.lit(1)), ["g"], "o_custkey", "h")
        .collect()[0]
        .h
    )
    assert merged == full


def test_hll_pipeline_rollup_consistency(spark, sf_correct):
    df = suite.QUERIES["hll_sketch_pipeline"](spark, sf_correct)
    rows = {r.o_orderstatus: r.approx_customers for r in df.collect()}
    o = t(spark, sf_correct, "orders")
    exact = {
        r.o_orderstatus: r.d
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    for k, ex in exact.items():
        assert abs(rows[k] - ex) / ex < 0.15, (k, rows[k], ex)


def test_checksum_order_invariant(spark, sf_correct):
    li = t(spark, sf_correct, "lineitem")
    base = suite.QUERIES["checksum_agg"](spark, sf_correct)
    # same data, adversarial re-ordering and re-partitioning
    shuffled = (
        li.orderBy(F.col("l_extendedprice").desc())
        .repartition(13)
        .groupBy("l_returnflag")
        .agg(
            F.bit_xor(
                F.xxhash64("l_orderkey", "l_linenumber", "l_quantity")
            ).alias("checksum")
        )
    )
    assert {tuple(r) for r in base.collect()} == {tuple(r) for r in shuffled.collect()}
    # sensitivity: dropping one (provably existing) row must change at
    # least one group digest
    first = li.select("l_orderkey", "l_linenumber").limit(1).collect()[0]
    dropped = (
        li.filter(
            ~(
                (F.col("l_orderkey") == first.l_orderkey)
                & (F.col("l_linenumber") == first.l_linenumber)
            )
        )
        .groupBy("l_returnflag")
        .agg(
            F.bit_xor(
                F.xxhash64("l_orderkey", "l_linenumber", "l_quantity")
            ).alias("checksum")
        )
    )
    assert {tuple(r) for r in base.collect()} != {tuple(r) for r in dropped.collect()}


def test_qsketch_quantile_within_bucket_width(spark, sf_correct):
    import pyspark.sql.functions as F

    from presto_on_ray_spark.functions.sketches import (
        qsketch_agg,
        qsketch_quantile,
    )

    li = t(spark, sf_correct, "lineitem")
    lo, hi = 0.0, 110000.0
    sk = qsketch_agg(li, ["l_linestatus"], "l_extendedprice", lo, hi)
    est = {
        r.l_linestatus: r.p50
        for r in sk.select(
            "l_linestatus", qsketch_quantile("qsk", 0.5, lo, hi).alias("p50")
        ).collect()
    }
    exact = {
        r.l_linestatus: r.p50
        for r in li.groupBy("l_linestatus")
        .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("p50"))
        .collect()
    }
    width = (hi - lo) / 256
    for k, ex in exact.items():
        assert abs(est[k] - ex) <= width, (k, est[k], ex, width)


def test_qsketch_merge_equals_rebuild(spark, sf_correct):
    import pyspark.sql.functions as F

    from presto_on_ray_spark.functions.sketches import (
        qsketch_agg,
        qsketch_merge,
    )

    li = t(spark, sf_correct, "lineitem")
    lo, hi = 0.0, 110000.0
    a = li.filter(F.col("l_orderkey") % 2 == 0).withColumn("g", F.lit(1))
    b = li.filter(F.col("l_orderkey") % 2 == 1).withColumn("g", F.lit(1))
    sa = qsketch_agg(a, ["g"], "l_extendedprice", lo, hi, "qa")
    sb = qsketch_agg(b, ["g"], "l_extendedprice", lo, hi, "qb")
    merged = (
        sa.join(sb, "g").select(qsketch_merge(F.col("qa"), F.col("qb")).alias("m"))
        .collect()[0].m
    )
    full = (
        qsketch_agg(li.withColumn("g", F.lit(1)), ["g"], "l_extendedprice", lo, hi)
        .collect()[0].qsk
    )
    assert merged == full


def test_ddsketch_relative_error_bound(spark, sf_correct):
    """Adaptive log-bucket quantiles land within the (γ-1)/(γ+1)≈1%
    relative-error guarantee of the exact per-group percentiles."""
    from pyspark.sql import functions as F

    from presto_on_ray_spark.operators._util import t as load

    from presto_on_ray_spark.functions.sketches import (
        ddsketch_agg,
        ddsketch_quantile,
    )

    o = load(spark, sf_correct, "orders")
    sk = ddsketch_agg(o, ["o_orderstatus"], "o_totalprice")
    approx = {
        r.o_orderstatus: (r.p50, r.p90)
        for r in sk.select(
            "o_orderstatus",
            ddsketch_quantile("dds", 0.5).alias("p50"),
            ddsketch_quantile("dds", 0.9).alias("p90"),
        ).collect()
    }
    exact = {
        r.o_orderstatus: (r.p50, r.p90)
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
        )
        .collect()
    }
    for k, (a50, a90) in approx.items():
        e50, e90 = exact[k]
        assert abs(a50 - e50) / e50 < 0.015, (k, a50, e50)
        assert abs(a90 - e90) / e90 < 0.015, (k, a90, e90)


def test_ddsketch_merge_is_exact(spark, sf_correct):
    """Merging per-priority sketches equals building one sketch over
    the union — bucket counts add exactly."""
    from presto_on_ray_spark.operators._util import t as load

    from presto_on_ray_spark.functions.sketches import (
        ddsketch_agg,
        ddsketch_merge_grouped,
    )

    o = load(spark, sf_correct, "orders")
    per_prio = ddsketch_agg(o, ["o_orderstatus", "o_orderpriority"], "o_totalprice")
    merged = {
        r.o_orderstatus: dict(r.merged)
        for r in ddsketch_merge_grouped(per_prio, ["o_orderstatus"], "dds").collect()
    }
    direct = {
        r.o_orderstatus: dict(r.dds)
        for r in ddsketch_agg(o, ["o_orderstatus"], "o_totalprice").collect()
    }
    assert merged == direct


def test_hll_sparse_pipeline_matches_dense_path(spark, sf_correct):
    """hll_pipeline_sparse must be bit-identical to the dense
    approx_set -> merge -> cardinality composition (absent sparse
    registers are algebraically rank-0)."""
    from presto_on_ray_spark.functions.sketches import (
        approx_set,
        hll_cardinality_grouped,
        hll_pipeline_sparse,
    )

    o = t(spark, sf_correct, "orders")
    sparse = {
        r.o_orderstatus: r.e
        for r in hll_pipeline_sparse(
            o, ["o_orderstatus", "o_orderpriority"], ["o_orderstatus"],
            "o_custkey", out_col="e",
        ).collect()
    }
    per_prio = approx_set(
        o, ["o_orderstatus", "o_orderpriority"], "o_custkey", sketch_col="hll"
    )
    dense = {
        r.o_orderstatus: r.e
        for r in hll_cardinality_grouped(
            per_prio, ["o_orderstatus"], "hll", out_col="e"
        ).collect()
    }
    assert sparse == dense


def test_h60_sql_survives_lambda_named_columns(spark):
    """Oracle determinism trap #5 (VERDICT r8): _h60_sql expands to a
    DuckDB LIST_TRANSFORM lambda, and DuckDB lambda variables shadow
    outer columns — with the lambda variable named `i`, hashing a
    column named `i` silently hashed the lambda index instead. The
    variable is now collision-proof; this pins _h60_sql == _portable_h60
    on columns named exactly `i` and `h`."""
    import duckdb

    from presto_on_ray_spark.operators.sketch_ops import _h60_sql, _portable_h60

    vals = ["alpha", "bravo charlie", "i", "h", ""]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{v}', '{v[::-1]}')" for v in vals)
        + ") AS t(i, h)"
    )
    duck = con.execute(
        f"SELECT {_h60_sql('i')} AS hi, {_h60_sql('h')} AS hh FROM t"
    ).fetchall()
    sdf = spark.createDataFrame(
        [(v, v[::-1]) for v in vals], "i string, h string"
    )
    got = sdf.select(
        _portable_h60(F.col("i")).alias("hi"),
        _portable_h60(F.col("h")).alias("hh"),
    ).collect()
    assert [(r["hi"], r["hh"]) for r in got] == [tuple(r) for r in duck]
