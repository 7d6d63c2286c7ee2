"""Deterministic scale-data generator for headline-scaling runs.

The driver ships fixtures at sf0.001/0.01/0.1 (TESTDATA.md, read-only)
but the 100 TB scale claims deserve at least one measured rung above
sf0.1 (VERDICT r5 #3). This job regenerates the same star schema +
documents/embeddings/events tables at an arbitrary scale factor,
statistically matched to the sf0.1 fixture profile (distributions,
key ranges, fanouts, vocabulary, duplicate density measured against
/root/testdata/sf0.1 — see SCALING.md's r6 section) but from its own
seed: it is a PERF dataset, not an oracle dataset.

Spark-first: every column is a pure expression over spark.range — no
driver-side loops, no Python UDFs, no rand() (xxhash64-derived
uniforms are partitioning-independent, so the data is bit-stable for
any executor count). Generation at sf1 is a few seconds per table on
local[32]; the same job would produce sf1000 on a cluster unchanged.

    python scripts/gen_scale_data.py --sf 1.0 --out .scale/sf1
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJ = ["large", "hot", "small", "cold", "dim", "shiny"]
P_NOUN = ["ring", "bolt", "gear", "washer", "plate", "pin"]
LANGS = ["en", "en", "en", "en", "zh", "es", "fr", "de"]  # ~en-heavy mix


def _h(*cols) -> Column:
    """Deterministic 63-bit non-negative hash of the given columns."""
    return F.abs(F.xxhash64(*[F.lit(c) if isinstance(c, str) else c for c in cols]))


def _u(col: Column, salt: str) -> Column:
    """Uniform double in [0, 1) derived from a column + salt."""
    return (_h(col, salt) % F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0


def _pick(col: Column, salt: str, values: list[str]) -> Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_h(col, salt) % len(values) + 1).cast("int"))


def _ts_between(col: Column, salt: str, start: str, end_days: int) -> Column:
    day = (_h(col, salt) % end_days).cast("int")
    return F.to_timestamp(F.date_add(F.lit(start).cast("date"), day))


def gen_region(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(REGIONS)], "r_regionkey INT, r_name STRING"
    )


def gen_nation(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i, f"NATION_{i:02d}", i % 5) for i in range(25)],
        "n_nationkey INT, n_name STRING, n_regionkey INT",
    )


def gen_customer(spark: SparkSession, n: int) -> DataFrame:
    df = spark.range(n).withColumnRenamed("id", "c_custkey")
    k = F.col("c_custkey")
    return df.select(
        k,
        F.format_string("Customer#%09d", k).alias("c_name"),
        (_h(k, "cnat") % 25).cast("int").alias("c_nationkey"),
        F.round(_u(k, "cbal") * 11000 - 1000, 2).alias("c_acctbal"),
        _pick(k, "cseg", SEGMENTS).alias("c_mktsegment"),
    )


def gen_supplier(spark: SparkSession, n: int) -> DataFrame:
    df = spark.range(n).withColumnRenamed("id", "s_suppkey")
    k = F.col("s_suppkey")
    return df.select(
        k,
        F.format_string("Supplier#%09d", k).alias("s_name"),
        (_h(k, "snat") % 25).cast("int").alias("s_nationkey"),
        F.round(_u(k, "sbal") * 11000 - 1000, 2).alias("s_acctbal"),
    )


def gen_part(spark: SparkSession, n: int) -> DataFrame:
    df = spark.range(n).withColumnRenamed("id", "p_partkey")
    k = F.col("p_partkey")
    return df.select(
        k,
        F.concat(_pick(k, "padj", P_ADJ), F.lit(" "), _pick(k, "pnoun", P_NOUN)).alias("p_name"),
        F.concat(F.lit("Brand#"), (_h(k, "pbrand") % 25 + 1).cast("string")).alias("p_brand"),
        _pick(k, "ptype", P_TYPES).alias("p_type"),
        (_h(k, "psize") % 50 + 1).cast("int").alias("p_size"),
        F.round(F.lit(900.0) + _u(k, "pprice") * 99.9, 2).alias("p_retailprice"),
    )


def gen_orders(spark: SparkSession, n: int, n_cust: int) -> DataFrame:
    df = spark.range(n).withColumnRenamed("id", "o_orderkey")
    k = F.col("o_orderkey")
    return df.select(
        k,
        (_h(k, "ocust") % n_cust).alias("o_custkey"),
        _pick(k, "ostat", ["F", "O", "P"]).alias("o_orderstatus"),
        F.round(F.lit(1000.0) + _u(k, "oprice") * 499000, 2).alias("o_totalprice"),
        _ts_between(k, "odate", "1995-01-01", 2405).alias("o_orderdate"),
        _pick(k, "oprio", PRIORITIES).alias("o_orderpriority"),
    )


def gen_lineitem(spark: SparkSession, n_orders: int, n_part: int, n_supp: int) -> DataFrame:
    """~4 lines per order (1..7, the fixture's fanout shape) via a
    map-only explode — no shuffle anywhere in the generator."""
    orders = spark.range(n_orders).withColumnRenamed("id", "l_orderkey")
    k = F.col("l_orderkey")
    fan = (1 + _h(k, "fan1") % 4 + _h(k, "fan2") % 4).cast("int")
    li = orders.select(k, F.explode(F.sequence(F.lit(1), fan)).alias("l_linenumber"))
    h = _h(F.col("l_orderkey") * 8 + F.col("l_linenumber"), "li")
    qty = (h % 50 + 1).cast("double")
    price_per_unit = F.lit(900.0) + _u(h, "lprice") * 1200.0
    return li.select(
        "l_orderkey",
        (_h(h, "lpart") % n_part).alias("l_partkey"),
        (_h(h, "lsupp") % n_supp).alias("l_suppkey"),
        "l_linenumber",
        qty.alias("l_quantity"),
        F.round(qty * price_per_unit, 2).alias("l_extendedprice"),
        ((_h(h, "ldisc") % 11).cast("double") / 100).alias("l_discount"),
        ((_h(h, "ltax") % 9).cast("double") / 100).alias("l_tax"),
        _pick(h, "lflag", ["A", "N", "R"]).alias("l_returnflag"),
        _pick(h, "lstat", ["F", "O"]).alias("l_linestatus"),
        _ts_between(h, "lship", "1995-01-02", 2498).alias("l_shipdate"),
    )


def gen_events(spark: SparkSession, n: int, n_users: int) -> DataFrame:
    df = spark.range(n).withColumnRenamed("id", "event_id")
    k = F.col("event_id")
    # 30-day span regardless of n: spacing shrinks as sf grows, jitter
    # keeps arrival order != event_id order locally
    span_us = 30 * 86_400_000_000
    base_us = k * F.lit(span_us // max(n, 1)) + (_h(k, "ejit") % 2_000_000)
    return df.select(
        k,
        F.timestamp_micros(
            (F.lit("2024-01-01 00:00:00").cast("timestamp").cast("bigint") * 1_000_000
             + base_us).cast("bigint")
        ).alias("ts"),
        (_h(k, "euser") % n_users).alias("user_id"),
        _pick(k, "etype", EVENT_TYPES).alias("event_type"),
        F.round(_u(k, "eval") * 560, 2).alias("value"),
        F.format_string('{"k": %d}', (_h(k, "eprop") % 100).cast("int")).alias("props"),
    )


def gen_documents(spark: SparkSession, n: int) -> DataFrame:
    """Synthetic corpus with the fixture's duplicate structure: ~0.2%
    exact duplicates and ~3% near-duplicates (one word substituted in
    a nearby base doc — Jaccard stays above any 0.7/0.8 threshold).
    Text is a pure function of a SEED column, so a duplicate simply
    reuses its base doc's seed; the whole corpus is one map-only
    projection."""
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    k = F.col("doc_id")
    dup_kind = _h(k, "dupkind") % 1000  # <2 exact, <30 near
    base = F.greatest(F.lit(0), k - (_h(k, "dupbase") % 5 + 1))
    seed = F.when(dup_kind < 30, base).otherwise(k)
    n_words = (_h(seed, "dlen") % 93 + 8).cast("int")
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.element_at(vocab, (_h(seed * 131 + j, "dword") % len(VOCAB) + 1).cast("int")),
    )
    # near-dup mutation: overwrite one position with a different word
    mut_pos = (_h(k, "dmutpos") % n_words + 1).cast("int")
    mut_word = F.element_at(vocab, (_h(k, "dmutw") % len(VOCAB) + 1).cast("int"))
    mutated = F.transform(
        words, lambda w, i: F.when(i + 1 == mut_pos, mut_word).otherwise(w)
    )
    text = F.array_join(
        F.when((dup_kind >= 2) & (dup_kind < 30), mutated).otherwise(words), " "
    )
    return df.select(
        k,
        text.alias("text"),
        _pick(seed, "dlang", LANGS).alias("lang"),
        F.concat(F.lit("src"), (_h(seed, "dsrc") % 20).cast("string")).alias("source"),
        F.length(text).cast("bigint").alias("n_chars"),
    )


def gen_embeddings(spark: SparkSession, n: int, dim: int = 64, labels: int = 10) -> DataFrame:
    """Clustered vectors: per-label centroid + per-vector noise, both
    hash-derived — matches the fixture's value range (±0.4) and gives
    IVF/centroid queries real cluster structure."""
    df = spark.range(n).withColumnRenamed("id", "vec_id")
    k = F.col("vec_id")
    label = (_h(k, "elabel") % labels).cast("int")
    dims = F.sequence(F.lit(0), F.lit(dim - 1))
    emb = F.transform(
        dims,
        lambda d: (
            ((_h(label * dim + d, "ecent") % 2001).cast("double") - 1000) / 5000.0
            + ((_h(k * dim + d, "enoise") % 2001).cast("double") - 1000) / 6700.0
        ).cast("float"),
    )
    return df.select(k, emb.alias("embedding"), label.alias("label"))


SIZES = {  # rows at sf=1.0 (10x the sf0.1 fixture, matching its ratios)
    "customer": 150_000, "supplier": 10_000, "part": 200_000,
    "orders": 1_500_000, "events": 1_000_000, "documents": 50_000,
    "embeddings": 20_000,
}


def generate(spark: SparkSession, sf: float, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    n = {t: max(1, int(c * sf)) for t, c in SIZES.items()}
    tables = {
        "region": lambda: gen_region(spark),
        "nation": lambda: gen_nation(spark),
        "customer": lambda: gen_customer(spark, n["customer"]),
        "supplier": lambda: gen_supplier(spark, n["supplier"]),
        "part": lambda: gen_part(spark, n["part"]),
        "orders": lambda: gen_orders(spark, n["orders"], n["customer"]),
        "lineitem": lambda: gen_lineitem(spark, n["orders"], n["part"], n["supplier"]),
        "events": lambda: gen_events(spark, n["events"], n["events"] // 67),
        "documents": lambda: gen_documents(spark, n["documents"]),
        "embeddings": lambda: gen_embeddings(spark, n["embeddings"]),
    }
    for name, build in tables.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        build().write.mode("overwrite").parquet(path)
        print(f"wrote {path}")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf", type=float, default=1.0)
    parser.add_argument("--out", default=".scale/sf1")
    args = parser.parse_args()

    from presto_on_ray_spark.session import get_spark

    spark = get_spark(app_name="gen-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark, args.sf, args.out)
    spark.stop()
    return 0


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    raise SystemExit(main())
