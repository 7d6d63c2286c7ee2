"""Skew mitigation: salted join (SCALING.md's escape hatch when AQE's
skew-join split isn't enough — e.g., one key holding >5% of a 100 TB
fact table).

Mechanism: replicate each build-side row SALT times with salt ids
0..SALT-1; tag each probe-side row with a deterministic salt from its
unique id; join on (key, salt). The hot key's rows spread over SALT
tasks instead of one. Result is row-identical to the plain join
(verified by the suite oracle, which uses the plain join SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from presto_on_ray_spark.functions.numeric import dsum, oracle_dsum
from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query

DEFAULT_SALT = 8


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_source: str,
    n_salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Join fact⋈dim on key with salt-spread shuffle partitions.

    ``salt_source`` must vary WITHIN a join key (a line number, a
    row-unique id) — salting on the key itself would put the hot key's
    rows back in one bucket. Deterministic so retried tasks produce
    identical rows (never rand()).
    """
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salt)).cast("int")
    )
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    joined = salted_fact.join(
        exploded_dim,
        (salted_fact[fact_key] == exploded_dim[dim_key])
        & (salted_fact["_salt"] == exploded_dim["_salt"]),
        how,
    )
    return joined.drop("_salt")


@query(
    "skew_salted_join",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n, {oracle_dsum('l_extendedprice')} AS total
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def skew_salted_join(spark, sf_dir):
    """Salted fact⋈dim join — the oracle is the PLAIN join, proving the
    salting is a pure physical rewrite with identical semantics."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        li, o, "l_orderkey", "o_orderkey", salt_source="l_linenumber", n_salt=4
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), dsum("l_extendedprice").alias("total")
    )
