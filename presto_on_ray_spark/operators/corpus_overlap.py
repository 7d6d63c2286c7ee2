"""Sketch-based corpus overlap estimation (SURVEY §2.11 extension —
training-data contamination audit at corpus granularity).

The question a 100 TB pipeline asks before any doc-level dedup run:
*how much do these two sources overlap at all?* Answering it exactly
means joining the full distinct-shingle relations of every source pair
— at 100 TB that is a shuffle of everything against everything. The
classic answer is a **bottom-k (KMV) sketch** per corpus (Bar-Yossef
et al. 2002; Beyer et al. 2007 "On Synopses for Distinct-Value
Estimation"): keep the k smallest distinct hash values of each
corpus's shingle set. Then for any pair

    S_union  = bottom-k(sketch_a ∪ sketch_b)      (k smallest of the merge)
    J_est    = |S_union ∩ A ∩ B| / |S_union|      (Jaccard estimate)
    C(A⊆B)   = |S_union ∩ A ∩ B| / |S_union ∩ A|  (containment estimate)

with standard error ~1/sqrt(k), independent of corpus size. Sketches
are tiny (k longs), mergeable, and comparisons are array ops on 20
rows — the pairwise stage never touches documents again.

Scale shape (the part that must survive 1000 executors):

- shingling + hashing is map-side (higher-order functions, no UDFs);
- the ONLY shuffle is by ``source`` for the per-corpus bottom-k,
  computed as ``dense_rank() <= k`` — Spark's WindowGroupLimit rewrite
  prunes each map partition to its local bottom-k *before* the
  exchange (the same physical rewrite pinned for
  window_top_n_per_group), so the shuffle carries O(partitions × k)
  rows, not the corpus's distinct-shingle relation;
- the per-source ``collect_set`` aggregates ≤ k values by
  construction (the rank filter runs first);
- the pair join is a theta self-join on a |sources|-row relation.

Hashes are the repo's portable 60-bit md5 digest (sketch_ops
._portable_h60), so the DuckDB oracle reproduces every sketch — and
therefore every estimate — bit-exactly: an *exact* differential over
an *approximate* estimator. ``corpus_overlap_exact`` is the
ground-truth twin (full distinct-shingle join); the estimator's error
against it is pinned in tests/test_corpus_overlap.py.

Reference parity: the reference engine ships Presto's approx-distinct
/ set-sketch surface for exactly this audit loop (SURVEY §2.4);
corpus-pair overlap is that surface applied to the documents table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.operators.dedup import _rolling_windows
from presto_on_ray_spark.operators.sketch_ops import _h60_sql, _portable_h60
from presto_on_ray_spark.suite import query

_K = 128          # sketch width: std err ~1/sqrt(128) ≈ 8.8%
_N = 3            # word n-gram shingles (same n as the dedup family)
_SEED = "ovl12"   # domain-separates the overlap hash from other h60 uses


def _shingle_hashes(col: Column) -> Column:
    """Distinct word 3-gram shingles of ``col`` as portable 60-bit
    hashes (array<long>), map-side only."""
    return F.array_distinct(
        _rolling_windows(col, _N, lambda c: _portable_h60(F.lit(_SEED), c))
    )


def bottomk_sketches(
    df: DataFrame, group_col: str, text_col: str, k: int = _K
) -> DataFrame:
    """Per-group bottom-k (KMV) sketch of the distinct-shingle sets:
    (group_col, sketch array<long> sorted ascending, n_shingles seen
    by the rank — min(k, distinct)).

    One exchange (by group); dense_rank <= k so WindowGroupLimit prunes
    map-side and the collect_set buffer is ≤ k values by construction.
    dense_rank (not row_number) because the exploded shingle relation
    still carries cross-document duplicates — ranks must advance per
    distinct VALUE so the sketch is a set sketch without a separate
    distinct exchange.
    """
    sh = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.explode(_shingle_hashes(F.col(text_col))).alias("h"),
        )
    )
    w = Window.partitionBy("g").orderBy("h")
    return (
        sh.withColumn("_rk", F.dense_rank().over(w))
        .filter(F.col("_rk") <= k)
        .groupBy("g")
        .agg(F.array_sort(F.collect_set("h")).alias("sketch"))
        .select(
            F.col("g").alias(group_col),
            "sketch",
            F.size("sketch").alias("sketch_size"),
        )
    )


def sketch_overlap(pairs: DataFrame, k: int = _K) -> DataFrame:
    """Overlap estimates from two sketch columns ``ska``/``skb`` (each
    a sorted array<long> bottom-k sketch). Adds:

    - union_k   — |bottom-k(A ∪ B)| (the estimator's sample size);
    - n_common  — |bottom-k(A ∪ B) ∩ A ∩ B|;
    - jaccard_est, contain_a_est, contain_b_est — rounded to 6 d.p.

    Pure array expressions over one row per pair; no shuffle.
    """
    uk = F.expr(
        f"slice(array_sort(array_union(ska, skb)), 1, {k})"
    )
    common = F.array_intersect(F.array_intersect(uk, F.col("ska")), F.col("skb"))
    in_a = F.array_intersect(uk, F.col("ska"))
    in_b = F.array_intersect(uk, F.col("skb"))
    return (
        pairs.withColumn("_uk", uk)
        .withColumn("union_k", F.size("_uk"))
        .withColumn("n_common", F.size(common))
        .withColumn(
            "jaccard_est",
            F.round(F.col("n_common") / F.col("union_k"), 6),
        )
        .withColumn(
            "contain_a_est",
            F.round(F.col("n_common") / F.size(in_a), 6),
        )
        .withColumn(
            "contain_b_est",
            F.round(F.col("n_common") / F.size(in_b), 6),
        )
        .drop("_uk")
    )


def _gram_h_sql() -> str:
    """DuckDB: (source, h) rows — the same distinct 3-gram portable
    hashes per document, UNNESTed. The gram is materialized as a NAMED
    column before hashing (lambda-shadowing rule, sketch_ops._h60_sql).
    """
    h = _h60_sql(f"concat_ws('|', '{_SEED}', gram)")
    return f"""
      SELECT source, {h} AS h
      FROM (
        SELECT source, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
                 RANGE(1, GREATEST(LEN(STRING_SPLIT(text,' ')) - {_N - 1}, 0) + 1),
                 i -> STRING_SPLIT(text,' ')[i] || ' ' || STRING_SPLIT(text,' ')[i+1] || ' ' || STRING_SPLIT(text,' ')[i+2]
               ))) AS gram
        FROM documents WHERE text IS NOT NULL
      )
    """


_BOTTOMK_ORACLE = f"""
WITH sh AS ({_gram_h_sql()}),
ranked AS (
  SELECT source, h, DENSE_RANK() OVER (PARTITION BY source ORDER BY h) AS rk
  FROM (SELECT DISTINCT source, h FROM sh)
),
sk AS (
  SELECT source, LIST(h ORDER BY h) AS sketch
  FROM ranked WHERE rk <= {_K} GROUP BY source
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.sketch AS ska, b.sketch AS skb
  FROM sk a JOIN sk b ON a.source < b.source
),
est AS (
  SELECT source_a, source_b, ska, skb,
         LIST_SORT(LIST_DISTINCT(LIST_CONCAT(ska, skb)))[1:{_K}] AS uk
  FROM pairs
)
SELECT source_a, source_b,
       LEN(uk) AS union_k,
       LEN(LIST_INTERSECT(LIST_INTERSECT(uk, ska), skb)) AS n_common,
       ROUND(CAST(LEN(LIST_INTERSECT(LIST_INTERSECT(uk, ska), skb)) AS DOUBLE)
             / LEN(uk), 6) AS jaccard_est,
       ROUND(CAST(LEN(LIST_INTERSECT(LIST_INTERSECT(uk, ska), skb)) AS DOUBLE)
             / LEN(LIST_INTERSECT(uk, ska)), 6) AS contain_a_est,
       ROUND(CAST(LEN(LIST_INTERSECT(LIST_INTERSECT(uk, ska), skb)) AS DOUBLE)
             / LEN(LIST_INTERSECT(uk, skb)), 6) AS contain_b_est
FROM est
ORDER BY source_a, source_b
"""


@query("corpus_overlap_bottomk", oracle=_BOTTOMK_ORACLE)
def corpus_overlap_bottomk(spark, sf_dir):
    """Source-pair overlap estimates from bottom-k shingle sketches:
    every (source_a < source_b) pair with Jaccard + both containment
    estimates. The oracle recomputes the sketches AND the estimator in
    SQL — hash-exact, the sketch-family differential pattern
    (checksum_portable / hll_portable_distinct / simhash_portable)."""
    d = t(spark, sf_dir, "documents")
    sk = bottomk_sketches(d, "source", "text").select(
        F.col("source"), F.col("sketch")
    )
    pairs = (
        sk.alias("a")
        .join(sk.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.col("a.sketch").alias("ska"),
            F.col("b.sketch").alias("skb"),
        )
    )
    return (
        sketch_overlap(pairs)
        .select(
            "source_a", "source_b", "union_k", "n_common",
            "jaccard_est", "contain_a_est", "contain_b_est",
        )
        .orderBy("source_a", "source_b")
    )


_EXACT_ORACLE = f"""
WITH sh AS (SELECT DISTINCT source, h FROM ({_gram_h_sql()})),
sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
common AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_common,
       sa.n AS n_a, sb.n AS n_b,
       ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6)
         AS jaccard
FROM common
JOIN sizes sa ON sa.source = source_a
JOIN sizes sb ON sb.source = source_b
ORDER BY source_a, source_b
"""


@query("corpus_overlap_exact", oracle=_EXACT_ORACLE)
def corpus_overlap_exact(spark, sf_dir):
    """Ground-truth twin: exact per-pair shingle Jaccard via the full
    distinct-(source, h) self-join — the relation the sketch estimates.
    Only pairs with n_common > 0 appear (inner join), matching the
    oracle. Fine at fixture SF; at 100 TB this is precisely the join
    the bottom-k operator exists to avoid."""
    d = t(spark, sf_dir, "documents")
    sh = (
        d.filter(F.col("text").isNotNull())
        .select(
            "source",
            F.explode(_shingle_hashes(F.col("text"))).alias("h"),
        )
        .distinct()
    )
    sizes = sh.groupBy("source").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("_sa"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("_sb"), F.col("n").alias("n_b"))
    return (
        common.join(F.broadcast(sa), F.col("source_a") == F.col("_sa"))
        .join(F.broadcast(sb), F.col("source_b") == F.col("_sb"))
        .select(
            "source_a", "source_b", "n_common", "n_a", "n_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )
