"""End-to-end corpus curation: the composed training-data filter.

Every large-corpus pipeline ends in one decision per document: keep it
or drop it, and why. This operator composes the engine's §2.11 filter
features — exact-duplicate rank, length stats, stopword ratio, unigram
LM cross-entropy — into a single verdict column, the shape a 100 TB
curation job writes back out (the reason column is what makes drop
rates auditable per rule).

Shape at scale: one md5-window pass for duplicate rank (one shuffle on
the digest), the LM score's broadcast-vocabulary join, and a final
doc_id join — every feature is a codegen'd expression or a broadcast
join; nothing collects, nothing is per-row Python. Rules are evaluated
on ROUND()ed features so the keep/drop decision is bit-stable across
engines (and across reruns at 1000 executors).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.operators.textstats import _STOPWORDS, LM_MEAN_SQL
from presto_on_ray_spark.suite import QUERIES, query

MIN_WORDS = 20
MIN_STOPWORD_RATIO = 0.01
MAX_CROSS_ENTROPY = 3.41

_CURATION_ORACLE = f"""
WITH terms AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) x WHERE LENGTH(term) > 0
), unigram AS (
  SELECT term, COUNT(*) AS cnt FROM terms GROUP BY 1
), tot AS (SELECT COUNT(*) AS n FROM terms),
scored AS (
  SELECT t.doc_id, ROUND(LN(CAST(u.cnt AS DOUBLE) / tot.n), 4) AS lp
  FROM terms t JOIN unigram u USING (term) CROSS JOIN tot
), lm AS (
  SELECT doc_id,
         {LM_MEAN_SQL}
           AS cross_entropy
  FROM scored GROUP BY doc_id
), dup AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id) AS rn
  FROM documents
), feats AS (
  SELECT d.doc_id, d.lang,
         CAST(LEN(STRING_SPLIT(d.text, ' ')) AS BIGINT) AS n_words,
         ROUND(CAST(LEN(LIST_FILTER(STRING_SPLIT(d.text, ' '),
                    w -> LIST_CONTAINS(['the','a','of','and','to'], w))) AS DOUBLE)
               / LEN(STRING_SPLIT(d.text, ' ')), 4) AS stopword_ratio,
         COALESCE(lm.cross_entropy, -1.0) AS cross_entropy,
         dup.rn
  FROM documents d
  LEFT JOIN lm USING (doc_id)
  JOIN dup USING (doc_id)
)
SELECT doc_id, lang, n_words, stopword_ratio, cross_entropy,
       CASE WHEN rn > 1 THEN 'exact_dup'
            WHEN n_words < {MIN_WORDS} THEN 'too_short'
            WHEN stopword_ratio < {MIN_STOPWORD_RATIO} THEN 'low_stopword'
            WHEN cross_entropy > {MAX_CROSS_ENTROPY} THEN 'lm_outlier'
            ELSE 'keep' END AS verdict
FROM feats
"""


@query("corpus_curation_pipeline", oracle=_CURATION_ORACLE)
def corpus_curation_pipeline(spark, sf_dir):
    """One verdict per document with the first failing rule as reason:
    exact_dup → too_short → low_stopword → lm_outlier → keep. Rule
    order matters (a short duplicate is reported as a duplicate), so
    drop-rate accounting per rule is well-defined."""
    d = t(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stop = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_words = F.size(words).cast("long")
    stop_ratio = F.round(
        F.size(F.filter(words, lambda w: F.array_contains(stop, w))).cast("double")
        / n_words,
        4,
    )
    dup_rn = F.row_number().over(
        Window.partitionBy(F.md5("text")).orderBy("doc_id")
    )
    lm = QUERIES["text_lm_score"](spark, sf_dir).select("doc_id", "cross_entropy")
    feats = (
        d.select(
            "doc_id",
            "lang",
            n_words.alias("n_words"),
            stop_ratio.alias("stopword_ratio"),
            dup_rn.alias("rn"),
        )
        .join(lm, "doc_id", "left")
        .withColumn("cross_entropy", F.coalesce("cross_entropy", F.lit(-1.0)))
    )
    verdict = (
        F.when(F.col("rn") > 1, F.lit("exact_dup"))
        .when(F.col("n_words") < MIN_WORDS, F.lit("too_short"))
        .when(F.col("stopword_ratio") < MIN_STOPWORD_RATIO, F.lit("low_stopword"))
        .when(F.col("cross_entropy") > MAX_CROSS_ENTROPY, F.lit("lm_outlier"))
        .otherwise(F.lit("keep"))
    )
    return feats.select(
        "doc_id", "lang", "n_words", "stopword_ratio", "cross_entropy",
        verdict.alias("verdict"),
    )
