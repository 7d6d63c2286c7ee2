"""Structural types: arrays, maps, rows, UNNEST, lambdas
(SURVEY §2.2 subscripts, §2.3 UNNEST, §2.8 array/map families).

Spark's higher-order functions (transform/filter/aggregate/zip_with…)
are the same in-query lambda surface Presto exposes — all JVM-side,
no UDF crossing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query


@query(
    "unnest_explode",
    oracle="""
    SELECT doc_id, word, COUNT(*) AS n
    FROM (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word
      FROM documents WHERE doc_id <= 20
    )
    GROUP BY doc_id, word
    """,
)
def unnest_explode(spark, sf_dir):
    """UNNEST(array) as a lateral join (SURVEY §2.3) → explode().
    One output row per element; word counts make the comparison
    order-insensitive."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 20)
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("n"))
    )


@query(
    "unnest_with_ordinality",
    oracle="""
    SELECT doc_id, ord, word
    FROM (
      SELECT doc_id,
             UNNEST(STRING_SPLIT(text, ' ')) AS word,
             GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS ord
      FROM documents WHERE doc_id <= 10
    )
    WHERE ord <= 5
    """,
)
def unnest_with_ordinality(spark, sf_dir):
    """UNNEST … WITH ORDINALITY → posexplode (+1: Presto ordinality is
    1-based, Spark pos is 0-based — SURVEY §2.3)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 10)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .select("doc_id", (F.col("pos") + 1).cast("long").alias("ord"), "word")
        .filter(F.col("ord") <= 5)
    )


@query(
    "array_functions",
    oracle="""
    SELECT vec_id,
           CAST(LEN(embedding) AS INTEGER) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 5) AS first_elem,
           ROUND(CAST(LIST_MAX(embedding) AS DOUBLE), 5) AS max_elem,
           ROUND(CAST(LIST_MIN(embedding) AS DOUBLE), 5) AS min_elem,
           CAST(LIST_POSITION(LIST_SORT(LIST_TRANSFORM(embedding, x -> CAST(ROUND(x, 0) AS DOUBLE))), 0.0) IS NOT NULL AS BOOLEAN) AS has_zero_rounded,
           ROUND(CAST(LIST_SORT(embedding)[LEN(embedding)] AS DOUBLE), 5) AS sorted_last
    FROM embeddings WHERE vec_id <= 100
    """,
)
def array_functions(spark, sf_dir):
    """cardinality / element_at (1-based, SURVEY §2.2) / array_max/min /
    array_position / array_sort over the embeddings fixture."""
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") <= 100)
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).cast("int").alias("dim"),
        F.round(F.element_at(emb, 1).cast("double"), 5).alias("first_elem"),
        F.round(F.array_max(emb).cast("double"), 5).alias("max_elem"),
        F.round(F.array_min(emb).cast("double"), 5).alias("min_elem"),
        F.array_contains(
            F.transform(emb, lambda x: F.round(x.cast("double"), 0)), F.lit(0.0)
        ).alias("has_zero_rounded"),
        F.round(F.element_at(F.array_sort(emb), F.size(emb)).cast("double"), 5).alias(
            "sorted_last"
        ),
    )


@query(
    "array_lambdas",
    oracle="""
    SELECT vec_id,
           CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
           CAST(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 100, 0) AS BIGINT))) AS DOUBLE) AS scaled_sum,
           CAST(LIST_REDUCE(LIST_TRANSFORM(embedding, x -> CAST(x > 0.5 AS INTEGER)), (a, b) -> a + b) AS BIGINT) AS n_large
    FROM embeddings WHERE vec_id <= 100
    """,
)
def array_lambdas(spark, sf_dir):
    """Lambda surface: filter / transform / reduce(=aggregate)
    (SURVEY §2.8 array-with-lambdas). Float sums are made exact by
    scaling to integers inside the lambda."""
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") <= 100)
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).cast("int").alias("n_positive"),
        F.aggregate(
            F.transform(emb, lambda x: F.round(x.cast("double") * 100, 0).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        .cast("double")
        .alias("scaled_sum"),
        F.aggregate(
            F.transform(emb, lambda x: (x > 0.5).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        .cast("long")
        .alias("n_large"),
    )


@query(
    "array_construction",
    oracle="""
    SELECT n,
           CAST(LIST_SUM(RANGE(1, n + 1)) AS BIGINT) AS tri,
           CAST(LEN(RANGE(1, n + 1)) AS INTEGER) AS card,
           ARRAY_TO_STRING(LIST_TRANSFORM(RANGE(1, n + 1), x -> CAST(x * x AS VARCHAR)), ',') AS squares
    FROM (SELECT UNNEST(RANGE(1, 6)) AS n)
    """,
)
def array_construction(spark, sf_dir):
    """sequence / repeat / flatten-style construction + array_join
    (SURVEY §2.8). DuckDB RANGE(1, n+1) == Spark sequence(1, n)."""
    ns = spark.range(1, 6).select(F.col("id").alias("n"))
    seq = F.sequence(F.lit(1).cast("long"), F.col("n"))
    return ns.select(
        "n",
        F.aggregate(seq, F.lit(0).cast("long"), lambda a, x: a + x).alias("tri"),
        F.size(seq).cast("int").alias("card"),
        F.array_join(
            F.transform(seq, lambda x: (x * x).cast("string")), ","
        ).alias("squares"),
    )


@query(
    "map_functions",
    oracle="""
    SELECT event_id,
           CAST(m['k'][1] AS BIGINT) AS k_value,
           CAST(LEN(MAP_KEYS(m)) AS INTEGER) AS n_keys
    FROM (SELECT event_id, MAP(['k'], [CAST(json_extract(props, '$.k') AS BIGINT)]) AS m
          FROM events WHERE event_id <= 100) e
    """,
)
def map_functions(spark, sf_dir):
    """map construction / element_at / map_keys (SURVEY §2.8 map
    family) — built from the events JSON payload."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") <= 100)
    m = F.create_map(
        F.lit("k"), F.get_json_object("props", "$.k").cast("long")
    )
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_value"),
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
    )


@query(
    "row_struct_access",
    oracle="""
    SELECT o_orderkey,
           {'status': o_orderstatus, 'price': o_totalprice}.status AS status_field,
           CAST({'status': o_orderstatus, 'price': o_totalprice}.price AS DOUBLE) AS price_field
    FROM orders WHERE o_orderkey <= 100
    """,
)
def row_struct_access(spark, sf_dir):
    """row(...) construction + .field dereference (SURVEY §2.2) →
    struct() + getField."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    s = F.struct(
        F.col("o_orderstatus").alias("status"), F.col("o_totalprice").alias("price")
    )
    return o.select(
        "o_orderkey",
        s.getField("status").alias("status_field"),
        s.getField("price").cast("double").alias("price_field"),
    )


@query(
    "array_ngrams_combinations",
    oracle="""
    SELECT doc_id, CAST(n_bigrams AS INTEGER) AS n_bigrams, first_bigram
    FROM (
      SELECT doc_id,
             LEN(STRING_SPLIT(text, ' ')) - 1 AS n_bigrams,
             STRING_SPLIT(text, ' ')[1] || ' ' || STRING_SPLIT(text, ' ')[2] AS first_bigram
      FROM documents WHERE doc_id <= 50
    )
    """,
)
def array_ngrams_combinations(spark, sf_dir):
    """Presto ngrams(arr, 2) via the JVM-side HOF composition in
    functions.registry.array_ngrams (SURVEY §2.8: ngrams/combinations →
    HOF compositions)."""
    from presto_on_ray_spark.functions.registry import array_ngrams

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 50)
    words = F.split("text", " ")
    bigrams = array_ngrams(words, 2)
    return d.select(
        "doc_id",
        F.size(bigrams).cast("int").alias("n_bigrams"),
        F.array_join(F.element_at(bigrams, 1), " ").alias("first_bigram"),
    )


@query(
    "multimap_from_entries",
    oracle="""
    SELECT ARRAY_TO_STRING(LIST(rk || ':' || vs ORDER BY rk), ',') AS mm
    FROM (
      SELECT CAST(n_regionkey AS VARCHAR) AS rk,
             ARRAY_TO_STRING(LIST(n_name ORDER BY n_name), '|') AS vs
      FROM nation GROUP BY n_regionkey
    )
    """,
)
def multimap_from_entries_query(spark, sf_dir):
    """Presto multimap_from_entries(array<row(K,V)>) — duplicate keys
    KEPT, values grouped (map<K, array<V>>). Spark's map_from_entries
    throws on duplicates under ANSI, so this exercises the tier-2 shim
    in functions.registry (reference delegates it to Presto's JVM
    library; SURVEY §2.8 map family). Rendered as a sorted string so
    the driver canonicalizer never sees a map-typed cell."""
    from presto_on_ray_spark.functions.registry import multimap_from_entries

    n = t(spark, sf_dir, "nation")
    entries = F.sort_array(
        F.collect_list(
            F.struct(F.col("n_regionkey").alias("key"), F.col("n_name").alias("value"))
        )
    )
    one = n.agg(entries.alias("entries"))
    mm = multimap_from_entries(F.col("entries"))
    rendered = F.array_join(
        F.transform(
            F.sort_array(F.map_entries(mm)),
            lambda e: F.concat(
                e["key"].cast("string"), F.lit(":"), F.array_join(e["value"], "|")
            ),
        ),
        ",",
    )
    return one.select(rendered.alias("mm"))
