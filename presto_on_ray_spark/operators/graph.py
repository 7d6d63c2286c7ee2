"""Link-graph corpus authority (SURVEY §2.11 extension): PageRank over
a document citation graph, in exact scaled-integer arithmetic so the
iterative float-free computation is bit-identical across engines and
the DuckDB oracle can pin every rank value.

Corpus curation uses link authority as a quality weight (the classic
"quality = who cites you" signal for web-scale training data). The
fixture tables carry no link column, so the edge list is synthesized
deterministically from doc_id (three out-links per document via a
multiplicative hash — same construction both engines); the OPERATOR —
iterate (join edges with ranks → per-target sum → damped update) — is
the real artifact.

Scale shape (100 TB): each iteration is one shuffle on the edge
destination key plus a broadcast of the 1-row count; edge storage is
out-degree-bounded; ranks are one row per document. This is the same
per-round cost profile as connected_components (operators/dedup.py),
the other iterative-relational operator in the suite.

Determinism: damping 85/100 and teleport 15/100 applied in integer
arithmetic over ranks scaled by 10^12; every division is integer
division (`div` / DuckDB `//`), so no float rounding exists anywhere
in the pipeline and the oracle matches exactly, not approximately.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_on_ray_spark.caching import tracked_persist
from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query

_SCALE = 1_000_000_000_000  # rank fixed-point scale (10^12)
_OUT_DEG = 3
_ITER = 3
_MIX = 2654435761  # Knuth multiplicative-hash constant
_STEP = 40503


def _oracle() -> str:
    base = f"""
    WITH d AS (SELECT doc_id FROM documents),
    meta AS (SELECT COUNT(*) AS n FROM d),
    edges AS (
      SELECT d.doc_id AS src,
             (d.doc_id * {_MIX} + j.j * {_STEP}) % meta.n AS dst
      FROM d CROSS JOIN meta
      CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j) j
    ),
    r0 AS (
      SELECT d.doc_id, CAST({_SCALE} // meta.n AS BIGINT) AS r
      FROM d CROSS JOIN meta
    )"""
    prev = "r0"
    for i in range(1, _ITER + 1):
        base += f""",
    i{i} AS (
      SELECT d.doc_id,
             (15 * ({_SCALE} // meta.n)) // 100
             + (85 * COALESCE(SUM({prev}.r // {_OUT_DEG}), 0)) // 100 AS r
      FROM d CROSS JOIN meta
      LEFT JOIN edges ON edges.dst = d.doc_id
      LEFT JOIN {prev} ON {prev}.doc_id = edges.src
      GROUP BY d.doc_id, meta.n
    )"""
        prev = f"i{i}"
    return base + f"""
    SELECT doc_id, CAST(r AS BIGINT) AS pr_scaled FROM {prev}
    """


@query("corpus_pagerank", oracle=_oracle())
def corpus_pagerank(spark, sf_dir):
    """Damped PageRank, 3 fixed iterations, scaled-integer exact.
    See the module docstring for the scale/determinism contract."""
    d = t(spark, sf_dir, "documents").select("doc_id")
    cnt = d.agg(F.count("*").alias("n"))
    base = tracked_persist(d.crossJoin(F.broadcast(cnt)))

    links = F.array(
        *[
            (F.col("doc_id") * _MIX + j * _STEP) % F.col("n")
            for j in range(1, _OUT_DEG + 1)
        ]
    )
    edges = tracked_persist(
        base.select(F.col("doc_id").alias("src"), F.explode(links).alias("dst"))
    )

    teleport = F.expr(f"(15 * ({_SCALE} div n)) div 100")
    ranks = base.select(
        "doc_id", F.expr(f"{_SCALE} div n").cast("long").alias("r")
    )
    for _ in range(_ITER):
        contribs = edges.join(
            ranks.select(F.col("doc_id").alias("src"), "r"), "src"
        ).groupBy("dst").agg(
            F.sum(F.expr(f"r div {_OUT_DEG}")).alias("s")
        )
        ranks = (
            base.join(contribs, base.doc_id == contribs.dst, "left")
            .select(
                base.doc_id,
                (teleport + F.expr("85 * coalesce(s, 0L) div 100")).alias("r"),
            )
        )
    return ranks.select("doc_id", F.col("r").alias("pr_scaled"))
