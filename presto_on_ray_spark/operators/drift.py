"""Corpus distribution-drift monitoring (SURVEY §2.11 extension).

A training-data pipeline that ingests continuously needs to notice
when a source's distribution moves — scraper regressions, upstream
format changes, seasonal shifts — BEFORE the tokens reach a run. The
standard monitoring statistic is the Population Stability Index
(PSI = sum over bins of (p_cur - p_ref) * ln(p_cur / p_ref); the
symmetrized discrete KL divergence): < 0.1 stable, 0.1-0.25 drifting,
> 0.25 action. ``distribution_drift`` computes it per group between a
reference and a current snapshot over any integer feature.

Determinism (the suite convention): bin counts are exact integers,
proportions are Laplace-smoothed ((c + 1) / (total + B), B = bins
present for the group across BOTH snapshots — no zero-count ln(0)
edge), the per-bin term is ONE SQL expression string shared verbatim
with the DuckDB oracle (same IEEE sequence; ln() last-ulp skew
absorbed by ROUND(·, 6)), and the per-group PSI decimal-sums the
rounded terms, so it is partition-order-independent.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.operators.pipeline_prep import _bucket_col, _bucket_sql
from presto_on_ray_spark.suite import query

_DRIFT_BIN_WIDTH = 64  # n_chars per histogram bin for the suite key

# per-bin PSI term over columns (rc, rt, cc, ct, b) — kept textually
# identical between the Spark plan (F.expr) and the DuckDB oracle
_PSI_TERM_SQL = (
    "ROUND(((cc + 1) / CAST(ct + b AS DOUBLE) - (rc + 1) / CAST(rt + b AS DOUBLE))"
    " * LN(((cc + 1) / CAST(ct + b AS DOUBLE))"
    " / ((rc + 1) / CAST(rt + b AS DOUBLE))), 6)"
)


def reference_histogram(ref, bin_width: int, group_col: str = "source"):
    """Collapse a (group, val) snapshot to its (grp, bin, rc)
    histogram — the frozen artifact a monitoring deployment computes
    ONCE from the reference corpus and ships to every comparison
    (persist it: the streaming monitor joins it per micro-batch)."""
    return _binned(ref, bin_width, group_col).withColumnRenamed("c", "rc")


def _binned(df, bin_width: int, group_col: str):
    # FLOOR division, not `div` truncation: negative feature values
    # must land in the same bin both engines (DuckDB's // floors;
    # Spark's `div` truncates toward zero — they differ below zero)
    return df.groupBy(
        F.col(group_col).alias("grp"),
        F.floor(F.col("val") / F.lit(bin_width)).cast("long").alias("bin"),
    ).agg(F.count("*").alias("c"))


def distribution_drift(ref, cur, bin_width: int, group_col: str = "source"):
    """PSI per ``group_col`` between two (group, val) snapshots, with
    histogram bins of ``bin_width``. Returns (group, n_ref, n_cur,
    n_bins, psi).

    Shape at scale: each snapshot collapses to a (group x bin)
    histogram with map-side partial aggregation before anything is
    joined — the full-outer bin alignment, the per-group totals
    (windows over the bounded histogram relation, never the corpus),
    and the PSI sum all run on bounded relations."""
    return psi_against_reference(
        reference_histogram(ref, bin_width, group_col), cur, bin_width, group_col
    )


def psi_against_reference(
    ref_hist, cur, bin_width: int, group_col: str = "source"
):
    """PSI of a (group, val) snapshot against a PRECOMPUTED reference
    histogram (reference_histogram's output) — the incremental form:
    the reference corpus is never rescanned."""
    r = ref_hist
    c = _binned(cur, bin_width, group_col).withColumnRenamed("c", "cc")
    aligned = (
        r.join(c, ["grp", "bin"], "full_outer")
        .withColumn("rc", F.coalesce("rc", F.lit(0)))
        .withColumn("cc", F.coalesce("cc", F.lit(0)))
    )
    w = Window.partitionBy("grp")
    terms = aligned.select(
        "grp",
        "rc",
        "cc",
        F.sum("rc").over(w).alias("rt"),
        F.sum("cc").over(w).alias("ct"),
        F.count("*").over(w).alias("b"),
    ).withColumn("term", F.expr(_PSI_TERM_SQL))
    return terms.groupBy(F.col("grp").alias(group_col)).agg(
        F.max("rt").alias("n_ref"),
        F.max("ct").alias("n_cur"),
        F.max("b").alias("n_bins"),
        F.sum(F.col("term").cast("decimal(20,6)")).cast("double").alias("psi"),
    )


@query(
    "corpus_drift_psi",
    oracle=f"""
    WITH snap AS (
      SELECT source AS grp, n_chars AS val,
             {_bucket_sql('doc_id')} < 50 AS is_ref
      FROM documents
    ),
    r AS (
      SELECT grp, val // {_DRIFT_BIN_WIDTH} AS bin, COUNT(*) AS rc
      FROM snap WHERE is_ref GROUP BY 1, 2
    ),
    c AS (
      SELECT grp, val // {_DRIFT_BIN_WIDTH} AS bin, COUNT(*) AS cc
      FROM snap WHERE NOT is_ref GROUP BY 1, 2
    ),
    aligned AS (
      SELECT COALESCE(r.grp, c.grp) AS grp, COALESCE(r.bin, c.bin) AS bin,
             COALESCE(rc, 0) AS rc, COALESCE(cc, 0) AS cc
      FROM r FULL OUTER JOIN c ON r.grp = c.grp AND r.bin = c.bin
    ),
    terms AS (
      SELECT grp, rc, cc,
             SUM(rc) OVER (PARTITION BY grp) AS rt,
             SUM(cc) OVER (PARTITION BY grp) AS ct,
             COUNT(*) OVER (PARTITION BY grp) AS b
      FROM aligned
    )
    SELECT grp AS source,
           CAST(MAX(rt) AS BIGINT) AS n_ref,
           CAST(MAX(ct) AS BIGINT) AS n_cur, MAX(b) AS n_bins,
           CAST(SUM(CAST({_PSI_TERM_SQL} AS DECIMAL(20,6))) AS DOUBLE) AS psi
    FROM terms GROUP BY grp
    """,
)
def corpus_drift_psi(spark, sf_dir):
    """Per-source PSI drift between two deterministic halves of the
    corpus (Knuth-hash bucket < 50 = reference snapshot, rest =
    current — the fixture stand-in for consecutive ingest snapshots)
    over the n_chars distribution in 64 (= _DRIFT_BIN_WIDTH)-char bins.
    Both halves draw from one distribution, but at ~a dozen docs per
    (source, half) at sf0.001 the finite-sample PSI is well above the
    asymptotic stable band — expected (PSI's null expectation scales
    ~(B-1)·(1/n_ref + 1/n_cur)/2); the value under test is the exact
    cross-engine arithmetic, pinned hash-exact by the oracle, and the
    identical-snapshot zero / planted-shift behaviour is pinned in
    tests/test_drift.py."""
    d = t(spark, sf_dir, "documents")
    half = F.floor(_bucket_col(F.col("doc_id"))).cast("long") < 50
    snap = d.select("source", F.col("n_chars").alias("val"), half.alias("is_ref"))
    return distribution_drift(
        snap.filter("is_ref").select("source", "val"),
        snap.filter("NOT is_ref").select("source", "val"),
        _DRIFT_BIN_WIDTH,
    )


# ---------------------------------------------------------------------------
# Embedding-space drift: PSI over FROZEN-cell assignment histograms.
# Scalar-feature PSI (above) cannot see a semantic shift that leaves
# lengths and token stats alone (a scraper swapping domains, an
# upstream model change); the coarse cells the ingest tier already
# maintains (similarity.semantic_cells — the SemDeDup/IVF quantizer)
# give the embedding space a discrete, deterministic binning, so the
# SAME PSI arithmetic applies verbatim with bin = assigned cell.
# Frozen cells matter here exactly as in admission: re-derived cells
# would move the bins between snapshots and manufacture drift.
# ---------------------------------------------------------------------------
def semantic_snapshot(v, cents, group_col: str = "source"):
    """Collapse a (vec_id, qv, <group_col>) relation to the (group,
    val) snapshot shape the PSI machinery consumes, with val = the
    vector's argmin frozen cell. One broadcast argmin + one id-keyed
    join to re-attach the group — O(rows), no pairwise term.

    Precondition: vec_id is row-unique within the snapshot (the same
    contract as the admission loop). The argmin groups BY vec_id, so
    colliding ids — e.g. two producers merged without re-keying —
    would collapse to one winner whose cell then counts for every
    colliding row, silently skewing the histogram;
    stream_semantic_drift refuses such batches loudly rather than
    score them."""
    from presto_on_ray_spark.operators.similarity import _cell_assign

    asg = _cell_assign(v.select("vec_id", "qv"), cents)
    return asg.join(v.select("vec_id", group_col), "vec_id").select(
        group_col, F.col("cell").alias("val")
    )


def semantic_drift_psi(
    ref_v, cur_v, cents=None, n_cells: int | None = None,
    group_col: str = "source",
):
    """Per-group PSI between two embedding snapshots (vec_id, qv,
    <group_col>) over frozen-cell assignment histograms: cells default
    to semantic_cells over the REFERENCE (auto sqrt-n dial, rank-based
    head) — the reference owns the geometry, the current snapshot is
    binned into it. Returns (group, n_ref, n_cur, n_bins, psi), the
    drift family's shared shape. Scale: both snapshots collapse to
    (group x cell) histograms map-side; everything after runs on
    bounded relations (distribution_drift's contract)."""
    from presto_on_ray_spark.operators.similarity import semantic_cells

    if cents is None:
        cents = semantic_cells(ref_v.select("vec_id", "qv"), n_cells)
    return distribution_drift(
        semantic_snapshot(ref_v, cents, group_col),
        semantic_snapshot(cur_v, cents, group_col),
        1,
        group_col,
    )


from presto_on_ray_spark.operators.similarity import _IVFPQ_CELLS  # noqa: E402
# (single-sourced floor: auto_ivf_cells' default — the ingest oracle
# interpolates the same constant, so a dial retune moves both keys)

_SEM_DRIFT_CELLS_SQL = f"""
    dial AS (
      SELECT GREATEST({_IVFPQ_CELLS}, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)) AS nc
      FROM ref
    ),
    cents AS (
      SELECT cell, cv FROM (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
               qv AS cv
        FROM ref)
      WHERE cell < (SELECT nc FROM dial)
    )
"""


@query(
    "corpus_drift_semantic",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(label AS BIGINT) AS grp,
             LIST_TRANSFORM(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qv
      FROM embeddings
    ),
    ref AS (SELECT vec_id, grp, qv FROM e WHERE vec_id % 5 <> 0),
    cur AS (SELECT vec_id, grp, qv FROM e WHERE vec_id % 5 = 0),
    {_SEM_DRIFT_CELLS_SQL},
    rd AS (
      SELECT s.vec_id, s.grp, ct.cell,
             LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(s.qv) + 1),
               i -> (s.qv[i] - ct.cv[i]) * (s.qv[i] - ct.cv[i]))) AS d2
      FROM ref s CROSS JOIN cents ct
    ),
    rasg AS (
      SELECT vec_id, grp, cell FROM (
        SELECT vec_id, grp, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
        FROM rd) WHERE rn = 1
    ),
    cd AS (
      SELECT s.vec_id, s.grp, ct.cell,
             LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(s.qv) + 1),
               i -> (s.qv[i] - ct.cv[i]) * (s.qv[i] - ct.cv[i]))) AS d2
      FROM cur s CROSS JOIN cents ct
    ),
    casg AS (
      SELECT vec_id, grp, cell FROM (
        SELECT vec_id, grp, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
        FROM cd) WHERE rn = 1
    ),
    r AS (SELECT grp, cell AS bin, COUNT(*) AS rc FROM rasg GROUP BY 1, 2),
    c AS (SELECT grp, cell AS bin, COUNT(*) AS cc FROM casg GROUP BY 1, 2),
    aligned AS (
      SELECT COALESCE(r.grp, c.grp) AS grp, COALESCE(r.bin, c.bin) AS bin,
             COALESCE(rc, 0) AS rc, COALESCE(cc, 0) AS cc
      FROM r FULL OUTER JOIN c ON r.grp = c.grp AND r.bin = c.bin
    ),
    terms AS (
      SELECT grp, rc, cc,
             SUM(rc) OVER (PARTITION BY grp) AS rt,
             SUM(cc) OVER (PARTITION BY grp) AS ct,
             COUNT(*) OVER (PARTITION BY grp) AS b
      FROM aligned
    )
    SELECT grp AS source,
           CAST(MAX(rt) AS BIGINT) AS n_ref,
           CAST(MAX(ct) AS BIGINT) AS n_cur, MAX(b) AS n_bins,
           CAST(SUM(CAST({_PSI_TERM_SQL} AS DECIMAL(20,6))) AS DOUBLE) AS psi
    FROM terms GROUP BY grp
    """,
)
def corpus_drift_semantic(spark, sf_dir):
    """Per-label PSI between the corpus (vec_id % 5 != 0, the
    reference that also owns the cell geometry) and the arriving batch
    (vec_id % 5 == 0) over frozen-cell assignment histograms — the
    embedding-space completion of corpus_drift_psi, sharing its PSI
    term verbatim with bin = assigned cell. The DuckDB oracle replays
    the whole pipeline (dial, rank head, both argmin assignments, the
    aligned smoothed PSI), so the key pins the geometry AND the
    arithmetic. Both halves draw from one distribution, so the value
    under test is the exact cross-engine agreement; the planted-shift
    behaviour is pinned in tests/test_drift.py."""
    e = t(spark, sf_dir, "embeddings")
    from presto_on_ray_spark.operators.similarity import quantized

    v = e.select(
        "vec_id",
        quantized(F.col("embedding")).alias("qv"),
        F.col("label").cast("long").alias("source"),
    )
    ref = v.filter(F.col("vec_id") % 5 != 0)
    cur = v.filter(F.col("vec_id") % 5 == 0)
    return semantic_drift_psi(ref, cur)
