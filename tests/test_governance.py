"""Governance report (governance.corpus_health_report): column
consistency against the member operators it composes."""

from __future__ import annotations

from presto_on_ray_spark import suite

suite.load_all()


def test_report_columns_agree_with_members(spark, sf_dir):
    from presto_on_ray_spark.operators._util import t

    rows = suite.QUERIES["corpus_health_report"](spark, sf_dir).collect()
    d = t(spark, sf_dir, "documents")
    n_sources = d.select("source").distinct().count()
    assert len(rows) == n_sources
    assert sum(r.n_docs for r in rows) == d.filter("text IS NOT NULL").count()

    clf = suite.QUERIES["text_quality_classifier"](spark, sf_dir)
    assert sum(r.n_keep for r in rows) == clf.filter("keep").count()

    bp = suite.QUERIES["corpus_boilerplate_strip"](spark, sf_dir)
    assert sum(r.n_boilerplate_docs for r in rows) == bp.filter(
        "n_cut_segments > 0"
    ).count()

    psi = {r.source: r.psi for r in suite.QUERIES["corpus_drift_psi"](spark, sf_dir).collect()}
    for r in rows:
        assert r.psi == psi[r.source]
        assert 0 <= r.n_exact_dup_docs <= r.n_docs
        assert 0 <= r.n_boilerplate_docs <= r.n_docs
        assert 0 <= r.n_keep <= r.n_docs
