"""Leakage-safe split (pipeline_prep.split_leakage_safe): the
no-straddle invariant against the cluster relation it derives from."""

from __future__ import annotations

from presto_on_ray_spark import suite

suite.load_all()


def test_near_duplicates_never_straddle_splits(spark, sf_dir):
    split = {
        r.doc_id: (r.rep_id, r.split)
        for r in suite.QUERIES["split_leakage_safe"](spark, sf_dir).collect()
    }
    comps = suite.QUERIES["dedup_neardup_clusters"](spark, sf_dir).collect()
    assert any(r.component_id != r.doc_id for r in comps)  # fixture has clusters
    for r in comps:
        # rep_id is the component id, and every member shares the
        # representative's split — the leakage guarantee
        assert split[r.doc_id][0] == r.component_id
        assert split[r.doc_id][1] == split[r.component_id][1]


def test_singletons_match_plain_hash_split(spark, sf_dir):
    from presto_on_ray_spark.operators.pipeline_prep import _MIX, _MOD

    rows = suite.QUERIES["split_leakage_safe"](spark, sf_dir).collect()
    def plain(doc_id):
        b = ((doc_id * _MIX) % _MOD) * 100 // _MOD
        return "train" if b < 80 else ("val" if b < 90 else "test")
    singles = [r for r in rows if r.rep_id == r.doc_id]
    assert singles
    for r in singles:
        assert r.split == plain(r.doc_id), r


def test_every_document_assigned_exactly_once(spark, sf_dir):
    from presto_on_ray_spark.operators._util import t

    df = suite.QUERIES["split_leakage_safe"](spark, sf_dir)
    n_docs = t(spark, sf_dir, "documents").count()
    assert df.count() == n_docs
    assert df.select("doc_id").distinct().count() == n_docs
