"""Temperature-scaled mixing (pipeline_prep.mix_temperature): the
tail-up-weighting property on a skewed corpus plus quota arithmetic."""

from __future__ import annotations

import math

from presto_on_ray_spark.operators.pipeline_prep import mix_temperature


def _no_persist(df):
    return df


def test_sqrt_weights_up_weight_the_tail(spark):
    # big: 900 docs, tail: 100 docs. Linear 30% sampling would take
    # 270/30; sqrt weights shift share toward the tail.
    rows = [(i, "big") for i in range(900)] + [
        (1000 + i, "tail") for i in range(100)
    ]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    picked = mix_temperature(d, keep=_no_persist).groupBy("source").count()
    got = {r.source: r["count"] for r in picked.collect()}
    n, b = 1000, 300
    s_big = round(math.sqrt(900) * 1_000_000)
    s_tail = round(math.sqrt(100) * 1_000_000)
    tot = s_big + s_tail
    assert got["big"] == b * s_big // tot  # 225
    assert got["tail"] == b * s_tail // tot  # 75
    # the tail's SELECTED FRACTION exceeds the big source's — the
    # whole point of temperature rebalancing
    assert got["tail"] / 100 > got["big"] / 900


def test_quota_capped_at_availability(spark):
    # an extreme tail: sqrt weighting would owe it more docs than it
    # has at a high budget — the cap keeps the pick feasible
    rows = [(i, "big") for i in range(10000)] + [(20000, "tiny")]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        r.source: r["count"]
        for r in mix_temperature(d, tenths=9, keep=_no_persist)
        .groupBy("source")
        .count()
        .collect()
    }
    assert got["tiny"] == 1  # capped at c, not sqrt-share of 9000
    assert got["big"] <= 10000


def test_picks_are_hash_prefix_per_source(spark):
    rows = [(i, "a") for i in range(50)] + [(100 + i, "b") for i in range(50)]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    out = mix_temperature(d, keep=_no_persist).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.pick_rank)
    for src, ranks in by_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
