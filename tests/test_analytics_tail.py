"""Aggregate/analytics tail: map_union semantics, Presto aggregate
names through the dialect, recursive CTE behavior. (Differential
correctness for the registered queries lives in
test_oracle_differential.py; these pin the semantics the oracles can't
see — conflict resolution, dialect spelling, recursion limits.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_on_ray_spark.functions.maps import map_union_agg, map_union_sum_agg


def _maps_df(spark):
    return spark.createDataFrame(
        [
            ("g1", {"a": 1, "b": 5}),
            ("g1", {"a": 3, "c": 2}),
            ("g2", {"x": 7}),
        ],
        "g string, m map<string,int>",
    )


def test_map_union_keeps_max_on_conflict(spark):
    out = {
        r["g"]: r["merged"]
        for r in map_union_agg(_maps_df(spark), ["g"], "m").collect()
    }
    assert out["g1"] == {"a": 3, "b": 5, "c": 2}  # conflict a: max(1,3)
    assert out["g2"] == {"x": 7}


def test_map_union_sum_sums_on_conflict(spark):
    out = {
        r["g"]: r["merged"]
        for r in map_union_sum_agg(_maps_df(spark), ["g"], "m").collect()
    }
    assert out["g1"] == {"a": 4, "b": 5, "c": 2}
    assert out["g2"] == {"x": 7}


def test_map_union_entry_order_is_sorted(spark):
    row = map_union_agg(_maps_df(spark), ["g"], "m").filter(F.col("g") == "g1")
    entries = row.select(F.map_keys("merged").alias("k")).collect()[0]["k"]
    assert entries == sorted(entries)


def test_presto_aggregate_names_through_dialect(spark, sf_dir):
    from presto_on_ray_spark.engine import Engine

    eng = Engine(spark).register_tables(sf_dir)
    row = eng.sql(
        """
        SELECT bitwise_and_agg(o_orderkey) AS ba,
               bitwise_or_agg(o_orderkey) AS bo,
               every(o_totalprice > 0) AS ev
        FROM orders
        """
    ).collect()[0]
    assert row["bo"] > 0 and row["ba"] >= 0
    assert row["ev"] is True


def test_recursive_cte_depth_matches_log2(spark, sf_dir):
    from presto_on_ray_spark import suite

    suite.load_all()
    rows = suite.QUERIES["recursive_cte_hierarchy"](spark, sf_dir).collect()
    by_id = {r["doc_id"]: r for r in rows}
    # depth of doc d is floor(log2(d)): halvings until reaching 1
    assert by_id[2]["depth_to_root"] == 1
    assert by_id[3]["depth_to_root"] == 1
    assert by_id[4]["depth_to_root"] == 2
    assert by_id[255]["depth_to_root"] == 7
    assert all(r["root"] == 1 for r in rows)
    assert all(r["n_ancestors"] == r["depth_to_root"] for r in rows)
