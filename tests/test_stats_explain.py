"""Presto introspection statements: EXPLAIN family, SHOW STATS FOR,
ANALYZE (engine.py / stats.py).

Provenance: these are presto-cli statements the reference exposes by
delegating its `connect` verb to that CLI (reference:
presto-mgr.py:268-273); output shapes mirror Presto 0.248's
(single-column `Query Plan` for EXPLAIN, the seven-column stats
relation for SHOW STATS).
"""

from __future__ import annotations

import duckdb
import pytest

from presto_on_ray_spark.engine import Engine

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark).register_tables(SF)


def test_explain_default_is_physical_plan(eng):
    df = eng.sql("EXPLAIN SELECT count(*) FROM orders")
    assert df.columns == ["Query Plan"]
    plan = df.collect()[0][0]
    assert "Physical Plan" in plan or "AdaptiveSparkPlan" in plan
    assert "HashAggregate" in plan


def test_explain_logical(eng):
    plan = eng.sql("EXPLAIN (TYPE LOGICAL) SELECT o_custkey FROM orders").collect()[0][0]
    assert "Relation" in plan or "Aggregate" in plan or "Project" in plan


def test_explain_validate(eng):
    df = eng.sql("EXPLAIN (TYPE VALIDATE) SELECT 1")
    assert df.collect()[0][0] is True
    with pytest.raises(Exception):
        eng.sql("EXPLAIN (TYPE VALIDATE) SELECT no_such_col FROM orders").collect()


def test_explain_io_lists_input_locations(eng):
    rows = eng.sql("EXPLAIN (TYPE IO) SELECT * FROM lineitem").collect()
    assert any("lineitem.parquet" in r[0] for r in rows)


def test_explain_analyze_reports_rows(eng):
    plan = eng.sql("EXPLAIN ANALYZE SELECT count(*) AS n FROM nation").collect()[0][0]
    assert plan.startswith("Queried 1 rows")


def test_explain_translates_presto_dialect(eng):
    # strpos is Presto spelling — proves EXPLAIN goes through dialect
    plan = eng.sql(
        "EXPLAIN SELECT strpos(o_orderstatus, 'O') FROM orders"
    ).collect()[0][0]
    assert "Physical Plan" in plan or "AdaptiveSparkPlan" in plan


def test_show_stats_schema_and_values(eng):
    df = eng.sql("SHOW STATS FOR nation")
    assert df.columns == [
        "column_name", "data_size", "distinct_values_count",
        "nulls_fraction", "row_count", "low_value", "high_value",
    ]
    rows = {r["column_name"]: r for r in df.collect()}
    # oracle: exact facts from DuckDB on the same parquet
    con = duckdb.connect()
    n, ndv, lo, hi = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT n_nationkey), MIN(n_nationkey), "
        f"MAX(n_nationkey) FROM read_parquet('{SF}/nation.parquet')"
    ).fetchone()
    summary = rows[None]
    assert summary["row_count"] == float(n)
    key = rows["n_nationkey"]
    assert key["low_value"] == str(lo) and key["high_value"] == str(hi)
    assert key["nulls_fraction"] == 0.0
    # HLL++ estimate — Presto's stats are estimates too; pin to the
    # default 5% relative standard deviation (plus slack for tiny n)
    assert abs(key["distinct_values_count"] - ndv) <= max(2, 0.1 * ndv)
    # varchar column carries a data size, fixed-width does not
    assert rows["n_name"]["data_size"] is not None and rows["n_name"]["data_size"] > 0
    assert key["data_size"] is None


def test_show_stats_for_query(eng):
    df = eng.sql("SHOW STATS FOR (SELECT o_orderkey FROM orders WHERE o_orderkey <= 10)")
    rows = {r["column_name"]: r for r in df.collect()}
    assert rows[None]["row_count"] >= 1
    assert float(rows["o_orderkey"]["high_value"]) <= 10


def test_analyze_caches_and_returns_rowcount(eng):
    n = eng.sql("ANALYZE region").collect()[0][0]
    assert n == 5.0
    # SHOW STATS now serves the cached relation (no recompute path —
    # same rows object wrapped)
    assert "region" in eng._table_stats
    df = eng.sql("SHOW STATS FOR region")
    got = {r["column_name"] for r in df.collect()}
    assert {"r_regionkey", "r_name", None} <= got


def test_stats_complex_columns_null(eng):
    df = eng.sql("SHOW STATS FOR embeddings")
    rows = {r["column_name"]: r for r in df.collect()}
    emb = rows["embedding"]
    assert emb["distinct_values_count"] is None and emb["nulls_fraction"] is None


def test_explain_io_footer_stats_and_predicted_pruning(eng):
    """r6: EXPLAIN (TYPE IO) reports parquet-footer facts and the
    row-group pruning predicted by the query's own pushed filters."""
    rows = eng.sql(
        "EXPLAIN (TYPE IO) SELECT l_orderkey FROM lineitem"
        " WHERE l_orderkey <= -1"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert "lineitem.parquet" in r.input_location
    assert r.files >= 1 and r.row_groups >= 1 and r.rows > 0
    # l_orderkey <= -1 excludes every row group (keys start at 0)
    assert r.row_groups_pruned == r.row_groups
    assert "l_orderkey" in r.pushed_ranges and "-inf" in r.pushed_ranges

    # no predicate -> nothing pruned, same footer facts
    rows = eng.sql("EXPLAIN (TYPE IO) SELECT * FROM lineitem").collect()
    assert rows[0].row_groups_pruned == 0
    assert rows[0].pushed_ranges == ""


def test_explain_io_filters_are_per_scan(eng):
    """ADVICE r6: each FileScan's PushedFilters apply only to its own
    input location — a filter on lineitem's column must not appear in
    (or predict pruning for) the orders location's row."""
    rows = eng.sql(
        "EXPLAIN (TYPE IO) SELECT l_orderkey, o_totalprice FROM lineitem"
        " JOIN orders ON l_orderkey = o_orderkey WHERE l_quantity <= -1"
    ).collect()
    by_loc = {r.input_location: r for r in rows}
    li = next(r for loc, r in by_loc.items() if "lineitem.parquet" in loc)
    od = next(r for loc, r in by_loc.items() if "orders.parquet" in loc)
    assert "l_quantity" in li.pushed_ranges
    # orders' row reflects only ITS scan's filters (constraint
    # propagation may add o_orderkey bounds, but never l_quantity)
    assert "l_quantity" not in od.pushed_ranges
    # l_quantity <= -1 excludes every lineitem row group; orders must
    # not inherit that prediction from a column it does not have
    assert li.row_groups_pruned == li.row_groups


def test_explain_io_self_join_widens_across_scans(eng):
    """Two scans of the SAME location (self-join, one side filtered)
    must widen: the unfiltered scan reads every row group, so the
    location must predict no pruning — not inherit the filtered
    scan's bound (last-wins dict merge bug)."""
    rows = eng.sql(
        "EXPLAIN (TYPE IO) SELECT a.l_orderkey FROM lineitem a"
        " JOIN lineitem b ON a.l_orderkey = b.l_orderkey"
        " WHERE a.l_quantity <= -1"
    ).collect()
    li = next(r for r in rows if "lineitem.parquet" in r.input_location)
    assert li.row_groups_pruned == 0
    assert "l_quantity" not in li.pushed_ranges


# -- round 8: EXPLAIN / SHOW STATS FOR plan-only guard (ADVICE r7) ------

def test_explain_refuses_statement_family_without_executing(eng):
    """Presto's EXPLAIN (without ANALYZE) only PLANS. The engine's
    emulated DELETE / CREATE VIEW execute when dispatched, so the
    EXPLAIN path must refuse statement-family inner texts BEFORE
    dispatching them (ADVICE r7: 'EXPLAIN DELETE FROM nation'
    rewrote the table before raising)."""
    before = eng.table("nation").count()
    for sql in (
        "EXPLAIN DELETE FROM nation",
        "EXPLAIN ANALYZE DELETE FROM nation WHERE n_nationkey = 0",
        "EXPLAIN (TYPE VALIDATE) CREATE VIEW v_exp_guard AS SELECT 1 AS x",
        "EXPLAIN CREATE OR REPLACE VIEW nation AS SELECT 1 AS x",
        "EXPLAIN EXPLAIN ANALYZE DELETE FROM nation",
        "EXPLAIN USE parquet.default",
        "EXPLAIN SET SESSION query_max_run_time = '1s'",
    ):
        with pytest.raises(ValueError, match="EXPLAIN requires a query"):
            eng.sql(sql)
    assert eng.table("nation").count() == before
    # the view side effect must not have happened either
    assert not eng.spark.catalog.tableExists("v_exp_guard")
    assert eng._max_run_time_s is None  # SET SESSION not applied


def test_show_stats_refuses_statement_family_without_executing(eng):
    before = eng.table("nation").count()
    with pytest.raises(ValueError, match="SHOW STATS FOR .* requires a query"):
        eng.sql("SHOW STATS FOR (DELETE FROM nation)")
    assert eng.table("nation").count() == before


def test_explain_of_queries_still_works_after_guard(eng):
    # SELECT / WITH / VALUES / TABLE / parenthesized all still plan
    for sql in (
        "EXPLAIN SELECT 1 AS x",
        "EXPLAIN WITH t AS (SELECT 1 AS x) SELECT * FROM t",
        "EXPLAIN VALUES (1, 2)",
        "EXPLAIN (SELECT 1 AS x)",
    ):
        df = eng.sql(sql)
        assert df.columns == ["Query Plan"]
    # and EXPLAIN of the read-only SHOW family still dispatches
    df = eng.sql("EXPLAIN SHOW TABLES")
    assert df.columns == ["Query Plan"]


def test_explain_plans_insert_and_ctas_without_executing(eng):
    """Presto parity: EXPLAIN INSERT / EXPLAIN CTAS plan the write
    (TableWriter over the source query) but never execute it."""
    plan = eng.sql(
        "EXPLAIN INSERT INTO nation SELECT * FROM nation WHERE n_nationkey < 0"
    ).collect()[0][0]
    assert plan.startswith("TableWriter[nation]")
    assert "Physical Plan" in plan or "AdaptiveSparkPlan" in plan
    plan = eng.sql(
        "EXPLAIN (TYPE LOGICAL) CREATE TABLE t_exp_ctas AS SELECT 1 AS x"
    ).collect()[0][0]
    assert plan.startswith("TableWriter[t_exp_ctas]")
    assert not eng.spark.catalog.tableExists("t_exp_ctas")  # planned only
    df = eng.sql("EXPLAIN (TYPE VALIDATE) INSERT INTO nation SELECT * FROM nation")
    assert df.collect()[0][0] is True
    with pytest.raises(ValueError, match="would execute the write"):
        eng.sql("EXPLAIN ANALYZE INSERT INTO nation SELECT * FROM nation")
    # the write body must itself be a query
    with pytest.raises(ValueError, match="EXPLAIN requires a query"):
        eng.sql("EXPLAIN INSERT INTO nation DELETE FROM nation")


def test_explain_guard_not_defeated_by_inner_comments(eng):
    """Review r8: the plan-only guard must strip leading comments from
    the INNER statement — 'EXPLAIN /* c */ CREATE TABLE ... AS' executed
    the CTAS before this fix (now it renders the plan-only TableWriter),
    and comment-prefixed DELETE/VIEW statements dodged the refusal."""
    plan = eng.sql(
        "EXPLAIN /* c */ CREATE TABLE t_rv_bypass AS SELECT 1 AS x"
    ).collect()[0][0]
    assert plan.startswith("TableWriter[t_rv_bypass]")
    assert not eng.spark.catalog.tableExists("t_rv_bypass")  # planned only
    for sql in (
        "EXPLAIN -- c\nDELETE FROM nation",
        "EXPLAIN /* c */ CREATE VIEW v_rv_bypass AS SELECT 1 AS x",
        "SHOW STATS FOR (/* c */ DELETE FROM nation)",
    ):
        with pytest.raises(ValueError, match="requires a query"):
            eng.sql(sql)
    assert not eng.spark.catalog.tableExists("v_rv_bypass")
    assert eng.table("nation").count() == 25


def test_show_stats_query_ending_in_parens(eng):
    """Review r8: strip exactly ONE outer paren pair — a query ending
    in an IN-list close was corrupted by .strip('()')."""
    df = eng.sql(
        "SHOW STATS FOR (SELECT * FROM nation WHERE n_nationkey IN (1,2))"
    )
    assert df.columns[0] == "column_name"


def test_explain_write_resolves_target(eng):
    """Review r8: EXPLAIN INSERT/CTAS must resolve the target like
    Presto's analysis — missing tables, arity mismatches, and CTAS onto
    an existing name all fail instead of rendering a bogus plan."""
    with pytest.raises(Exception):
        eng.sql("EXPLAIN INSERT INTO no_such_table SELECT 1 AS x")
    with pytest.raises(ValueError, match="mismatched column count"):
        eng.sql("EXPLAIN INSERT INTO nation SELECT 1 AS x")
    with pytest.raises(ValueError, match="mismatched column count"):
        eng.sql("EXPLAIN INSERT INTO nation (n_nationkey, n_name) SELECT 1 AS x")
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("EXPLAIN CREATE TABLE nation AS SELECT 1 AS x")
    plan = eng.sql(
        "EXPLAIN CREATE TABLE IF NOT EXISTS nation AS SELECT 1 AS x"
    ).collect()[0][0]
    assert plan.startswith("TableWriter[nation]")
    plan = eng.sql(
        "EXPLAIN INSERT INTO nation (n_nationkey, n_name) "
        "SELECT n_nationkey, n_name FROM nation"
    ).collect()[0][0]
    assert plan.startswith("TableWriter[nation]")


def test_explain_write_respects_attached_namespace(eng):
    """Review r8 round 2: qualified targets go through the namespace
    rewrite like every other statement path."""
    for sql in (
        "EXPLAIN INSERT INTO parquet.default.nation SELECT * FROM nation",
        "EXPLAIN INSERT INTO default.nation SELECT * FROM nation",
    ):
        plan = eng.sql(sql).collect()[0][0]
        assert "TableWriter[" in plan, sql
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("EXPLAIN CREATE TABLE parquet.default.nation AS SELECT 1 AS x")


def test_explain_insert_rejects_unknown_column_names(eng):
    with pytest.raises(ValueError, match="column name does not exist"):
        eng.sql(
            "EXPLAIN INSERT INTO nation (bogus1, bogus2, bogus3, bogus4) "
            "SELECT * FROM nation"
        )


def test_explain_guard_not_defeated_by_paren_wrapping(eng):
    """Review r8 round 2: '(DELETE ...)' must classify as DELETE for
    the plan-only refusal, not fall through to the parser."""
    for sql in (
        "EXPLAIN ((DELETE FROM nation))",
        "EXPLAIN INSERT INTO nation (DELETE FROM nation)",
        "SHOW STATS FOR ((DELETE FROM nation))",
    ):
        with pytest.raises(ValueError, match="requires a query"):
            eng.sql(sql)
    assert eng.table("nation").count() == 25


def test_explain_guard_not_defeated_by_cte_or_from_prefix(eng, spark):
    """Review r8 round 3: Spark's grammar allows 'WITH ... INSERT' and
    'FROM t INSERT ...' — keyword-anchored classification executed the
    write under EXPLAIN. The shared classification view now peels the
    CTE list / FROM prefix to the DML it would run."""
    spark.sql("DROP TABLE IF EXISTS t_cte_guard")
    spark.sql("CREATE TABLE t_cte_guard (x INT) USING parquet")
    try:
        for sql in (
            "EXPLAIN WITH s AS (SELECT 1 AS x) INSERT INTO t_cte_guard SELECT * FROM s",
            "EXPLAIN FROM nation INSERT INTO t_cte_guard SELECT 1",
            "EXPLAIN WITH s AS (SELECT 1 AS x), u (y) AS (SELECT 2) "
            "INSERT INTO t_cte_guard SELECT s.x FROM s, u",
            "SHOW STATS FOR (WITH s AS (SELECT 1 AS x) INSERT INTO t_cte_guard SELECT * FROM s)",
        ):
            with pytest.raises(ValueError, match="requires a query"):
                eng.sql(sql)
        assert spark.table("t_cte_guard").count() == 0  # nothing wrote
        # CTE-prefixed QUERIES still plan fine
        plan = eng.sql(
            "EXPLAIN WITH s AS (SELECT 1 AS x) SELECT * FROM s"
        ).collect()[0][0]
        assert "Physical Plan" in plan or "AdaptiveSparkPlan" in plan
        # FROM-prefixed SELECT is a plain query in Spark's grammar
        plan = eng.sql("EXPLAIN FROM nation SELECT n_name").collect()[0][0]
        assert "Physical Plan" in plan or "AdaptiveSparkPlan" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cte_guard")


def test_explain_insert_rejects_duplicate_column_list(eng):
    with pytest.raises(ValueError, match="duplicate"):
        eng.sql(
            "EXPLAIN INSERT INTO nation (n_name, n_name) "
            "SELECT n_name, n_name FROM nation"
        )


def test_classification_dual_lexer_fail_closed(eng, spark):
    """Review r8 round 4: the classification scanners must not be
    desynchronizable via lexer corners — quoted CTE names, backslash
    escapes, nested comments. The dual-lexer blanked-code scan flags
    a write under EITHER Presto or Spark string-lexing rules."""
    spark.sql("DROP TABLE IF EXISTS t_lex_guard")
    spark.sql("CREATE TABLE t_lex_guard (x INT) USING parquet")
    try:
        for sql in (
            "EXPLAIN WITH `my cte` AS (SELECT 1) INSERT INTO t_lex_guard SELECT 1",
            "EXPLAIN WITH s AS (SELECT '\\'' AS q) INSERT INTO t_lex_guard SELECT 1",
            "EXPLAIN WITH s AS (SELECT '\\'-- ' AS q) INSERT INTO t_lex_guard SELECT 1",
        ):
            with pytest.raises(ValueError, match="requires a query"):
                eng.sql(sql)
        assert spark.table("t_lex_guard").count() == 0
        # benign lookalikes still classify as queries
        plan = eng.sql(
            "EXPLAIN WITH s AS (SELECT 'insert' AS w) SELECT * FROM s"
        ).collect()[0][0]
        assert "Physical Plan" in plan or "AdaptiveSparkPlan" in plan
        plan = eng.sql(
            "EXPLAIN FROM range(3) SELECT id AS `insert`"
        ).collect()[0][0]
        assert "Physical Plan" in plan or "AdaptiveSparkPlan" in plan
        plan = eng.sql(
            "EXPLAIN WITH s AS (SELECT 1) -- just insert it\nSELECT * FROM s"
        ).collect()[0][0]
        assert "Physical Plan" in plan or "AdaptiveSparkPlan" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_lex_guard")


def test_classification_allows_merge_aggregate_in_cte(eng):
    """Review r8 round 5: merge() is this engine's registered Presto
    aggregate — a bare-keyword DML scan refused legitimate CTE reads
    using it. Write detection anchors on write-position syntax."""
    plan = eng.sql(
        "EXPLAIN WITH h AS (SELECT approx_set(n_nationkey) AS s FROM nation) "
        "SELECT cardinality(merge(s)) AS d FROM h"
    ).collect()[0][0]
    assert "Physical Plan" in plan or "AdaptiveSparkPlan" in plan
    # and the same query actually runs end-to-end
    row = eng.sql(
        "WITH h AS (SELECT approx_set(n_nationkey) AS s FROM nation) "
        "SELECT cardinality(merge(s)) AS d FROM h"
    ).collect()[0]
    assert row["d"] == 25


def test_explain_io_write_renders_output_table(eng):
    """Presto's IO plan carries the outputTable alongside the inputs."""
    rows = eng.sql(
        "EXPLAIN (TYPE IO) INSERT INTO nation SELECT * FROM nation"
    ).collect()
    locs = [r.input_location for r in rows]
    assert any("nation.parquet" in loc for loc in locs)
    assert locs[-1] == "output-table: nation"
    assert rows[-1].files is None  # no footer facts for the sink


def test_explain_io_zorder_box_matches_footer_stats(eng, spark, tmp_path):
    """VERDICT r11 #5: a multi-predicate box query against a Z-ORDERED
    location predicts per-dimension row-group pruning through EXPLAIN
    (TYPE IO), and the prediction equals layout.footer_stats over the
    same box — the introspection surface and the storage layout agree
    on what a scan will skip BEFORE it runs. The secondary dimension
    alone must also predict pruning on this layout (the property a
    1-d clustering lacks — tests/test_layout.py pins that contrast)."""
    from pyspark.sql import functions as F

    from presto_on_ray_spark.layout import footer_stats, write_zordered
    from presto_on_ray_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    path = str(tmp_path / "events_z")
    write_zordered(ev, path, ["ts_us", "user_id"], num_files=8)
    t_lo, t_hi, u_lo, u_hi = ev.select(
        F.percentile_approx("ts_us", 0.4),
        F.percentile_approx("ts_us", 0.6),
        F.percentile_approx("user_id", 0.4),
        F.percentile_approx("user_id", 0.6),
    ).first()
    spark.read.parquet(path).createOrReplaceTempView("events_zorder")
    try:
        rows = eng.sql(
            f"EXPLAIN (TYPE IO) SELECT * FROM events_zorder"
            f" WHERE ts_us BETWEEN {t_lo} AND {t_hi}"
            f" AND user_id BETWEEN {u_lo} AND {u_hi}"
        ).collect()
        r = next(r for r in rows if "events_z" in r.input_location)
        st = footer_stats(
            path, {"ts_us": (t_lo, t_hi), "user_id": (u_lo, u_hi)}
        )
        assert r.row_groups == st["row_groups"]
        assert r.row_groups_pruned == st["row_groups_pruned"] > 0
        assert "ts_us in [" in r.pushed_ranges
        assert "user_id in [" in r.pushed_ranges

        rows = eng.sql(
            f"EXPLAIN (TYPE IO) SELECT * FROM events_zorder"
            f" WHERE user_id BETWEEN {u_lo} AND {u_hi}"
        ).collect()
        r = next(r for r in rows if "events_z" in r.input_location)
        st_u = footer_stats(path, {"user_id": (u_lo, u_hi)})
        assert r.row_groups_pruned == st_u["row_groups_pruned"] > 0
    finally:
        spark.catalog.dropTempView("events_zorder")
