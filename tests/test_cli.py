"""The `connect` verb: REPL over Engine.sql with tabular output,
driving the reference demo's two README queries (reference
README.md:92-110) plus a Presto-dialect statement."""

from __future__ import annotations

import io

from presto_on_ray_spark.cli import format_table, repl
from presto_on_ray_spark.engine import Engine


def test_format_table_alignment_and_nulls():
    out = format_table(["id", "name"], [(1, "bob"), (22, None)])
    lines = out.splitlines()
    assert lines[0].strip().startswith("id")
    assert "---" in lines[1]
    assert "NULL" in lines[3]
    # all rows padded to equal width
    assert len({len(l) for l in lines}) == 1


def test_repl_runs_reference_demo_queries(spark, sf_dir):
    eng = Engine(spark).register_tables(sf_dir)
    script = """
CREATE OR REPLACE TEMP VIEW user AS
SELECT * FROM VALUES (1, 'bob', 30, 100000) AS t(id, name, age, income);
select * from user;
select sum(income) AS total from user;
quit
"""
    out = io.StringIO()
    repl(eng, io.StringIO(script), out, interactive=False)
    text = out.getvalue()
    assert "bob" in text                      # README demo query 1
    assert "100000" in text                   # README demo query 2 (sum)
    assert "(1 row)" in text
    assert "ERROR" not in text


def test_repl_presto_dialect_and_error_recovery(spark, sf_dir):
    eng = Engine(spark).register_tables(sf_dir)
    script = """
select approx_distinct(l_orderkey) AS d from lineitem;
select definitely_not_a_function(1);
select strpos('hello', 'll') AS p;
"""
    out = io.StringIO()
    repl(eng, io.StringIO(script), out, interactive=False)
    text = out.getvalue()
    assert "d" in text and "(1 row)" in text  # dialect fn worked
    assert "ERROR" in text                    # bad statement reported…
    assert " p" in text and "3" in text       # …and the shell kept going


def test_repl_admission_control_and_pool(spark, sf_dir):
    """--max-query-bytes / --pool plumbed through the shell: an
    oversized statement is rejected with the admission error, the
    shell survives, and admitted statements run in the named pool."""
    eng = Engine(spark).register_tables(sf_dir)
    script = """
select l_returnflag, count(*) AS n from lineitem group by 1;
"""
    out = io.StringIO()
    repl(eng, io.StringIO(script), out, interactive=False, max_input_bytes=1)
    assert "ERROR" in out.getvalue()
    assert "admission" in out.getvalue()

    out2 = io.StringIO()
    repl(eng, io.StringIO(script), out2, interactive=False,
         max_input_bytes=1 << 40, pool="repl-pool")
    assert "rows)" in out2.getvalue() and "ERROR" not in out2.getvalue()
    assert (
        spark.sparkContext.getLocalProperty("spark.scheduler.pool")
        == "repl-pool"
    )
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)


def test_interactive_paging_streams_full_result(spark, sf_dir):
    """r6: the interactive shell pages the FULL result max_rows at a
    time through toLocalIterator (REST paging symmetry) — Enter
    continues; every row arrives across pages."""
    from presto_on_ray_spark.cli import run_statement

    eng = Engine(spark).register_tables(sf_dir)
    # 10 rows, 3-row pages -> 3 'more?' prompts answered with Enter
    answers = io.StringIO("\n\n\n")
    out = io.StringIO()
    run_statement(
        eng,
        "SELECT n_nationkey FROM nation WHERE n_nationkey < 10 ORDER BY n_nationkey",
        out, max_rows=3, page=True, in_stream=answers,
    )
    text = out.getvalue()
    assert text.count("more?") == 3
    assert "(10 rows)" in text
    for k in range(10):
        assert f"\n {k} " in text or f"\n {k}\n" in text.replace(" |", "|")


def test_interactive_paging_q_stops(spark, sf_dir):
    from presto_on_ray_spark.cli import run_statement

    eng = Engine(spark).register_tables(sf_dir)
    out = io.StringIO()
    run_statement(
        eng,
        "SELECT n_nationkey FROM nation ORDER BY n_nationkey",
        out, max_rows=4, page=True, in_stream=io.StringIO("q\n"),
    )
    text = out.getvalue()
    assert text.count("more?") == 1
    assert "(4 rows) (stopped)" in text


def test_noninteractive_mode_keeps_bounded_window(spark, sf_dir):
    eng = Engine(spark).register_tables(sf_dir)
    out = io.StringIO()
    repl(
        eng,
        io.StringIO("SELECT n_nationkey FROM nation ORDER BY n_nationkey;\n"),
        out, max_rows=5, interactive=False,
    )
    text = out.getvalue()
    assert "(first 5 rows)" in text and "more?" not in text
