"""Unit tests for the statement-classification helpers (engine.py):
the security boundary behind the plan-only EXPLAIN / SHOW STATS
guards and the REST read-only guard. Each case class here corresponds
to a LIVE write bypass found during round-8 review — keep them green.
"""

from __future__ import annotations

import pytest

from presto_on_ray_spark.engine import (
    _blank_noncode,
    _classification_view,
    _hidden_write_keyword,
    _strip_leading_comments,
    _strip_outer_parens,
)


# -- comment lexing -----------------------------------------------------

def test_leading_comments_nested_blocks():
    assert _strip_leading_comments("/* a /* b */ c */ DELETE") == "DELETE"
    assert _strip_leading_comments("-- x\n/* y */ SELECT 1") == "SELECT 1"
    assert _strip_leading_comments("SELECT 1") == "SELECT 1"
    # unterminated comment consumes to the end, never raises
    assert _strip_leading_comments("/* open DELETE") == ""


def test_blank_noncode_strings_and_comments():
    # literals blanked, code kept, length preserved
    s = "SELECT 'insert into x' AS w -- insert\n, 1"
    b = _blank_noncode(s, False)
    assert len(b) == len(s)
    assert "insert" not in b.lower()
    assert "SELECT" in b and "AS w" in b


@pytest.mark.parametrize("be", [False, True])
def test_blank_noncode_quote_styles(be):
    for q in ("'x(y'", '"x(y"', "`x(y`"):
        assert "(" not in _blank_noncode(f"SELECT {q}", be)
    # doubled-quote escape stays inside the span
    assert "(" not in _blank_noncode("SELECT 'a''b('", be)


def test_blank_noncode_raw_string_rules():
    # r'\' is a RAW literal under Spark rules: the backslash is NOT an
    # escape and the span closes at the first quote, exposing the code
    # after it (missing this rule was the round-9 ADVICE live bypass)
    s = r"SELECT r'\' INSERT INTO t SELECT 1 -- '"
    assert "INSERT" in _blank_noncode(s, True)
    # identifier tail blocks the raw reading: xr'...' AND 1r'...' are
    # identifier + NORMAL string in Spark (digit-leading identifiers
    # are legal and land in typed-literal position), so the backslash
    # escapes and the write keyword stays inside the span
    assert "INSERT" not in _blank_noncode(r"SELECT xr'\' INSERT'", True)
    assert "INSERT" not in _blank_noncode(r"SELECT 1r'\' INSERT'", True)
    # the Presto view reaches the same span end by a different rule
    # (no backslash escapes at all), so both views expose the INSERT
    assert "INSERT" in _blank_noncode(r"SELECT r'\' INSERT'", False)
    # double-quoted raw form
    assert "INSERT" in _blank_noncode(r'SELECT R"\" INSERT INTO t -- "', True)


def test_blank_noncode_backslash_divergence():
    # Presto rules: '\' closes at the second quote; Spark rules: the
    # backslash escapes it and the span continues
    s = r"'\' DELETE"
    assert "DELETE" in _blank_noncode(s, False)
    assert "DELETE" not in _blank_noncode(s, True)


# -- paren peeling ------------------------------------------------------

def test_strip_outer_parens():
    assert _strip_outer_parens("(SELECT 1)") == "SELECT 1"
    # only a FULL wrapping pair is removed
    assert _strip_outer_parens("(a) UNION (b)") == "(a) UNION (b)"
    # IN-list close survives (the .strip('()') bug)
    assert _strip_outer_parens("(SELECT x WHERE k IN (1,2))") == \
        "SELECT x WHERE k IN (1,2)"
    # paren inside a literal does not desync the balance
    assert _strip_outer_parens("(SELECT '(' )") == "SELECT '('"


# -- hidden write detection (each a live bypass once) -------------------

WRITES = [
    "WITH s AS (SELECT 1 AS x) INSERT INTO t SELECT * FROM s",
    "FROM nation INSERT INTO t SELECT 1",
    "WITH `my cte` AS (SELECT 1) INSERT INTO t SELECT 1",
    "WITH s AS (SELECT '\\'' AS q) INSERT INTO t SELECT 1",
    "WITH s AS (SELECT '\\'-- ' AS q) INSERT INTO t SELECT 1",
    "WITH s AS (SELECT 1) INSERT OVERWRITE TABLE t SELECT 1",
    "FROM t INSERT OVERWRITE DIRECTORY '/x' SELECT 1",
    'WITH "q t" AS (SELECT 1) INSERT INTO t SELECT 1',
    # round-9 ADVICE live bypass: a backslash-escaped literal plus a
    # RAW literal desynced both lexer views (the Spark view treated the
    # backslash inside r'\' as an escape; Spark's lexer does not)
    "WITH s AS (SELECT '\\'' AS a, r'\\' AS b) INSERT INTO t SELECT 1 -- '",
    "WITH s AS (SELECT R'\\' AS b) INSERT INTO t SELECT 1 -- '",
    'WITH s AS (SELECT \'\\\'\' AS a, r"\\" AS b) INSERT INTO t SELECT 1 -- "',
    # 1r'..' is identifier + escaped string in Spark (NOT numeric +
    # raw literal — digit-leading identifiers are legal); real Spark
    # throws UNSUPPORTED_TYPED_LITERAL "1R" on this statement, so the
    # write never executes, but the classifier must still read the
    # literal with escapes or the quote parity desyncs (review r9)
    "WITH s AS (SELECT 1r'\\'x' AS a) INSERT INTO t SELECT 1 --'",
]

READS = [
    "WITH h AS (SELECT approx_set(k) AS s FROM t) "
    "SELECT cardinality(merge(s)) FROM h",
    "WITH s AS (SELECT 1) SELECT t.update FROM t",
    "WITH s AS (SELECT 1) SELECT delete_from FROM s",
    "WITH s AS (SELECT 'insert into x' AS w) SELECT * FROM s",
    "FROM range(3) SELECT id AS `insert`",
    "WITH s AS (SELECT 1) -- just insert the thing\nSELECT * FROM s",
    "SELECT 1",
    # a raw literal in a plain read is not a write
    "WITH s AS (SELECT r'\\d+' AS pat) SELECT * FROM s",
    # 'insert into' inside a raw literal stays a literal in both views
    "WITH s AS (SELECT r'insert into x' AS w) SELECT * FROM s",
]


@pytest.mark.parametrize("sql", WRITES)
def test_hidden_write_detected(sql):
    assert _hidden_write_keyword(sql) == "INSERT"


@pytest.mark.parametrize("sql", READS)
def test_benign_reads_not_flagged(sql):
    assert _hidden_write_keyword(sql) is None


def test_classification_view_end_to_end():
    assert _classification_view("((DELETE FROM nation))").startswith("DELETE")
    assert _classification_view(
        "(WITH s AS (SELECT 1) INSERT INTO t SELECT 1)"
    ) == "INSERT"
    assert _classification_view(
        "/* a /* b */ c */ INSERT INTO t SELECT 41"
    ).startswith("INSERT")
    view = _classification_view("EXPLAIN WITH s AS (SELECT 1) SELECT 1")
    assert view.startswith("EXPLAIN")  # wrappers untouched — the
    # guards recurse through them with their own regexes
