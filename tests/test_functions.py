"""Unit tests: dialect translation + shim-UDF semantics (SURVEY §2.8,
§7 milestone 2) + approximate-aggregate error bounds (§7 milestone 3)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from presto_on_ray_spark import suite
from presto_on_ray_spark.dialect import translate
from presto_on_ray_spark.functions.datetime_shim import translate_mysql_pattern
from presto_on_ray_spark.functions.registry import register_presto_functions
from presto_on_ray_spark.operators._util import t

suite.load_all()


# ---------------- dialect translation (pure function) ----------------


def test_translate_function_renames():
    assert (
        translate("SELECT approx_distinct(x), arbitrary(y) FROM t")
        == "SELECT approx_count_distinct(x), any_value(y) FROM t"
    )
    assert translate("SELECT strpos(a, 'b') FROM t") == "SELECT instr(a, 'b') FROM t"


def test_translate_preserves_string_literals():
    sql = "SELECT 'approx_distinct(q)' AS s, approx_distinct(x) FROM t"
    out = translate(sql)
    assert "'approx_distinct(q)'" in out
    assert "approx_count_distinct(x)" in out


def test_translate_try_cast():
    assert translate("SELECT TRY(CAST(x AS integer))") == "SELECT try_cast(x AS integer)"
    assert (
        translate("SELECT TRY(CAST('1.5' AS decimal(10,2)))")
        == "SELECT try_cast('1.5' AS decimal(10,2))"
    )


def test_translate_try_arithmetic_and_subscript():
    assert translate("SELECT TRY(a / b)") == "SELECT try_divide(a, b)"
    assert translate("SELECT TRY(x + 1)") == "SELECT try_add(x, 1)"
    assert translate("SELECT TRY(x - y)") == "SELECT try_subtract(x, y)"
    assert translate("SELECT TRY(x * y)") == "SELECT try_multiply(x, y)"
    # subscripts become element_at first, then TRY lifts to the
    # NULL-on-out-of-range variant
    assert translate("SELECT TRY(arr[5])") == "SELECT try_element_at(arr, 5)"
    # composite operands pass through (loud error beats a TRY that
    # guards only the outermost op)
    assert "TRY(" in translate("SELECT TRY(f(a) / g(b))")


def test_try_arithmetic_returns_null_on_error(spark):
    from presto_on_ray_spark.engine import Engine

    eng = Engine(spark)
    row = eng.sql(
        "SELECT TRY(1 / 0) AS d, TRY(9223372036854775807 + 1) AS o, "
        "TRY(ARRAY[1,2][5]) AS s"
    ).collect()[0]
    assert row.d is None and row.o is None and row.s is None


def test_translate_case_insensitive():
    assert translate("SELECT APPROX_DISTINCT(x)") == "SELECT approx_count_distinct(x)"


def test_mysql_pattern_translation():
    assert translate_mysql_pattern("%Y-%m-%d %H:%i:%S") == "%Y-%m-%d %H:%M:%S"
    assert translate_mysql_pattern("%M %e, %Y") == "%B %-d, %Y"
    assert translate_mysql_pattern("100%% %T") == "100%% %H:%M:%S"


# ---------------- shim UDFs through SQL ----------------


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_presto_functions(spark)


def test_word_stem(spark):
    rows = spark.sql(
        "SELECT word_stem('running') AS a, word_stem('caresses') AS b, word_stem('ponies') AS c"
    ).collect()[0]
    assert rows.a == "runn"
    assert rows.b == "caress"
    assert rows.c == "poni"


def test_hamming_distance(spark):
    r = spark.sql("SELECT hamming_distance('karolin', 'kathrin') AS d").collect()[0]
    assert r.d == 3


def test_url_encode_decode_roundtrip(spark):
    r = spark.sql(
        "SELECT url_decode(url_encode('a b&c=d/é')) AS roundtrip, url_encode('a b') AS enc"
    ).collect()[0]
    assert r.roundtrip == "a b&c=d/é"
    assert r.enc == "a+b"


def test_date_parse_mysql(spark):
    r = spark.sql(
        "SELECT date_parse('05/03/2024 07:09', '%d/%m/%Y %H:%i') AS ts"
    ).collect()[0]
    assert r.ts.year == 2024 and r.ts.month == 3 and r.ts.day == 5
    assert r.ts.hour == 7 and r.ts.minute == 9


def test_expression_shims(spark):
    from presto_on_ray_spark.functions.registry import (
        array_ngrams,
        cosine_similarity_arrays,
        is_finite,
    )

    df = spark.createDataFrame(
        [([1.0, 2.0], [2.0, 4.0], float("inf"))], ["a", "b", "x"]
    )
    row = df.select(
        cosine_similarity_arrays("a", "b").alias("cos"),
        is_finite("x").alias("fin"),
        array_ngrams(F.array(F.lit(1), F.lit(2), F.lit(3)), 2).alias("ng"),
    ).collect()[0]
    assert abs(row.cos - 1.0) < 1e-12
    assert row.fin is False
    assert row.ng == [[1, 2], [2, 3]]


# ---------------- approximate aggregates: bounded error ----------------


def test_approx_distinct_error_bound(spark, sf_correct):
    li = t(spark, sf_correct, "lineitem")
    exact = {
        r.l_returnflag: r.d
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("d"))
        .collect()
    }
    approx = {
        r.l_returnflag: r.approx_orders
        for r in suite.QUERIES["agg_approx_distinct"](spark, sf_correct).collect()
    }
    for flag, ex in exact.items():
        assert abs(approx[flag] - ex) / ex < 0.10, (flag, approx[flag], ex)


def test_approx_percentile_brackets_exact(spark, sf_correct):
    li = t(spark, sf_correct, "lineitem")
    exact = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50")
    ).collect()[0].p50
    approx = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50")
    ).collect()[0].p50
    assert abs(approx - exact) / exact < 0.01


def test_translate_cast_rewrites():
    assert translate("SELECT CAST(x AS varchar) FROM t") == "SELECT CAST(x AS string) FROM t"
    assert translate("SELECT CAST(m AS JSON)") == "SELECT CAST(m AS string)"


def test_translate_dateadd_argorder(spark):
    out = translate("SELECT date_add('month', 3, ts), date_diff('day', a, b)")
    assert out == "SELECT timestampadd(MONTH, 3, ts), timestampdiff(DAY, a, b)"
    row = spark.sql(
        translate(
            "SELECT date_add('day', 10, TIMESTAMP '2024-01-01 00:00:00') AS d"
        )
    ).collect()[0]
    assert str(row.d) == "2024-01-11 00:00:00"


def test_translate_unnest_forms(spark):
    spark.sql("SELECT 1 AS id, array('a','b') AS arr").createOrReplaceTempView("_tv_unnest")
    plain = spark.sql(
        translate("SELECT id, w FROM _tv_unnest CROSS JOIN UNNEST(arr) AS u(w)")
    ).collect()
    assert [(r.id, r.w) for r in plain] == [(1, "a"), (1, "b")]
    ordin = spark.sql(
        translate(
            "SELECT id, w, o FROM _tv_unnest CROSS JOIN UNNEST(arr) WITH ORDINALITY AS u(w, o)"
        )
    ).collect()
    assert [(r.w, r.o) for r in ordin] == [("a", 1), ("b", 2)]


def test_python_udtf_split_to_rows(spark):
    from presto_on_ray_spark.functions.registry import register_udtfs

    register_udtfs(spark)
    rows = spark.sql(
        "SELECT word, pos FROM split_to_rows('a b c', ' ')"
    ).collect()
    assert [(r.word, r.pos) for r in rows] == [("a", 1), ("b", 2), ("c", 3)]
    lateral = spark.sql(
        """
        SELECT t.id, s.word FROM VALUES (1, 'x,y'), (2, 'z') AS t(id, txt),
        LATERAL split_to_rows(t.txt, ',') s
        """
    ).collect()
    assert sorted((r.id, r.word) for r in lateral) == [(1, "x"), (1, "y"), (2, "z")]


def test_translate_double_quoted_identifiers(spark):
    out = translate('SELECT "weird col" FROM t')
    assert out == "SELECT `weird col` FROM t"
    # double quotes inside a single-quoted literal are untouched
    assert translate("SELECT 'he said \"hi\"' AS s") == "SELECT 'he said \"hi\"' AS s"
    spark.createDataFrame([(1,)], ["weird col"]).createOrReplaceTempView("_dq")
    assert spark.sql(translate('SELECT "weird col" FROM _dq')).collect()[0][0] == 1


def test_translate_at_time_zone_and_row(spark):
    out = translate("SELECT ts AT TIME ZONE 'Asia/Tokyo', row(1, 'a') FROM t")
    assert out == "SELECT from_utc_timestamp(ts, 'Asia/Tokyo'), struct(1, 'a') FROM t"
    r = spark.sql(
        translate(
            "SELECT CAST(TIMESTAMP '2024-01-01 00:00:00' AS timestamp) AS ts"
        )
    ).selectExpr("ts").collect()
    # live check through a view column
    spark.sql("SELECT TIMESTAMP '2024-01-01 00:00:00' AS ts").createOrReplaceTempView("_tz")
    row = spark.sql(translate("SELECT ts AT TIME ZONE 'Asia/Tokyo' AS t2 FROM _tz")).collect()[0]
    assert str(row.t2) == "2024-01-01 09:00:00"
    srow = spark.sql(translate("SELECT row(1, 'a') AS r")).collect()[0]
    assert srow.r[0] == 1 and srow.r[1] == "a"


def test_uuid_generates_unique_valid(spark):
    rows = spark.range(100).select(F.expr("uuid()").alias("u")).collect()
    us = [r.u for r in rows]
    assert len(set(us)) == 100
    import re

    pat = re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")
    assert all(pat.match(u) for u in us)


def test_truncate_json_format_array_average_shims(spark):
    register_presto_functions(spark)
    r = spark.sql(
        """
        SELECT truncate(8.97) AS t_pos, truncate(-8.97) AS t_neg,
               json_format('{"b": 2, "a": 1}') AS jf,
               array_average(array(1.0D, 2.0D, 6.0D)) AS avg
        """
    ).collect()[0]
    assert r.t_pos == 8.0 and r.t_neg == -8.0  # toward zero, Presto semantics
    assert r.jf == '{"b":2,"a":1}'
    assert abs(r.avg - 3.0) < 1e-12


def test_interval_types_mapping(spark):
    """SURVEY §1.3: Presto interval year-to-month / day-to-second map to
    Spark's YearMonthIntervalType / DayTimeIntervalType."""
    row = spark.sql(
        """
        SELECT INTERVAL '2-3' YEAR TO MONTH AS ym,
               INTERVAL '1 02:03:04' DAY TO SECOND AS dts,
               TIMESTAMP '2024-03-01 00:00:00' - TIMESTAMP '2024-02-28 12:00:00' AS diff
        """
    )
    types = {f.name: f.dataType.simpleString() for f in row.schema.fields}
    assert types["ym"] == "interval year to month"
    assert types["dts"] == "interval day to second"
    assert types["diff"].startswith("interval day")
    # collect only the day-time interval (PySpark cannot deserialize
    # year-month interval values to Python objects yet)
    r = row.select("dts").collect()[0]
    assert r.dts.days == 1 and r.dts.seconds == 2 * 3600 + 3 * 60 + 4


def test_zip_rename(spark):
    from presto_on_ray_spark.dialect import translate

    out = translate("SELECT zip(a, b) FROM t")
    assert out == "SELECT arrays_zip(a, b) FROM t"
    r = spark.sql(
        translate("SELECT zip(array(1, 2), array('x', 'y')) AS z")
    ).collect()[0]
    assert [(e[0], e[1]) for e in r.z] == [(1, "x"), (2, "y")]


def test_translate_split_literal_quoting():
    from presto_on_ray_spark.dialect import translate

    out = translate("SELECT split(x, '|') FROM t")
    assert "concat('\\\\Q', '|', '\\\\E')" in out
    # 3-arg form keeps the limit
    assert translate("SELECT split(x, '.', 3) FROM t").count("concat") == 1
    # regexp_split keeps regex semantics (no quoting)
    assert translate("SELECT regexp_split(x, '[0-9]+') FROM t") == "SELECT split(x, '[0-9]+') FROM t"


def test_presto_tail_renames(spark):
    from presto_on_ray_spark.engine import Engine

    eng = Engine(spark)
    row = eng.sql(
        "SELECT split('a|b|c', '|') AS parts, repeat(7, 3) AS arr, "
        "contains(array(1, 5), 5) AS has5, format('%s-%d', 'x', 42) AS fmt, "
        "split_to_map('k1=1,k2=2', ',', '=')['k2'] AS v2, now() IS NOT NULL AS has_now"
    ).collect()[0]
    assert row.parts == ["a", "b", "c"]
    assert row.arr == [7, 7, 7]
    assert row.has5 is True and row.fmt == "x-42" and row.v2 == "2" and row.has_now


def test_iso8601_and_json_helpers(spark):
    from pyspark.sql import functions as F

    from presto_on_ray_spark.functions.registry import (
        json_array_get,
        json_size,
        to_iso8601,
    )

    df = spark.createDataFrame(
        [('{"a":[1,2,3],"b":{"c":1,"d":2}}', "2024-01-02 03:04:05.678")], ["j", "t"]
    )
    row = df.select(
        json_array_get(F.get_json_object("j", "$.a"), 1).alias("el"),
        json_size("j", "$.a").alias("asz"),
        json_size("j", "$.b").alias("osz"),
        to_iso8601(F.col("t").cast("timestamp")).alias("iso"),
    ).collect()[0]
    assert row.el == "2" and row.asz == 3 and row.osz == 2
    assert row.iso == "2024-01-02T03:04:05.678Z"


def test_translate_named_bitwise(spark):
    from presto_on_ray_spark.engine import Engine

    eng = Engine(spark)
    row = eng.sql(
        "SELECT bitwise_and(12, 10) AS a, bitwise_or(12, 10) AS o, "
        "bitwise_xor(12, 10) AS x, bitwise_not(0) AS n"
    ).collect()[0]
    assert (row.a, row.o, row.x, row.n) == (8, 14, 6, -1)


def test_dialect_array_literals_and_subscripts(spark):
    """Round-4 dialect: Presto ARRAY[...] literals, 1-based subscripts
    via element_at, MAP(ARRAY.., ARRAY..), and the scalar spellings
    to_utf8/from_utf8/to_base/from_base/is_finite/strrpos."""
    from presto_on_ray_spark.dialect import translate

    cases = [
        ("SELECT ARRAY[1,2,3][2] AS r", 2),
        ("SELECT ARRAY[10,20][1] AS r", 10),
        ("SELECT split('a b c', ' ')[2] AS r", "b"),
        ("SELECT MAP(ARRAY['k1','k2'], ARRAY[1,2])['k2'] AS r", 2),
        ("SELECT ARRAY[ARRAY[1,2],ARRAY[3,4]][2][1] AS r", 3),
        ("SELECT transform(ARRAY[1,2,3], x -> x * 10)[3] AS r", 30),
        ("SELECT cardinality(ARRAY[1,2,3]) AS r", 3),
        ("SELECT strrpos('ababa', 'ab') AS r", 3),
        ("SELECT strrpos('ababa', 'z') AS r", 0),
        ("SELECT from_utf8(to_utf8('héllo')) AS r", "héllo"),
        ("SELECT to_base(255, 16) AS r", "ff"),
        ("SELECT from_base('ff', 16) AS r", 255),
        ("SELECT is_finite(1.5) AS r", True),
        ("SELECT is_finite(infinity()) AS r", False),
        ("SELECT is_infinite(infinity()) AS r", True),
        ("SELECT is_nan(nan()) AS r", True),
        ("SELECT bit_count(9, 64) AS r", 2),
        ("SELECT 'keep [1] inside' AS r", "keep [1] inside"),
        # signed base conversion (ADVICE r4: conv() is unsigned)
        ("SELECT to_base(-255, 16) AS r", "-ff"),
        ("SELECT from_base('-ff', 16) AS r", -255),
        # scalar-spelling rewrites must never fire inside literals
        ("SELECT 'call nan() now' AS r", "call nan() now"),
        ("SELECT 'to_base(1,2) infinity()' AS r", "to_base(1,2) infinity()"),
        ("SELECT concat('is_finite(', 'x)') AS r", "is_finite(x)"),
    ]
    for sql, want in cases:
        got = spark.sql(translate(sql)).collect()[0]["r"]
        assert got == want, (sql, got, want)


def test_dialect_subscript_matches_presto_error_semantics(spark):
    """ANSI mode: out-of-range subscript errors (as Presto does)."""
    import pytest

    from presto_on_ray_spark.dialect import translate

    with pytest.raises(Exception, match="INVALID_ARRAY_INDEX|out of bounds"):
        spark.sql(translate("SELECT ARRAY[1,2][5] AS r")).collect()


def test_register_function_arrow_batched(spark):
    """The user-facing UDF hook registers scalar fns as pandas_udfs
    (per-batch boundary crossing; no row-at-a-time F.udf in the
    engine)."""
    from presto_on_ray_spark.functions.registry import register_function

    register_function(
        spark, "cube_it", lambda x: None if x is None else x**3, "bigint"
    )
    rows = spark.sql(
        "SELECT cube_it(id) AS c FROM range(4) ORDER BY id"
    ).collect()
    assert [r.c for r in rows] == [0, 1, 8, 27]
    assert spark.sql("SELECT cube_it(CAST(NULL AS BIGINT)) AS c").collect()[0].c is None


def test_dialect_sha_family(spark):
    from presto_on_ray_spark.dialect import translate

    row = spark.sql(translate(
        "SELECT to_hex(sha256(to_utf8('abc'))) AS h256, "
        "to_hex(sha512(to_utf8('abc'))) AS h512, "
        "sha1(to_utf8('abc')) AS h1, 'sha256(x)' AS lit"
    )).collect()[0]
    import hashlib
    # Presto semantics: sha256/sha512 are VARBINARY, composed with
    # to_hex; sha1 stays Spark's hex-text native (documented delta)
    assert row.h256 == hashlib.sha256(b"abc").hexdigest().upper()
    assert row.h512 == hashlib.sha512(b"abc").hexdigest().upper()
    assert row.h1 == hashlib.sha1(b"abc").hexdigest()
    assert row.lit == "sha256(x)"


def test_translate_unnest_two_arrays(spark):
    """Presto UNNEST(a, b) zips positionally, NULL-padding the shorter
    array — the arrays_zip + inline rewrite."""
    from presto_on_ray_spark.dialect import translate

    spark.sql(
        "SELECT 1 AS id, array(1,2,3) AS a, array('x','y') AS b"
    ).createOrReplaceTempView("_tv_unnest2")
    rows = spark.sql(translate(
        "SELECT id, n, s FROM _tv_unnest2 CROSS JOIN UNNEST(a, b) AS u(n, s)"
    )).collect()
    assert [(r.n, r.s) for r in rows] == [(1, "x"), (2, "y"), (3, None)]
