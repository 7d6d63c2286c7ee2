"""Second round-5 scalar tail: ngrams, multimap_from_entries (SQL),
2-arg truncate, to_iso8601, bare localtimestamp, the json_* tail,
regexp_extract group-0 defaults, url_extract_* and the named bit
shifts — the last function-name gaps a Presto-0.248 session would hit.

Expected values are the public Presto semantics (docs examples);
reference parity as in test_functions_tail.py — the functions live in
the unvendored Presto JVM the reference launches (README.md:46).
"""

from __future__ import annotations

import pytest

from presto_on_ray_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


def one(engine, expr: str):
    return engine.sql(f"SELECT {expr} AS v").collect()[0][0]


def test_ngrams(engine):
    assert [list(g) for g in one(engine, "ngrams(ARRAY['a','b','c'], 2)")] == [
        ["a", "b"], ["b", "c"],
    ]
    # n >= cardinality: the whole array is the one gram (Presto docs)
    assert [list(g) for g in one(engine, "ngrams(ARRAY['a','b'], 5)")] == [["a", "b"]]
    # nested call argument
    assert [list(g) for g in one(engine, "ngrams(split('a b c d', ' '), 3)")] == [
        ["a", "b", "c"], ["b", "c", "d"],
    ]


def test_multimap_from_entries_sql(engine):
    got = one(engine, "multimap_from_entries(ARRAY[ROW('a',1),ROW('b',2),ROW('a',3)])")
    assert {k: list(v) for k, v in got.items()} == {"a": [1, 3], "b": [2]}


def test_truncate_two_arg(engine):
    assert one(engine, "truncate(3.78, 1)") == pytest.approx(3.7)
    assert one(engine, "truncate(-3.78, 1)") == pytest.approx(-3.7)
    assert one(engine, "truncate(123.456, 0)") == pytest.approx(123.0)
    # 1-arg form still the plain rename
    assert one(engine, "truncate(3.78)") == 3


def test_to_iso8601(engine):
    assert one(engine, "to_iso8601(DATE '2020-01-01')") == "2020-01-01"
    assert (
        one(engine, "to_iso8601(TIMESTAMP '2020-01-02 03:04:05')")
        == "2020-01-02T03:04:05.000"
    )


def test_bare_localtimestamp(engine):
    assert one(engine, "localtimestamp") is not None


def test_json_parse_format_identity(engine):
    assert one(engine, "json_parse('{\"a\":1}')") == '{"a":1}'
    assert one(engine, "json_format(json_parse('[1,2]'))") == "[1,2]"


def test_json_size(engine):
    assert one(engine, "json_size('{\"a\":{\"b\":1,\"c\":2}}', '$.a')") == 2
    assert one(engine, "json_size('{\"a\":[1,2,3]}', '$.a')") == 3
    assert one(engine, "json_size('{\"a\":7}', '$.a')") == 0
    assert one(engine, "json_size('{\"a\":7}', '$.nope')") is None


def test_is_json_scalar(engine):
    assert one(engine, "is_json_scalar('1')") is True
    assert one(engine, "is_json_scalar('\"abc\"')") is True
    assert one(engine, "is_json_scalar('[1,2]')") is False
    assert one(engine, "is_json_scalar('{\"a\":1}')") is False


def test_json_array_contains(engine):
    assert one(engine, "json_array_contains('[1,2,3]', 2)") is True
    assert one(engine, "json_array_contains('[\"a\",\"b\"]', 'c')") is False
    assert one(engine, "json_array_contains('[true]', true)") is True


def test_regexp_extract_group0_default(engine):
    assert one(engine, "regexp_extract('abc123def', '[0-9]+')") == "123"
    assert list(one(engine, "regexp_extract_all('a1b22', '[0-9]+')")) == ["1", "22"]
    # explicit group passes through to Spark's identical 3-arg form
    assert one(engine, "regexp_extract('abc123', '([a-z]+)([0-9]+)', 2)") == "123"


def test_url_extract_family(engine):
    u = "'https://example.com:8080/p/x?q=1&r=2#frag'"
    assert one(engine, f"url_extract_protocol({u})") == "https"
    assert one(engine, f"url_extract_host({u})") == "example.com"
    assert one(engine, f"url_extract_port({u})") == 8080
    assert one(engine, "url_extract_port('https://example.com/p')") is None
    assert one(engine, f"url_extract_path({u})") == "/p/x"
    assert one(engine, f"url_extract_query({u})") == "q=1&r=2"
    assert one(engine, f"url_extract_fragment({u})") == "frag"
    assert one(engine, f"url_extract_parameter({u}, 'r')") == "2"


def test_named_bit_shifts(engine):
    assert one(engine, "bitwise_shift_left(1, 3, 64)") == 8
    assert one(engine, "bitwise_logical_shift_right(-8, 60, 64)") == 15
    assert one(engine, "bitwise_arithmetic_shift_right(-8, 2)") == -2


def test_index_alias_of_strpos(engine):
    assert one(engine, "index('abcd', 'c')") == 3
    assert one(engine, "index('abcd', 'z')") == 0


def test_rewrites_do_not_touch_literals(engine):
    assert (
        one(engine, "'call ngrams(x, 2) and json_parse(y) now'")
        == "call ngrams(x, 2) and json_parse(y) now"
    )
