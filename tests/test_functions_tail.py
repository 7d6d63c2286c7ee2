"""Round-5 scalar-function tail (SURVEY §2.8): the remaining Presto
0.248 family members — binary/ieee754, base64url, hmac_*, CDF
distribution family, set_agg/set_union, split_to_multimap, map
cosine_similarity, to_milliseconds, human_readable_seconds.

Every expected value is computed first-principles in Python (struct /
hmac / base64 / direct probability sums / closed forms) — independent
of the engine implementation under test. Reference parity: these
functions live in the unvendored Presto JVM the reference launches
(reference README.md:46); function list per the public Presto 0.248
docs.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import math
import struct
from math import comb

import pytest

from presto_on_ray_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


def one(engine, expr: str):
    return engine.sql(f"SELECT {expr} AS v").collect()[0].v


# ---------------- binary / encoding tail ----------------


def test_base64url_roundtrip_matches_python(engine):
    raw = b"\xfb\xef\xff\x00A"
    got = one(engine, "to_base64url(X'FBEFFF0041')")
    assert got == base64.urlsafe_b64encode(raw).decode()
    back = one(engine, f"from_base64url('{got}')")
    assert bytes(back) == raw


def test_big_endian_32_signed_roundtrip(engine):
    for v in (0, 1, -1, -255, 2**31 - 1, -(2**31)):
        packed = one(engine, f"to_big_endian_32({v})")
        assert bytes(packed) == struct.pack(">i", v), v
        assert one(engine, f"from_big_endian_32(X'{struct.pack('>i', v).hex()}')") == v


def test_ieee754_round_trips(engine):
    assert bytes(one(engine, "to_ieee754_64(1.5)")) == struct.pack(">d", 1.5)
    assert one(engine, "from_ieee754_64(to_ieee754_64(-0.1))") == -0.1
    assert bytes(one(engine, "to_ieee754_32(CAST(1.5 AS FLOAT))")) == struct.pack(
        ">f", 1.5
    )
    assert one(engine, "from_ieee754_32(to_ieee754_32(CAST(2.25 AS FLOAT)))") == 2.25


def test_hmac_family_matches_stdlib(engine):
    data, key = b"abc", b"key"
    for algo, digest in (
        ("hmac_sha1", hashlib.sha1),
        ("hmac_sha256", hashlib.sha256),
        ("hmac_sha512", hashlib.sha512),
        ("hmac_md5", hashlib.md5),
    ):
        got = one(engine, f"{algo}(X'{data.hex()}', X'{key.hex()}')")
        assert bytes(got) == hmac.new(key, data, digest).digest(), algo


# ---------------- distribution CDF family ----------------


def test_cauchy_cdf_closed_form(engine):
    for m, s, x in ((0.0, 1.0, 1.0), (2.5, 0.5, 1.0), (-1.0, 3.0, 4.0)):
        got = one(engine, f"cauchy_cdf({m}, {s}, {x})")
        assert got == pytest.approx(0.5 + math.atan((x - m) / s) / math.pi, abs=1e-12)
    inv = one(engine, "inverse_cauchy_cdf(2.5, 0.5, cauchy_cdf(2.5, 0.5, 1.0))")
    assert inv == pytest.approx(1.0, abs=1e-9)


def test_weibull_cdf_closed_form(engine):
    for a, b, x in ((2.0, 1.0, 1.5), (0.5, 2.0, 0.3), (1.0, 1.0, 2.0)):
        got = one(engine, f"weibull_cdf({a}, {b}, {x})")
        assert got == pytest.approx(1 - math.exp(-((x / b) ** a)), abs=1e-12)
    assert one(engine, "weibull_cdf(2.0, 1.0, -1.0)") == 0.0
    inv = one(engine, "inverse_weibull_cdf(2.0, 1.0, weibull_cdf(2.0, 1.0, 1.5))")
    assert inv == pytest.approx(1.5, abs=1e-9)


def test_chi_squared_cdf_even_dof_closed_forms(engine):
    # df=2: 1 - e^{-x/2}; df=4: 1 - e^{-x/2}(1 + x/2) — independent
    # closed forms for the incomplete-gamma kernel.
    for x in (0.1, 1.0, 3.7, 10.0):
        assert one(engine, f"chi_squared_cdf(2.0, {x})") == pytest.approx(
            1 - math.exp(-x / 2), abs=1e-10
        )
        assert one(engine, f"chi_squared_cdf(4.0, {x})") == pytest.approx(
            1 - math.exp(-x / 2) * (1 + x / 2), abs=1e-10
        )
    assert one(engine, "chi_squared_cdf(3.0, 0.0)") == 0.0


def test_poisson_cdf_matches_direct_sum(engine):
    lam = 3.5
    for k in (0, 2, 5, 10):
        direct = sum(math.exp(-lam) * lam**i / math.factorial(i) for i in range(k + 1))
        assert one(engine, f"poisson_cdf({lam}, {k})") == pytest.approx(
            direct, abs=1e-10
        )


def test_binomial_cdf_matches_direct_sum(engine):
    n, p = 12, 0.3
    for k in (0, 4, 11, 12):
        direct = sum(comb(n, i) * p**i * (1 - p) ** (n - i) for i in range(k + 1))
        assert one(engine, f"binomial_cdf({n}, {p}, {k})") == pytest.approx(
            direct, abs=1e-10
        )


def test_beta_cdf_polynomial_case_and_inverse(engine):
    # I_x(2,3) = 6x² − 8x³ + 3x⁴ (binomial expansion of the integral)
    for x in (0.05, 0.3, 0.62, 0.9):
        assert one(engine, f"beta_cdf(2.0, 3.0, {x})") == pytest.approx(
            6 * x**2 - 8 * x**3 + 3 * x**4, abs=1e-10
        )
    assert one(
        engine, "inverse_beta_cdf(2.0, 3.0, beta_cdf(2.0, 3.0, 0.3))"
    ) == pytest.approx(0.3, abs=1e-9)


def test_normal_and_beta_families_are_consistent(engine):
    # I_x(a, a) at x=0.5 is exactly 0.5 (symmetry), as is normal at mean
    assert one(engine, "beta_cdf(4.2, 4.2, 0.5)") == pytest.approx(0.5, abs=1e-12)
    assert one(engine, "normal_cdf(7.0, 2.0, 7.0)") == pytest.approx(0.5, abs=1e-12)


# ---------------- aggregate + map/string tail ----------------


def test_set_agg_and_set_union(engine):
    rows = engine.sql(
        "SELECT g, array_sort(set_agg(x)) AS sa, set_union(y) AS su "
        "FROM (VALUES (1, 10, ARRAY[1,2]), (1, 10, ARRAY[2,3]), (2, 7, ARRAY[9])) "
        "AS t(g, x, y) GROUP BY g ORDER BY g"
    ).collect()
    assert [r.sa for r in rows] == [[10], [7]]
    assert [r.su for r in rows] == [[1, 2, 3], [9]]


def test_split_to_multimap_keeps_duplicate_keys(engine):
    got = one(engine, "split_to_multimap('a=1;b=2;a=3', ';', '=')")
    assert dict(got) == {"a": ["1", "3"], "b": ["2"]}


def test_cosine_similarity_maps(engine):
    got = one(engine, "cosine_similarity(MAP(ARRAY['a','b'], ARRAY[1.0,2.0]), MAP(ARRAY['a','c'], ARRAY[3.0,4.0]))")
    assert got == pytest.approx(3.0 / (math.sqrt(5) * 5.0), abs=1e-12)


def test_to_milliseconds(engine):
    assert one(engine, "to_milliseconds(INTERVAL '2' MINUTE)") == 120_000
    assert (
        one(engine, "to_milliseconds(INTERVAL '1 02:03:04.5' DAY TO SECOND)")
        == 93_784_500
    )


def test_human_readable_seconds_presto_examples(engine):
    assert one(engine, "human_readable_seconds(96)") == "1 minute, 36 seconds"
    assert (
        one(engine, "human_readable_seconds(3762)") == "1 hour, 2 minutes, 42 seconds"
    )
    assert one(engine, "human_readable_seconds(0)") == "0 seconds"
    assert one(engine, "human_readable_seconds(604800 + 86400)") == "1 week, 1 day"


# ---------------- plan-shape guard ----------------


def test_sql_macros_stay_jvm_side(engine):
    """The expression-bodied names (SQL macros) must inline into the
    plan with no Python evaluation node — the whole point of the
    macro tier vs the pandas-UDF tier."""
    df = engine.sql(
        "SELECT to_big_endian_32(x) AS b, weibull_cdf(2.0, 1.0, CAST(x AS DOUBLE)) AS w, "
        "to_base64url(to_big_endian_32(x)) AS u FROM (VALUES (1), (2)) AS t(x)"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
