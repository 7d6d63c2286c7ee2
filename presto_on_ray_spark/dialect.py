"""Presto-SQL → Spark-SQL dialect translation.

The reference's only query interface is Presto SQL text typed into
presto-cli (reference: presto-mgr.py:268-273; demo queries
README.md:92, :102). Spark SQL is close enough that a pre-parse
translation layer covers the dialect gap (SURVEY §4.2 concluded no
custom Catalyst rule is warranted): function renames + a few syntactic
rewrites. Anything not rewritten passes through verbatim to Spark's
ANTLR parser.

Deliberately conservative: token-aware renames only (never inside
string literals), no full grammar. Unknown constructs surface as Spark
parse errors rather than silently changing semantics.
"""

from __future__ import annotations

import re

from presto_on_ray_spark.functions.registry import PRESTO_TO_SPARK_FN

# Renames that need the call-site parenthesis to avoid clobbering
# identifiers: name( -> replacement(
# ORDER MATTERS: date_format -> date_format_mysql must run BEFORE
# format_datetime -> date_format, or the latter's output would be
# re-rewritten by the former (dict insertion order is the rewrite order).
_FN_CALL = {
    "date_format": "date_format_mysql",  # MySQL patterns -> shim UDF
    **PRESTO_TO_SPARK_FN,
    "format_datetime": "date_format",  # Joda ~= Java patterns
    "normalize": "normalize_nfc",
    "row": "struct",  # ROW(1,'a') literal -> struct(1,'a')
}

_STRING_LITERAL = re.compile(r"'(?:[^']|'')*'")


def _split_literals(sql: str) -> list[tuple[bool, str]]:
    """Split SQL into (is_literal, text) segments so rewrites never touch
    the inside of string literals."""
    parts: list[tuple[bool, str]] = []
    pos = 0
    for m in _STRING_LITERAL.finditer(sql):
        if m.start() > pos:
            parts.append((False, sql[pos : m.start()]))
        parts.append((True, m.group(0)))
        pos = m.end()
    if pos < len(sql):
        parts.append((False, sql[pos:]))
    return parts


def _rewrite_code(seg: str) -> str:
    for presto_name, spark_name in _FN_CALL.items():
        if presto_name == spark_name:
            continue
        seg = re.sub(
            rf"\b{presto_name}\s*\(", f"{spark_name}(", seg, flags=re.IGNORECASE
        )
    # Presto double-quoted identifiers -> Spark backticks. Safe here:
    # this code path never sees string literals (split out upstream),
    # and in Presto double quotes are ALWAYS identifiers.
    seg = re.sub(r'"([^"]+)"', r"`\1`", seg)
    # CAST(x AS varchar/json) — Spark rejects length-less varchar and
    # has no json type; both map to string.
    seg = re.sub(r"\bAS\s+varchar\s*\)", "AS string)", seg, flags=re.IGNORECASE)
    seg = re.sub(r"\bAS\s+json\s*\)", "AS string)", seg, flags=re.IGNORECASE)
    # `IS [NOT] DISTINCT FROM` -> Spark supports it natively; no rewrite.
    return seg


def translate(sql: str) -> str:
    """Translate a Presto-dialect SQL string into Spark SQL."""
    out: list[str] = []
    for is_literal, seg in _split_literals(sql):
        out.append(seg if is_literal else _rewrite_code(seg))
    translated = "".join(out)
    # TRY(CAST(expr AS type)) -> try_cast(expr AS type); applied on the
    # joined text because the cast argument may be a string literal.
    # Other TRY() uses pass through and error loudly rather than
    # silently changing semantics.
    translated = re.sub(
        r"\bTRY\s*\(\s*CAST\s*\(([^()]*?)\s+AS\s+(\w+(?:\(\d+(?:,\s*\d+)?\))?)\s*\)\s*\)",
        r"try_cast(\1 AS \2)",
        translated,
        flags=re.IGNORECASE,
    )
    # Presto split(string, delimiter[, limit]) splits on a LITERAL
    # delimiter; Spark's split takes a Java regex. When the delimiter
    # is a string literal, wrap it in \Q...\E so metacharacters
    # ('|', '.', ...) split literally. Non-literal delimiters pass
    # through with regex semantics (documented delta; a delimiter
    # containing the two-char sequence \E is out of scope).
    translated = re.sub(
        r"\bsplit\s*\(\s*([^,()]+(?:\([^()]*\)[^,()]*)*?)\s*,\s*('(?:[^']|'')*')\s*([,)])",
        lambda m: f"split({m.group(1)}, concat('\\\\Q', {m.group(2)}, '\\\\E'){m.group(3)}",
        translated,
        flags=re.IGNORECASE,
    )
    # Presto regexp_split(string, pattern) == Spark split — renamed
    # here, after the literal-delimiter rewrite above.
    translated = re.sub(r"\bregexp_split\s*\(", "split(", translated, flags=re.IGNORECASE)
    # Presto named bitwise functions -> Spark operators. Conservative:
    # only simple (paren-free) arguments are rewritten; nested calls
    # pass through and fail loudly as unknown functions.
    for fn, op in (("bitwise_and", "&"), ("bitwise_or", "|"), ("bitwise_xor", "^")):
        translated = re.sub(
            rf"\b{fn}\s*\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*\)",
            rf"(\1 {op} \2)",
            translated,
            flags=re.IGNORECASE,
        )
    translated = re.sub(
        r"\bbitwise_not\s*\(\s*([^,()]+?)\s*\)", r"(~\1)", translated, flags=re.IGNORECASE
    )
    # Presto unit-ed datetime arithmetic: date_add('unit', n, ts) and
    # date_diff('unit', a, b) -> Spark timestampadd/timestampdiff.
    # Conservative: unit must be a quoted literal; the remaining args
    # are passed through verbatim (commas inside nested parens are
    # handled by the non-greedy tail + closing-paren anchor).
    translated = re.sub(
        r"\bdate_add\s*\(\s*'(\w+)'\s*,",
        lambda m: f"timestampadd({m.group(1).upper()},",
        translated,
        flags=re.IGNORECASE,
    )
    translated = re.sub(
        r"\bdate_diff\s*\(\s*'(\w+)'\s*,",
        lambda m: f"timestampdiff({m.group(1).upper()},",
        translated,
        flags=re.IGNORECASE,
    )
    # Presto `expr AT TIME ZONE 'tz'` -> from_utc_timestamp: correct
    # when the session zone is UTC (the engine pins it), where both
    # produce the wall-clock of the same instant in the target zone.
    # (simple column references only; a parenthesized expression would
    # need balanced-paren tracking and passes through untranslated)
    translated = re.sub(
        r"\b(\w+(?:\.\w+)*)\s+AT\s+TIME\s+ZONE\s+('[^']+')",
        r"from_utc_timestamp(\1, \2)",
        translated,
        flags=re.IGNORECASE,
    )
    # Presto UNNEST-as-join -> Spark LATERAL VIEW. Handles the common
    # single-column forms:
    #   CROSS JOIN UNNEST(expr) [WITH ORDINALITY] AS t(c[, ord])
    translated = re.sub(
        r"\bCROSS\s+JOIN\s+UNNEST\s*\(([^()]*(?:\([^()]*\)[^()]*)*)\)\s+WITH\s+ORDINALITY\s+AS\s+(\w+)\s*\(\s*(\w+)\s*,\s*(\w+)\s*\)",
        # inline() explodes an array<struct> into named columns, so both
        # the value and the (1-based) ordinality live under the user's
        # table alias with no helper columns leaking into SELECT *.
        r"LATERAL VIEW inline(transform(\1, (v, i) -> struct(v AS \3, CAST(i + 1 AS BIGINT) AS \4))) \2 AS \3, \4",
        translated,
        flags=re.IGNORECASE,
    )
    translated = re.sub(
        r"\bCROSS\s+JOIN\s+UNNEST\s*\(([^()]*(?:\([^()]*\)[^()]*)*)\)\s+AS\s+(\w+)\s*\(\s*(\w+)\s*\)",
        r"LATERAL VIEW explode(\1) \2 AS \3",
        translated,
        flags=re.IGNORECASE,
    )
    return translated
