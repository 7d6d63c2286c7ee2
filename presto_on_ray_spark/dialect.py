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


def _rewrite_array_literals(sql: str) -> str:
    """Presto ``ARRAY[...]`` constructor -> Spark ``array(...)``.

    Bracket-matched with a scanner (regex can't pair nested brackets):
    each '[' is classified as array-literal (preceded by the ARRAY
    keyword) or subscript, and only array-literal ']'s become ')'.
    String literals are skipped via the same splitter as every other
    rewrite, with bracket state carried across literal spans (brackets
    may legally contain literals: ARRAY['a','b'])."""
    out: list[str] = []
    stack: list[bool] = []  # True = array literal bracket
    kw = re.compile(r"\bARRAY\s*$", re.IGNORECASE)
    for is_literal, seg in _split_literals(sql):
        if is_literal:
            out.append(seg)
            continue
        buf: list[str] = []
        for ch in seg:
            if ch == "[":
                text = "".join(buf)
                if kw.search(text):
                    # drop the ARRAY keyword, open a paren
                    buf = [text[: kw.search(text).start()], "array("]
                    stack.append(True)
                else:
                    buf.append("[")
                    stack.append(False)
            elif ch == "]" and stack:
                buf.append(")" if stack.pop() else "]")
            else:
                buf.append(ch)
        out.append("".join(buf))
    return "".join(out)


def _subscript_base_start(sql: str, end: int) -> int | None:
    """Backward-scan the expression base ending at ``end`` (exclusive):
    a balanced ``...)`` call (plus its function-name identifier), a
    quoted identifier, or an identifier chain. Returns the start index,
    or None if the preceding token can't be a subscriptable base."""
    i = end - 1
    while i >= 0 and sql[i].isspace():
        i -= 1
    if i < 0:
        return None
    if sql[i] == ")":
        depth = 0
        while i >= 0:
            if sql[i] == ")":
                depth += 1
            elif sql[i] == "(":
                depth -= 1
                if depth == 0:
                    break
            i -= 1
        if depth != 0:
            return None
        j = i - 1
        while j >= 0 and (sql[j].isalnum() or sql[j] in "_."):
            j -= 1
        return j + 1  # includes the call's function name (may be empty)
    if sql[i] in "`\"":
        quote = sql[i]
        j = i - 1
        while j >= 0 and sql[j] != quote:
            j -= 1
        return j if j >= 0 else None
    if sql[i].isalnum() or sql[i] in "_\x00":
        j = i
        while j >= 0 and (sql[j].isalnum() or sql[j] in "_.\x00"):
            j -= 1
        return j + 1
    return None


def _shield_literals(sql: str) -> tuple[str, list[str]]:
    """Replace every string literal with a quote/paren/comma-free
    placeholder (``\\x00N\\x00``) so rewrites can treat the whole text
    as code: function-argument patterns still match (the placeholder is
    an atom), but literal CONTENT can never be rewritten. Restore with
    ``_restore_literals`` — the module invariant that only the r4 tail
    rewrites violated (ADVICE r4: nan() etc. rewrote inside literals)."""
    literals: list[str] = []
    parts: list[str] = []
    for is_literal, seg in _split_literals(sql):
        if is_literal:
            parts.append(f"\x00{len(literals)}\x00")
            literals.append(seg)
        else:
            parts.append(seg)
    return "".join(parts), literals


def _restore_literals(sql: str, literals: list[str]) -> str:
    return re.sub(r"\x00(\d+)\x00", lambda m: literals[int(m.group(1))], sql)


def _rewrite_subscripts(sql: str) -> str:
    """Presto ``x[i]`` subscripts -> ``element_at(x, i)``.

    Presto subscripts arrays 1-based and looks maps up by key —
    exactly Spark's element_at semantics for both types — while
    Spark's own ``[]`` is 0-based on arrays: passing subscripts
    through unchanged would be silently off by one. Runs after the
    ARRAY-literal rewrite (every remaining bracket is a subscript).
    Innermost-first scan with balanced backward base extraction, so
    chains (``a[1][2]``), call bases (``split(s, ' ')[1]``), and nested
    subscript keys (``a[b[1]]``) all rewrite at any depth. Under the
    engine's default ANSI mode element_at even matches Presto's
    out-of-range ERROR behavior (try_element_at is the NULL form)."""
    # Shield string literals behind bracket-free placeholders so the
    # scanner can treat the text as pure code (a subscript key may BE a
    # literal: m['key']), then restore them.
    literals: list[str] = []
    parts: list[str] = []
    for is_literal, seg in _split_literals(sql):
        if is_literal:
            parts.append(f"\x00{len(literals)}\x00")
            literals.append(seg)
        else:
            parts.append(seg)
    sql = "".join(parts)
    while True:
        close = sql.find("]")
        if close < 0:
            break
        open_ = sql.rfind("[", 0, close)
        if open_ < 0:
            break  # stray ']' — leave the rest untouched
        base_start = _subscript_base_start(sql, open_)
        if base_start is None:
            # not a subscriptable base (shouldn't happen in valid
            # Presto SQL after the ARRAY pass) — leave verbatim by
            # masking this pair so the scan can proceed.
            sql = sql[:open_] + "\x01" + sql[open_ + 1 : close] + "\x02" + sql[close + 1 :]
            continue
        base = sql[base_start:open_].strip()
        content = sql[open_ + 1 : close].strip()
        sql = (
            sql[:base_start]
            + f"element_at({base}, {content})"
            + sql[close + 1 :]
        )
    sql = sql.replace("\x01", "[").replace("\x02", "]")
    return re.sub(r"\x00(\d+)\x00", lambda m: literals[int(m.group(1))], sql)


def translate(sql: str) -> str:
    """Translate a Presto-dialect SQL string into Spark SQL.

    Every rewrite below runs over literal-shielded text (string
    literals swapped for placeholder atoms), so no substitution can
    ever touch the inside of a literal while argument patterns still
    match literal arguments like ``to_utf8('x')``. Rewrites that need
    a literal's CONTENT (date_add/date_diff units, AT TIME ZONE, the
    split delimiter) match the placeholder and look the literal up."""
    sql = _rewrite_array_literals(sql)
    sql = _rewrite_subscripts(sql)
    translated, _lits = _shield_literals(sql)
    # Presto qdigest/tdigest build→[merge→]read compositions -> Spark's
    # percentile_approx over the same input. MUST run before
    # _rewrite_code: the generic merge() -> hll_union_agg rename would
    # otherwise swallow the qdigest merge. Only same-expression
    # compositions rewrite (a digest carried between subqueries has no
    # Spark value type and errors loudly as qdigest_agg).
    _argq = r"(?:[^,()]|\((?:[^()]|\([^()]*\))*\))+?"
    translated = re.sub(
        rf"\bvalues?_at_quantiles?\s*\(\s*(?:merge\s*\(\s*)?"
        rf"(?:qdigest_agg|tdigest_agg)\s*\(\s*({_argq})\s*\)\s*\)?\s*,\s*({_argq})\s*\)",
        r"percentile_approx(\1, \2)",
        translated, flags=re.IGNORECASE,
    )
    translated = _rewrite_code(translated)
    # Presto MAP(ARRAY[...], ARRAY[...]) (now array(...)) builds a map
    # from a key array + value array -> Spark map_from_arrays. (Spark's
    # own MAP(k1, v1, ...) form is untouched — it never starts with an
    # array( argument.)
    translated = re.sub(
        r"\bMAP\s*\(\s*(?=array\s*\()", "map_from_arrays(", translated,
        flags=re.IGNORECASE,
    )
    # Binary/utf8 + base-conversion + float-classification spellings
    # (conservative: simple paren-free arguments, like the bitwise
    # rewrites below; nested calls error loudly as unknown functions).
    translated = re.sub(
        r"\bto_utf8\s*\(\s*([^,()]+(?:\([^()]*\)[^,()]*)*?)\s*\)", r"encode(\1, 'utf-8')",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        r"\bfrom_utf8\s*\(\s*([^,()]+(?:\([^()]*\)[^,()]*)*?)\s*\)", r"decode(\1, 'utf-8')",
        translated, flags=re.IGNORECASE,
    )
    # Presto to_base/from_base are SIGNED; Spark conv() treats negative
    # inputs as unsigned 64-bit, so the sign is split out explicitly
    # (ADVICE r4). LONG_MIN negation is out of scope (errors loudly
    # under ANSI rather than silently diverging).
    translated = re.sub(
        r"\bto_base\s*\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*\)",
        r"(CASE WHEN \1 < 0 THEN '-' || lower(conv(-(\1), 10, \2))"
        r" ELSE lower(conv(\1, 10, \2)) END)",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        r"\bfrom_base\s*\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*\)",
        r"(CASE WHEN substr(\1, 1, 1) = '-'"
        r" THEN -CAST(conv(substr(\1, 2), \2, 10) AS BIGINT)"
        r" ELSE CAST(conv(\1, \2, 10) AS BIGINT) END)",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        r"\bis_finite\s*\(\s*([^,()]+(?:\([^()]*\)[^,()]*)*?)\s*\)",
        r"(abs(\1) < CAST('Infinity' AS DOUBLE))", translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        r"\bis_infinite\s*\(\s*([^,()]+(?:\([^()]*\)[^,()]*)*?)\s*\)",
        r"(abs(\1) = CAST('Infinity' AS DOUBLE))", translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        r"\binfinity\s*\(\s*\)", "CAST('Infinity' AS DOUBLE)", translated,
        flags=re.IGNORECASE,
    )
    translated = re.sub(
        r"\bnan\s*\(\s*\)", "CAST('NaN' AS DOUBLE)", translated, flags=re.IGNORECASE
    )
    # Presto bit_count(x, 64) over the full long range == Spark's 1-arg
    # bit_count; narrower widths pass through and error loudly.
    translated = re.sub(
        r"\bbit_count\s*\(\s*([^,()]+?)\s*,\s*64\s*\)", r"bit_count(\1)",
        translated, flags=re.IGNORECASE,
    )
    # Presto's one-arg sha digests return VARBINARY; Spark's two-arg
    # sha2 returns hex text, so wrap with unhex — then the Presto idiom
    # to_hex(sha256(x)) composes correctly. (sha1/md5 are native Spark
    # names returning hex text — that delta is documented rather than
    # rewritten, since changing them would surprise Spark-SQL users of
    # the same session.)
    translated = re.sub(
        r"\bsha256\s*\(\s*([^()]*(?:\([^()]*\)[^()]*)*)\)", r"unhex(sha2(\1, 256))",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        r"\bsha512\s*\(\s*([^()]*(?:\([^()]*\)[^()]*)*)\)", r"unhex(sha2(\1, 512))",
        translated, flags=re.IGNORECASE,
    )
    # Presto set_union(arr) aggregate: union of all input arrays,
    # rendered deterministically (sorted — Presto leaves order
    # undefined). set_agg is a rename (collect_set) in _FN_CALL.
    translated = re.sub(
        r"\bset_union\s*\(\s*([^()]*(?:\([^()]*\)[^()]*)*)\)",
        r"array_sort(array_distinct(flatten(collect_list(\1))))",
        translated, flags=re.IGNORECASE,
    )
    # Presto to_milliseconds(interval day to second) -> bigint ms. The
    # argument is cast to the widest day-time interval first: Spark
    # types single-unit literals narrowly (INTERVAL MINUTE) and refuses
    # to extract fields outside the declared range.
    _itv = r"CAST(\1 AS INTERVAL DAY TO SECOND)"
    translated = re.sub(
        r"\bto_milliseconds\s*\(\s*([^()]*(?:\([^()]*\)[^()]*)*)\)",
        rf"CAST((extract(DAY FROM {_itv}) * 86400000"
        rf" + extract(HOUR FROM {_itv}) * 3600000"
        rf" + extract(MINUTE FROM {_itv}) * 60000"
        rf" + extract(SECOND FROM {_itv}) * 1000) AS BIGINT)",
        translated, flags=re.IGNORECASE,
    )
    # Statistical/date tail (functions/statistical.py documents the
    # semantics; these rewrites inline the same expressions so the SQL
    # surface matches the Python helpers). Conservative simple-arg
    # patterns, like the bitwise rewrites below.
    translated = re.sub(
        r"\bmillisecond\s*\(\s*([^,()]+?)\s*\)",
        r"CAST(pmod(unix_micros(\1), 1000000) / 1000 AS INT)",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        r"\b(?:year_of_week|yow)\s*\(\s*([^,()]+?)\s*\)",
        # ISO week-year = year of the Thursday of the value's ISO week
        r"year(date_add(to_date(\1), CAST(4 - (pmod(dayofweek(to_date(\1)) + 5, 7) + 1) AS INT)))",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        # Presto day_of_week/dow is ISO Mon=1..Sun=7; Spark's dayofweek
        # is Sun=1 — a rename would be silently off by one
        r"\b(?:day_of_week|dow)\s*\(\s*([^,()]+?)\s*\)",
        r"(pmod(dayofweek(\1) + 5, 7) + 1)",
        translated, flags=re.IGNORECASE,
    )
    # The same ISO delta inside EXTRACT: Spark's extract(DOW ...) is
    # Sun=1 (silently off by one vs Presto's ISO Mon=1), and Spark has
    # no YOW field. DOY passes through (identical). Operands may nest
    # parens two levels; anything deeper is caught by the loud-error
    # backstop below (Spark would otherwise evaluate DOW silently
    # off by one — the one field where pass-through is WRONG, not
    # unresolved).
    _xarg = r"((?:[^()]|\((?:[^()]|\([^()]*\))*\))+?)"
    translated = re.sub(
        rf"\bEXTRACT\s*\(\s*(?:DOW|DAY_OF_WEEK)\s+FROM\s+{_xarg}\s*\)",
        r"(pmod(dayofweek(\1) + 5, 7) + 1)",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        r"\bEXTRACT\s*\(\s*(?:DOW|DAY_OF_WEEK)\s+FROM\b",
        "EXTRACT(DOW_ISO_UNSUPPORTED_DEPTH FROM",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        rf"\bEXTRACT\s*\(\s*(?:YOW|YEAR_OF_WEEK)\s+FROM\s+{_xarg}\s*\)",
        r"year(date_add(to_date(\1), CAST(4 - (pmod(dayofweek(to_date(\1)) + 5, 7) + 1) AS INT)))",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        rf"\bEXTRACT\s*\(\s*DAY_OF_YEAR\s+FROM\s+{_xarg}\s*\)",
        r"dayofyear(\1)",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        r"\bgreat_circle_distance\s*\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*,\s*([^,()]+?)\s*,\s*([^,()]+?)\s*\)",
        r"(12742.02 * asin(least(sqrt("
        r"pow(sin((radians(\3) - radians(\1)) / 2), 2)"
        r" + cos(radians(\1)) * cos(radians(\3))"
        r" * pow(sin((radians(\4) - radians(\2)) / 2), 2)), 1.0)))",
        translated, flags=re.IGNORECASE,
    )
    for fn, sign in (("wilson_interval_lower", "-"), ("wilson_interval_upper", "+")):
        translated = re.sub(
            rf"\b{fn}\s*\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*,\s*([^,()]+?)\s*\)",
            r"((CAST(\1 AS DOUBLE) / \2 + \3 * \3 / (2 * \2) "
            + sign
            + r" \3 * sqrt((CAST(\1 AS DOUBLE) / \2 * (1 - CAST(\1 AS DOUBLE) / \2)"
            r" + \3 * \3 / (4 * \2)) / \2)) / (1 + \3 * \3 / \2))",
            translated, flags=re.IGNORECASE,
        )
    # Presto ngrams(array, n) -> array of n-element windows. Spark has
    # no builtin; the HOF composition is exact (n > size yields the
    # whole array as its one gram, matching Presto).
    # argument pattern tolerating two paren-nesting levels (enough for
    # e.g. array(struct(...), ...) from a rewritten ARRAY[ROW(...)])
    _arg = r"(?:[^,()]|\((?:[^()]|\([^()]*\))*\))+?"
    translated = re.sub(
        rf"\bngrams\s*\(\s*({_arg})\s*,\s*([^,()]+?)\s*\)",
        r"transform(sequence(1, greatest(size(\1) - (\2) + 1, 1)),"
        r" ngram_i -> slice(\1, ngram_i, \2))",
        translated, flags=re.IGNORECASE,
    )
    # Presto multimap_from_entries(array<row(k,v)>) -> map<k, array<v>>
    # keeping duplicate keys (Spark's map_from_entries would error).
    # First-occurrence key order, matching Presto. ROW literals type as
    # struct(col1, col2) — the overwhelmingly common SQL idiom; other
    # field names error loudly.
    translated = re.sub(
        rf"\bmultimap_from_entries\s*\(\s*({_arg})\s*\)",
        r"map_from_arrays("
        r"array_distinct(transform(\1, mme_s -> mme_s.col1)),"
        r" transform(array_distinct(transform(\1, mme_s -> mme_s.col1)),"
        r" mme_k -> transform(filter(\1, mme_s -> mme_s.col1 = mme_k),"
        r" mme_s -> mme_s.col2)))",
        translated, flags=re.IGNORECASE,
    )
    # Presto truncate(x, n): truncate toward zero at n decimal digits
    # (the 1-arg form is a plain rename elsewhere).
    translated = re.sub(
        r"\btruncate\s*\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*\)",
        r"(sign(\1) * floor(abs(\1) * power(10, \2)) / power(10, \2))",
        translated, flags=re.IGNORECASE,
    )
    # Presto to_iso8601: date -> 'yyyy-MM-dd', timestamp -> ISO 'T' form.
    # typeof() is per-row evaluable, so one expression covers both
    # overloads.
    translated = re.sub(
        r"\bto_iso8601\s*\(\s*([^,()]+?)\s*\)",
        r"(CASE WHEN typeof(\1) = 'date' THEN date_format(\1, 'yyyy-MM-dd')"
        r" ELSE date_format(\1, 'yyyy-MM-dd''T''HH:mm:ss.SSS') END)",
        translated, flags=re.IGNORECASE,
    )
    # Presto typed literals over Spark-less types: DECIMAL '1.25',
    # BIGINT '42', DOUBLE '1.5', ... -> CAST forms (DATE/TIMESTAMP/
    # INTERVAL/X'..' literals are native and untouched). The literal is
    # shielded, so the content is looked up to size DECIMAL exactly.
    def _typed_literal(m: re.Match) -> str:
        # EMIT THE PLACEHOLDER, never the restored literal: re-embedding
        # the content mid-pass would let every later rewrite run inside
        # the string (VARCHAR 'localtimestamp' came back corrupted).
        # The literal is only READ here, to size DECIMAL.
        typ = m.group(1).upper()
        ph = f"\x00{m.group(2)}\x00"
        body = _lits[int(m.group(2))][1:-1]
        if typ in ("VARCHAR", "CHAR"):
            return ph
        if typ == "DECIMAL":
            digits = re.sub(r"[^0-9]", "", body)
            frac = body.split(".")[1] if "." in body else ""
            precision = max(len(digits), 1)
            return f"CAST({ph} AS DECIMAL({precision}, {len(frac)}))"
        if typ == "TIME":
            # Spark 4.1's native TIME literal covers the plain form;
            # the tz form ('10:30:00 +05:30') has no Spark type, so it
            # lowers to the engine's struct rendering
            # (functions/timetype.py). Parsed here so a bad literal
            # errors at translate time, like Presto's parser.
            from presto_on_ray_spark.functions import timetype as _tt

            micros, offset = _tt.parse_time(body)
            if offset is None:
                return f"TIME {ph}"
            h, rem = divmod(micros, _tt.MICROS_PER_HOUR)
            mi, rem = divmod(rem, _tt.MICROS_PER_MINUTE)
            s, frac = divmod(rem, _tt.MICROS_PER_SECOND)
            return (
                f"named_struct('t', make_time({h}, {mi}, "
                f"CAST({s}.{frac:06d} AS DECIMAL(8,6))), "
                f"'offset_minutes', {offset})"
            )
        spark_type = {"REAL": "FLOAT"}.get(typ, typ)
        return f"CAST({ph} AS {spark_type})"

    translated = re.sub(
        r"\b(DECIMAL|BIGINT|INTEGER|SMALLINT|TINYINT|DOUBLE|REAL|BOOLEAN|VARCHAR|CHAR|TIME)"
        r"\s+\x00(\d+)\x00",
        _typed_literal,
        translated, flags=re.IGNORECASE,
    )
    # Bare niladic keywords Spark only accepts with parens.
    translated = re.sub(
        r"\blocaltimestamp\b(?!\s*\()", "localtimestamp()", translated,
        flags=re.IGNORECASE,
    )
    # Presto localtime -> TIME (time-of-day of the session clock);
    # current_time -> TIME WITH TIME ZONE at the session zone (pinned
    # UTC, so offset 0). \b keeps both clear of localtimestamp /
    # current_timestamp (no word boundary before 'stamp').
    _NOW_TIME = (
        "to_time(date_format(localtimestamp(), 'HH:mm:ss.SSSSSS'),"
        " 'HH:mm:ss.SSSSSS')"
    )
    translated = re.sub(
        r"\blocaltime\b(?!\s*\()", _NOW_TIME, translated, flags=re.IGNORECASE
    )
    translated = re.sub(
        r"\bcurrent_time\b(?!\s*\()",
        f"named_struct('t', {_NOW_TIME}, 'offset_minutes', 0)",
        translated, flags=re.IGNORECASE,
    )
    # Presto JSON type is rendered as string (SURVEY §1.3), so
    # json_parse/json_format are identities over valid JSON text.
    # (parse before format so json_format(json_parse(x)) unwraps
    # inside-out within one translate pass)
    translated = re.sub(
        rf"\bjson_parse\s*\(\s*({_arg})\s*\)", r"(\1)",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        rf"\bjson_format\s*\(\s*({_arg})\s*\)", r"(\1)",
        translated, flags=re.IGNORECASE,
    )
    # json_size(json, path): member count of the object/array at path,
    # 0 for a scalar, NULL for no match — composed from Spark's JSON
    # builtins over the same extracted fragment.
    translated = re.sub(
        rf"\bjson_size\s*\(\s*({_arg})\s*,\s*({_arg})\s*\)",
        r"(CASE WHEN get_json_object(\1, \2) IS NULL THEN NULL"
        r" ELSE coalesce(json_array_length(get_json_object(\1, \2)),"
        r" size(json_object_keys(get_json_object(\1, \2))), 0) END)",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        rf"\bis_json_scalar\s*\(\s*({_arg})\s*\)",
        r"(json_array_length(\1) IS NULL AND json_object_keys(\1) IS NULL"
        r" AND get_json_object(\1, '$') IS NOT NULL)",
        translated, flags=re.IGNORECASE,
    )
    # json_array_contains(json, value): scalars compare through their
    # canonical string forms (JSON numbers/booleans parse to the same
    # text that CAST produces).
    translated = re.sub(
        rf"\bjson_array_contains\s*\(\s*({_arg})\s*,\s*({_arg})\s*\)",
        r"array_contains(from_json(\1, 'array<string>'), CAST(\2 AS STRING))",
        translated, flags=re.IGNORECASE,
    )
    # Presto regexp_extract[_all] default to group 0 (the whole match);
    # Spark defaults to group 1 and errors when the pattern has no
    # group — make the Presto default explicit. The 3-arg forms match
    # Spark exactly and pass through (the second arg pattern excludes
    # top-level commas, so they can't match here).
    translated = re.sub(
        rf"\bregexp_extract(_all)?\s*\(\s*({_arg})\s*,\s*({_arg})\s*\)",
        r"regexp_extract\1(\2, \3, 0)",
        translated, flags=re.IGNORECASE,
    )
    # Presto URL functions -> Spark parse_url parts.
    for presto_fn, part in (
        ("url_extract_protocol", "PROTOCOL"),
        ("url_extract_host", "HOST"),
        ("url_extract_path", "PATH"),
        ("url_extract_query", "QUERY"),
        ("url_extract_fragment", "REF"),
    ):
        translated = re.sub(
            rf"\b{presto_fn}\s*\(\s*({_arg})\s*\)",
            rf"parse_url(\1, '{part}')",
            translated, flags=re.IGNORECASE,
        )
    translated = re.sub(
        rf"\burl_extract_parameter\s*\(\s*({_arg})\s*,\s*({_arg})\s*\)",
        r"parse_url(\1, 'QUERY', \2)",
        translated, flags=re.IGNORECASE,
    )
    # port is absent from parse_url's part list: take it off AUTHORITY;
    # NULL (not error) when the URL carries no explicit port.
    translated = re.sub(
        rf"\burl_extract_port\s*\(\s*({_arg})\s*\)",
        r"CAST(nullif(regexp_extract(parse_url(\1, 'AUTHORITY'),"
        r" ':([0-9]+)$', 1), '') AS BIGINT)",
        translated, flags=re.IGNORECASE,
    )
    # 0.248's 3-arg bit shifts carry an explicit width; the 64-bit form
    # is Spark's long shift (narrower widths error loudly, like
    # bit_count above).
    translated = re.sub(
        r"\bbitwise_shift_left\s*\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*,\s*64\s*\)",
        r"shiftleft(\1, \2)", translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        r"\bbitwise_logical_shift_right\s*\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*,\s*64\s*\)",
        r"shiftrightunsigned(\1, \2)", translated, flags=re.IGNORECASE,
    )
    # Presto strrpos(s, sub): 1-based position of the LAST occurrence
    # (0 if absent) — expressed via reversed instr so it stays inside
    # whole-stage codegen. Simple arguments only (they are repeated).
    translated = re.sub(
        r"\bstrrpos\s*\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*\)",
        r"(CASE WHEN instr(reverse(\1), reverse(\2)) = 0 THEN 0"
        r" ELSE length(\1) - length(\2) - instr(reverse(\1), reverse(\2)) + 2 END)",
        translated, flags=re.IGNORECASE,
    )
    # TRY(CAST(expr AS type)) -> try_cast(expr AS type); literal cast
    # arguments are placeholder atoms here, matched by [^()].
    # Other TRY() uses pass through and error loudly rather than
    # silently changing semantics.
    translated = re.sub(
        r"\bTRY\s*\(\s*CAST\s*\(([^()]*?)\s+AS\s+(\w+(?:\(\d+(?:,\s*\d+)?\))?)\s*\)\s*\)",
        r"try_cast(\1 AS \2)",
        translated,
        flags=re.IGNORECASE,
    )
    # TRY over single binary arithmetic / subscript — Spark's try_*
    # builtins give the exact NULL-on-error semantics when the operands
    # are atoms (identifiers / literals), which is the overwhelmingly
    # common Presto idiom (TRY(a / b), TRY(arr[i])). Composite operands
    # keep passing through to the loud-error fallback below: a try_*
    # rewrite there would catch only the OUTERMOST operation while
    # Presto's TRY guards the whole tree.
    _atom = r"[\w.\x00]+"
    for op, fn in (("/", "try_divide"), ("\\+", "try_add"), ("-", "try_subtract"), ("\\*", "try_multiply")):
        translated = re.sub(
            rf"\bTRY\s*\(\s*({_atom})\s*{op}\s*({_atom})\s*\)",
            rf"{fn}(\1, \2)",
            translated,
            flags=re.IGNORECASE,
        )
    # subscripts were rewritten to element_at upstream; TRY around one
    # is Spark's try_element_at (NULL instead of ANSI out-of-range error)
    translated = re.sub(
        r"\bTRY\s*\(\s*element_at\s*\(((?:[^()]|\([^()]*\))*)\)\s*\)",
        r"try_element_at(\1)",
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
        r"\bsplit\s*\(\s*([^,()]+(?:\([^()]*\)[^,()]*)*?)\s*,\s*(\x00\d+\x00)\s*([,)])",
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
    def _unit_rewrite(spark_fn: str):
        # the unit is a shielded literal: match its placeholder, look
        # the literal up, and only rewrite single-word units
        def repl(m: re.Match) -> str:
            lit = _lits[int(m.group(1))]
            if re.fullmatch(r"'\w+'", lit):
                return f"{spark_fn}({lit[1:-1].upper()},"
            return m.group(0)

        return repl

    translated = re.sub(
        r"\bdate_add\s*\(\s*\x00(\d+)\x00\s*,",
        _unit_rewrite("timestampadd"),
        translated,
        flags=re.IGNORECASE,
    )
    translated = re.sub(
        r"\bdate_diff\s*\(\s*\x00(\d+)\x00\s*,",
        _unit_rewrite("timestampdiff"),
        translated,
        flags=re.IGNORECASE,
    )
    # Presto `expr AT TIME ZONE 'tz'` -> from_utc_timestamp: correct
    # when the session zone is UTC (the engine pins it), where both
    # produce the wall-clock of the same instant in the target zone.
    # (simple column references only; a parenthesized expression would
    # need balanced-paren tracking and passes through untranslated)
    translated = re.sub(
        r"\b(\w+(?:\.\w+)*)\s+AT\s+TIME\s+ZONE\s+(\x00\d+\x00)",
        r"from_utc_timestamp(\1, \2)",
        translated,
        flags=re.IGNORECASE,
    )
    # Presto UNNEST-as-join -> Spark LATERAL VIEW. The TWO-array zip
    # form first (more specific; the single-column pattern would
    # otherwise swallow the comma): UNNEST(a, b) AS t(c1, c2) zips
    # positionally, padding the shorter array with NULLs — exactly
    # arrays_zip + inline.
    # three-array zip first (most specific)
    translated = re.sub(
        r"\bCROSS\s+JOIN\s+UNNEST\s*\(\s*([^,()]+(?:\([^()]*\)[^,()]*)*)\s*,\s*([^,()]+(?:\([^()]*\)[^,()]*)*)\s*,\s*([^,()]+(?:\([^()]*\)[^,()]*)*)\s*\)\s+AS\s+(\w+)\s*\(\s*(\w+)\s*,\s*(\w+)\s*,\s*(\w+)\s*\)",
        r"LATERAL VIEW inline(arrays_zip(\1, \2, \3)) \4 AS \5, \6, \7",
        translated,
        flags=re.IGNORECASE,
    )
    translated = re.sub(
        r"\bCROSS\s+JOIN\s+UNNEST\s*\(\s*([^,()]+(?:\([^()]*\)[^,()]*)*)\s*,\s*([^,()]+(?:\([^()]*\)[^,()]*)*)\s*\)\s+AS\s+(\w+)\s*\(\s*(\w+)\s*,\s*(\w+)\s*\)",
        r"LATERAL VIEW inline(arrays_zip(\1, \2)) \3 AS \4, \5",
        translated,
        flags=re.IGNORECASE,
    )
    # Map form: UNNEST(m) AS t(k, v) — ONE top-level argument (no
    # top-level comma, so the two-array zip above can never have
    # matched) with TWO column aliases. Presto iterates map entries;
    # Spark's explode on a map yields exactly (key, value) rows.
    translated = re.sub(
        r"\bCROSS\s+JOIN\s+UNNEST\s*\(\s*((?:[^,()]|\([^()]*\))+)\s*\)\s+AS\s+(\w+)\s*\(\s*(\w+)\s*,\s*(\w+)\s*\)",
        r"LATERAL VIEW explode(\1) \2 AS \3, \4",
        translated,
        flags=re.IGNORECASE,
    )
    # Single-column forms:
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
    # ---- Presto aggregate tail without Spark builtins (r5 SQL-surface
    # audit). Each is an exact composition of Spark aggregates; all run
    # over shielded text like every rewrite above. ----
    # none_match = NOT exists (the all/any twins are plain renames).
    translated = re.sub(
        rf"\bnone_match\s*\(\s*({_arg})\s*,\s*({_arg})\s*\)",
        r"(NOT exists(\1, \2))",
        translated, flags=re.IGNORECASE,
    )
    # ---- map/array utility wrappers FIRST (outermost-first ordering):
    # their arguments are often the aggregate compositions below, and
    # once those expand the nesting exceeds the conservative _arg
    # budget. One wrapper level over an un-expanded aggregate is the
    # supported composition depth; deeper stacks error loudly. ----
    translated = re.sub(
        rf"\bmap_subset\s*\(\s*({_arg})\s*,\s*({_arg})\s*\)",
        r"map_filter((\1), (msub_k, msub_v) -> array_contains((\2), msub_k))",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        rf"\bmap_normalize\s*\(\s*({_arg})\s*\)",
        r"transform_values((\1), (mn_k, mn_v) -> mn_v /"
        r" aggregate(map_values(\1), CAST(0 AS DOUBLE), (mn_s, mn_x) -> mn_s + mn_x))",
        translated, flags=re.IGNORECASE,
    )
    _MTN_CMP = (
        "(mtn_a, mtn_b) -> CASE WHEN mtn_a.value > mtn_b.value THEN -1"
        " WHEN mtn_a.value < mtn_b.value THEN 1"
        " WHEN mtn_a.key > mtn_b.key THEN -1"
        " WHEN mtn_a.key < mtn_b.key THEN 1 ELSE 0 END"
    )
    translated = re.sub(
        rf"\bmap_top_n\s*\(\s*({_arg})\s*,\s*({_arg})\s*\)",
        rf"map_from_entries(slice(array_sort(map_entries(\1), {_MTN_CMP}), 1, \2))",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        rf"\bmap_top_n_keys\s*\(\s*({_arg})\s*,\s*({_arg})\s*\)",
        rf"transform(slice(array_sort(map_entries(\1), {_MTN_CMP}), 1, \2),"
        r" mtn_e -> mtn_e.key)",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        rf"\bmap_top_n_values\s*\(\s*({_arg})\s*,\s*({_arg})\s*\)",
        r"slice(array_sort(map_values(\1),"
        r" (mtv_a, mtv_b) -> CASE WHEN mtv_a > mtv_b THEN -1"
        r" WHEN mtv_a < mtv_b THEN 1 ELSE 0 END), 1, \2)",
        translated, flags=re.IGNORECASE,
    )
    # array_max_by / array_min_by(a, f): decorate-sort-undecorate —
    # keys from the user lambda, one element out.
    # NULL lambda keys filtered out before the sort (same rationale as
    # the n-arg max_by above); try_element_at: all-NULL keys -> NULL.
    for fn, lt, gt in (("array_max_by", "-1", "1"), ("array_min_by", "1", "-1")):
        translated = re.sub(
            rf"\b{fn}\s*\(\s*({_arg})\s*,\s*({_arg})\s*\)",
            r"try_element_at(transform(array_sort(filter("
            r"zip_with(transform((\1), \2), (\1),"
            r" (amb_k, amb_v) -> struct(amb_k AS k, amb_v AS v)),"
            r" amb_s -> amb_s.k IS NOT NULL),"
            rf" (amb_a, amb_b) -> CASE WHEN amb_a.k > amb_b.k THEN {lt}"
            rf" WHEN amb_a.k < amb_b.k THEN {gt} ELSE 0 END),"
            r" amb_s -> amb_s.v), 1)",
            translated, flags=re.IGNORECASE,
        )
    # array_duplicates / array_has_duplicates (elements-kind-agnostic,
    # so rewrites rather than typed macros; NULL-safe equality).
    translated = re.sub(
        rf"\barray_duplicates\s*\(\s*({_arg})\s*\)",
        r"array_distinct(filter((\1), adup_x ->"
        r" size(filter((\1), adup_y -> adup_y <=> adup_x)) > 1))",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        rf"\barray_has_duplicates\s*\(\s*({_arg})\s*\)",
        r"(size(\1) <> size(array_distinct(\1)))",
        translated, flags=re.IGNORECASE,
    )
    # combinations(a, n) for the literal n = 1 / 2 forms (Presto caps n
    # at 5; larger literal ns pass through and error loudly).
    translated = re.sub(
        rf"\bcombinations\s*\(\s*({_arg})\s*,\s*1\s*\)",
        r"transform((\1), cmb_x -> array(cmb_x))",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        rf"\bcombinations\s*\(\s*({_arg})\s*,\s*2\s*\)",
        r"IF(size(\1) < 2, slice(transform((\1), cmb_e -> array(cmb_e)), 1, 0),"
        r" flatten(transform(sequence(1, size(\1)),"
        r" cmb_i -> filter(transform(sequence(1, size(\1)),"
        r" cmb_j -> IF(cmb_j > cmb_i,"
        r" array(element_at((\1), cmb_i), element_at((\1), cmb_j)),"
        r" NULL)), cmb_p -> cmb_p IS NOT NULL))))",
        translated, flags=re.IGNORECASE,
    )
    # trim_array(a, n): drop n trailing elements.
    translated = re.sub(
        rf"\btrim_array\s*\(\s*({_arg})\s*,\s*({_arg})\s*\)",
        r"slice((\1), 1, greatest(size(\1) - (\2), 0))",
        translated, flags=re.IGNORECASE,
    )
    # entropy(c): log-2 entropy of a count column, decomposed into
    # single-pass distributive aggregates: H = log2(S) - Σ c·log2(c)/S.
    translated = re.sub(
        rf"\bentropy\s*\(\s*({_arg})\s*\)",
        r"(CASE WHEN sum(\1) > 0 THEN log2(sum(\1))"
        r" - sum(CASE WHEN (\1) > 0 THEN (\1) * log2(\1)"
        r" ELSE CAST(0 AS DOUBLE) END) / sum(\1)"
        r" ELSE CAST(0 AS DOUBLE) END)",
        translated, flags=re.IGNORECASE,
    )
    # geometric_mean: Spark's ln(0)/ln(neg) return NULL (not -Inf/NaN)
    # and avg skips NULLs, so a bare exp(avg(ln(x))) would silently
    # drop the zero/negative inputs that Presto defines as 0 / NaN.
    translated = re.sub(
        rf"\bgeometric_mean\s*\(\s*({_arg})\s*\)",
        r"(CASE WHEN min(\1) < 0 THEN CAST('NaN' AS DOUBLE)"
        r" WHEN min(\1) = 0 THEN CAST(0 AS DOUBLE)"
        r" ELSE exp(avg(ln(\1))) END)",
        translated, flags=re.IGNORECASE,
    )
    # checksum(x): order-insensitive digest as bit_xor of xxhash64 (the
    # engine's production digest — operators/sketch_ops.py checksum_agg;
    # BIGINT rendering of Presto's varbinary).
    translated = re.sub(
        rf"\bchecksum\s*\(\s*({_arg})\s*\)",
        r"bit_xor(xxhash64(\1))",
        translated, flags=re.IGNORECASE,
    )
    # map_agg(k, v): entries collected then assembled. NULL keys are
    # skipped like Presto's MapAggregation (the CASE yields NULL and
    # collect_list drops it — Spark's map_from_entries would otherwise
    # throw on a NULL key). Duplicate keys resolve to the FIRST
    # occurrence's value: Presto's map_agg accepts duplicates and
    # picks one value arbitrarily, so assembling via map_from_entries
    # under Spark's default mapKeyDedupPolicy=EXCEPTION would throw
    # where Presto succeeds — this rendering is Presto's tolerant
    # behavior made deterministic (same pick rule as map_union below).
    # A group whose keys are ALL NULL yields NULL (Presto never
    # initializes the aggregation state from skipped keys), not {} —
    # hence the size()=0 -> NULL wrap (Catalyst computes the shared
    # collect_list once).
    _MA_ENTRY = r"CASE WHEN (\1) IS NOT NULL THEN struct((\1) AS k, (\2) AS v) END"
    _MA_LIST = rf"collect_list({_MA_ENTRY})"
    translated = re.sub(
        rf"\bmap_agg\s*\(\s*({_arg})\s*,\s*({_arg})\s*\)",
        rf"map_from_arrays("
        rf"IF(size({_MA_LIST}) = 0, NULL,"
        rf" array_distinct(transform({_MA_LIST}, ma_e -> ma_e.k))),"
        rf" transform(array_distinct(transform({_MA_LIST}, ma_e -> ma_e.k)),"
        rf" ma_k -> element_at(filter({_MA_LIST},"
        r" ma_e -> ma_e.k <=> ma_k), 1).v))",
        translated, flags=re.IGNORECASE,
    )
    # multimap_agg(k, v) -> map<k, array<v>> keeping duplicates,
    # first-occurrence key order, NULL keys skipped (same construction
    # as the multimap_from_entries shim; Catalyst computes the shared
    # collect_list aggregate once).
    translated = re.sub(
        rf"\bmultimap_agg\s*\(\s*({_arg})\s*,\s*({_arg})\s*\)",
        rf"map_from_arrays("
        rf"IF(size({_MA_LIST}) = 0, NULL,"
        rf" array_distinct(transform({_MA_LIST}, mma_e -> mma_e.k))),"
        rf" transform(array_distinct(transform({_MA_LIST},"
        r" mma_e -> mma_e.k)),"
        rf" mma_k -> transform(filter({_MA_LIST},"
        r" mma_e -> mma_e.k <=> mma_k), mma_e -> mma_e.v)))",
        translated, flags=re.IGNORECASE,
    )
    # map_union(m): union of all input maps; duplicate keys resolve to
    # the first occurrence (Presto documents the pick as arbitrary —
    # this rendering is deterministic).
    translated = re.sub(
        rf"\bmap_union\s*\(\s*({_arg})\s*\)",
        r"map_from_arrays("
        r"array_distinct(transform(flatten(collect_list(map_entries(\1))),"
        r" mu_e -> mu_e.key)),"
        r" transform(array_distinct(transform(flatten(collect_list(map_entries(\1))),"
        r" mu_e -> mu_e.key)),"
        r" mu_k -> element_at(filter(flatten(collect_list(map_entries(\1))),"
        r" mu_e -> mu_e.key <=> mu_k), 1).value))",
        translated, flags=re.IGNORECASE,
    )
    # histogram(x) -> map<value, count>. Distinct-values × group-rows
    # scan over the collected group (exact; fine at per-group
    # cardinalities — at 100 TB scale prefer GROUP BY x, the relational
    # form the suite's agg_most_frequent uses).
    _HIST = (
        r"map_from_entries(transform(array_distinct(collect_list({x})),"
        r" hst_v -> struct(hst_v, CAST(size(filter(collect_list({x}),"
        r" hst_e -> hst_e <=> hst_v)) AS BIGINT))))"
    )
    translated = re.sub(
        rf"\bapprox_most_frequent\s*\(\s*({_arg})\s*,\s*({_arg})\s*,\s*({_arg})\s*\)",
        lambda m: (
            "map_from_entries(slice(array_sort("
            + _HIST.format(x=f"({m.group(2)})").replace("map_from_entries(", "", 1)[:-1]
            + ", (amf_a, amf_b) -> CASE WHEN amf_a.col2 > amf_b.col2 THEN -1"
            " WHEN amf_a.col2 < amf_b.col2 THEN 1 ELSE 0 END), 1, "
            + m.group(1) + "))"
        ),
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        rf"\bhistogram\s*\(\s*({_arg})\s*\)",
        lambda m: _HIST.format(x=f"({m.group(1)})"),
        translated, flags=re.IGNORECASE,
    )
    # numeric_histogram(b, x) -> map<bucket midpoint, count>: the
    # deterministic equal-width rendering (Presto's own is an
    # approximate v-optimal sketch; same stance as agg_extra.py).
    translated = re.sub(
        rf"\bnumeric_histogram\s*\(\s*({_arg})\s*,\s*({_arg})\s*\)",
        r"map_from_entries(filter(transform(sequence(1, CAST(\1 AS INT)),"
        r" nh_b -> struct("
        r"min(\2) + (CAST(nh_b AS DOUBLE) - 0.5) * (max(\2) - min(\2)) / (\1),"
        r" CAST(size(filter(collect_list(\2), nh_v ->"
        # constant groups take the max=min branch EXCLUSIVELY: the
        # least() path would read least(NULL, b-1) = b-1 (least skips
        # NULLs) and double-count every value into bucket b, making
        # map_from_entries throw DUPLICATED_MAP_KEY
        r" IF(max(\2) = min(\2), nh_b <=> 1,"
        r" CAST(least(floor((nh_v - min(\2)) * (\1) /"
        r" nullif(max(\2) - min(\2), CAST(0 AS DOUBLE))), (\1) - 1) AS INT)"
        r" <=> nh_b - 1))) AS BIGINT))),"
        r" nh_e -> nh_e.col2 > 0))",
        translated, flags=re.IGNORECASE,
    )
    # reduce_agg(x, init, inputFn, combineFn): sequential fold over the
    # collected group — aggregate() with the input lambda IS that fold
    # (the combine lambda merges identical partial states, so the
    # sequential result is the same relation for the lawful
    # commutative/associative lambdas Presto requires).
    translated = re.sub(
        rf"\breduce_agg\s*\(\s*({_arg})\s*,\s*({_arg})\s*,\s*({_arg})\s*,\s*({_arg})\s*\)",
        r"aggregate(collect_list(\1), \2, \3)",
        translated, flags=re.IGNORECASE,
    )
    # max_by(x, y, n) / min_by(x, y, n): top-n x by y, ordered like
    # Presto (value-descending for max_by, ascending for min_by).
    # NULL ordering keys are dropped BEFORE the sort (collect_list
    # skips the NULL the CASE yields), matching Presto — a NULL key
    # inside the comparator would compare as a tie and could displace
    # real winners.
    translated = re.sub(
        rf"\bmax_by\s*\(\s*({_arg})\s*,\s*({_arg})\s*,\s*({_arg})\s*\)",
        r"transform(slice(array_sort(collect_list("
        r"CASE WHEN (\2) IS NOT NULL THEN struct((\2) AS v, (\1) AS k) END),"
        r" (mb_a, mb_b) -> CASE WHEN mb_a.v > mb_b.v THEN -1"
        r" WHEN mb_a.v < mb_b.v THEN 1 ELSE 0 END), 1, \3), mb_s -> mb_s.k)",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        rf"\bmin_by\s*\(\s*({_arg})\s*,\s*({_arg})\s*,\s*({_arg})\s*\)",
        r"transform(slice(array_sort(collect_list("
        r"CASE WHEN (\2) IS NOT NULL THEN struct((\2) AS v, (\1) AS k) END),"
        r" (mb_a, mb_b) -> CASE WHEN mb_a.v < mb_b.v THEN -1"
        r" WHEN mb_a.v > mb_b.v THEN 1 ELSE 0 END), 1, \3), mb_s -> mb_s.k)",
        translated, flags=re.IGNORECASE,
    )
    # cardinality(approx_set|merge(...)) composition: the read stage of
    # the HLL pipeline (renames already turned the names into size /
    # hll_sketch_agg / hll_union_agg). 0 on NULL/empty, like Presto.
    translated = re.sub(
        r"\bsize\s*\(\s*((?:hll_sketch_agg|hll_union_agg)\s*\((?:[^()]|\([^()]*\))*\))\s*\)",
        r"coalesce(hll_sketch_estimate(\1), 0)",
        translated, flags=re.IGNORECASE,
    )
    # empty_approx_set(): the NULL sketch — hll_union_agg skips NULLs
    # and the estimate composition above coalesces to 0. The direct
    # cardinality read of an empty sketch is the constant 0.
    translated = re.sub(
        r"\bsize\s*\(\s*empty_approx_set\s*\(\s*\)\s*\)", "CAST(0 AS BIGINT)",
        translated, flags=re.IGNORECASE,
    )
    translated = re.sub(
        r"\bempty_approx_set\s*\(\s*\)", "CAST(NULL AS BINARY)",
        translated, flags=re.IGNORECASE,
    )
    # width_bucket(x, bins): the array-bins overload (the 4-arg
    # equi-width form is a native Spark builtin). Presto: bins sorted
    # ascending, result = number of bin edges <= x (0 when x < bins[1]).
    translated = re.sub(
        rf"\bwidth_bucket\s*\(\s*({_arg})\s*,\s*((?:array|\w*)\s*\((?:[^()]|\([^()]*\))*\)|[\w.]+)\s*\)",
        r"CAST(size(filter((\2), wb_b -> wb_b <= (\1))) AS BIGINT)",
        translated, flags=re.IGNORECASE,
    )
    # CAST(expr AS ROW(a T, b T)) -> Spark STRUCT<a: T, b: T>. The
    # generic ROW( -> struct( rename has already run, so match both
    # spellings.
    def _row_cast(m: re.Match) -> str:
        fields = []
        for f in m.group(1).split(","):
            name, _, typ = f.strip().partition(" ")
            typ = typ.strip()
            # length-less varchar / json have no Spark spelling (same
            # mapping as the scalar CAST rewrites above)
            if typ.lower() in ("varchar", "json"):
                typ = "string"
            fields.append(f"{name}: {typ}" if typ else name)
        return "AS STRUCT<" + ", ".join(fields) + ">)"

    translated = re.sub(
        r"\bAS\s+(?:ROW|struct)\s*\(([^()]*)\)\s*\)", _row_cast,
        translated, flags=re.IGNORECASE,
    )
    # timezone_hour/minute are TIMESTAMP-typed SQL macros (registry):
    # plain timestamps live in the pinned UTC session zone (offset 0);
    # a TZ-struct argument fails the signature loudly instead of
    # silently reading 0 (tztype.timezone_hour computes real offsets).
    return _restore_literals(translated, _lits)
