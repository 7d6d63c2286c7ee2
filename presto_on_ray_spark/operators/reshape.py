"""Reshape operators: PIVOT / UNPIVOT (SURVEY §2 extension).

Presto 0.248 (the engine the reference launches,
/root/reference/launcher.py:154-171) has no PIVOT; users emulate it
with conditional aggregation. Spark has both surfaces natively —
``groupBy().pivot(col, values)`` and ``DataFrame.unpivot`` — so the
engine exposes them, with conditional-aggregation oracles (the
portable SQL form, which is also what a Presto user would have
written).

Scale notes: ``pivot`` with an EXPLICIT value list is a single
hash-aggregate (no extra distinct-values job, no second shuffle);
``unpivot`` is a narrow projection (an ``expand`` node — no shuffle at
all).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_ORACLE = """
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
FROM events GROUP BY 1
"""


@query("pivot_event_counts", oracle=_PIVOT_ORACLE)
def pivot_event_counts(spark, sf_dir):
    """Events pivoted to one column per event_type. The value list is
    pinned (EVENT_TYPES) so Spark skips the distinct-values pre-job and
    the column order is deterministic; missing cells coalesce to 0 to
    match the conditional-aggregation oracle."""
    ev = t(spark, sf_dir, "events")
    p = ev.groupBy("user_id").pivot("event_type", EVENT_TYPES).agg(F.count(F.lit(1)))
    return p.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(f"n_{c}") for c in EVENT_TYPES],
    )


@query(
    "unpivot_long_form",
    oracle=f"""
    WITH p AS ({_PIVOT_ORACLE})
    SELECT user_id, 'n_click' AS event_type, n_click AS n FROM p
    UNION ALL SELECT user_id, 'n_error', n_error FROM p
    UNION ALL SELECT user_id, 'n_purchase', n_purchase FROM p
    UNION ALL SELECT user_id, 'n_signup', n_signup FROM p
    UNION ALL SELECT user_id, 'n_view', n_view FROM p
    """,
)
def unpivot_long_form(spark, sf_dir):
    """Round-trip: the pivoted wide table melted back to long form with
    ``DataFrame.unpivot`` (zero-count cells included — unpivot is not a
    filter)."""
    p = pivot_event_counts(spark, sf_dir)
    return p.unpivot(
        ["user_id"], [f"n_{c}" for c in EVENT_TYPES], "event_type", "n"
    )
