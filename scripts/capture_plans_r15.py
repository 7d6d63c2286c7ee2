"""Capture .explain('formatted') for headline queries into plans/r15/.

Usage: python scripts/capture_plans_r15.py <suffix> [key ...]
Writes plans/r15/<key>_<suffix>.txt for each requested key (default:
every bench HEADLINE key). Plan-build side effects (index builds,
training loops) run as they would in the bench; the captured artifact
is the final returned DataFrame's formatted physical plan.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from presto_on_ray_spark import suite  # noqa: E402
from presto_on_ray_spark.caching import release_cached  # noqa: E402
from presto_on_ray_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    keys = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    suite.load_all()
    spark = get_spark(app_name="plan-capture-r15")
    spark.sparkContext.setLogLevel("ERROR")
    from presto_on_ray_spark.functions.registry import register_presto_functions

    register_presto_functions(spark)
    for name in keys:
        fn = suite.QUERIES[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        stdout, sys.stdout = sys.stdout, buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(buf.getvalue())
        release_cached()
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
