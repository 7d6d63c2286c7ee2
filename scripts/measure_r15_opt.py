"""Round-15 optimization instrument: per-key wall time + job/stage/task
counts from the status tracker, bench methodology (plan-build + count()).

Usage: python scripts/measure_r15_opt.py [key ...]   (default: HEADLINE)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
Prints one line per key: seconds, jobs, stages, tasks — the breakdown
that tells overhead-dominated keys (many tiny jobs) apart from
data-dominated ones (few jobs, many tasks).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from presto_on_ray_spark import suite  # noqa: E402
from presto_on_ray_spark.caching import release_cached  # noqa: E402
from presto_on_ray_spark.session import get_spark  # noqa: E402


def main() -> None:
    keys = sys.argv[1:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suite.load_all()
    spark = get_spark(app_name="measure-r15-opt")
    spark.sparkContext.setLogLevel("ERROR")
    from presto_on_ray_spark.functions.registry import register_presto_functions

    register_presto_functions(spark)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    sc = spark.sparkContext
    jsc = sc._jsc.sc().statusTracker()
    out = {}
    for name in keys:
        fn = suite.QUERIES[name]
        # job ids are monotonically increasing; snapshot the max
        all_before = jsc.getJobIdsForGroup(None)
        max_before = max(list(all_before), default=-1)
        sc.setJobDescription(f"r15opt:{name}")
        start = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        secs = time.perf_counter() - start
        sc.setJobDescription(None)
        release_cached()
        all_after = list(jsc.getJobIdsForGroup(None))
        new_jobs = [j for j in all_after if j > max_before]
        stages = 0
        tasks = 0
        for j in new_jobs:
            info = jsc.getJobInfo(j)
            if info.isEmpty():
                continue
            for sid in list(info.get().stageIds()):
                sinfo = jsc.getStageInfo(sid)
                if sinfo.isEmpty():
                    continue
                stages += 1
                tasks += sinfo.get().numTasks()
        out[name] = {
            "sec": round(secs, 3),
            "jobs": len(new_jobs),
            "stages": stages,
            "tasks": tasks,
            "rows": n,
        }
        print(
            f"{secs:8.3f}s  jobs={len(new_jobs):4d} stages={stages:5d} "
            f"tasks={tasks:6d} rows={n:8d}  {name}",
            file=sys.stderr,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
