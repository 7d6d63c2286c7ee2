"""Control-plane surface (SURVEY §2.0) — the verbs the reference's own
777 lines actually implement, mapped onto the Spark platform.

| reference verb (file:line)                    | here |
|-----------------------------------------------|------|
| start (presto-mgr.py:171-175, launcher fork)  | SparkSession exists; nothing to fork |
| add_worker / del_worker (presto-mgr.py:135-145)| request_workers / remove_workers (dynamic allocation / explicit) |
| status (presto-mgr.py:159-160)                | status() — executors, parallelism, app id |
| coordinator (presto-mgr.py:156-157)           | coordinator() — master URL / web UI |
| connect (presto-mgr.py:268-273)               | Engine.sql / spark-sql shell / Thrift server |
| stop (presto-mgr.py:188-202)                  | stop() |

On local[N] the worker verbs are no-ops by design (a single JVM has a
fixed thread pool); on a standalone/k8s/YARN cluster they call
requestExecutors/killExecutors. The reference's per-query memory caps
(presto-mgr.py:18-22) have no OSS-Spark equivalent — documented gap
(SCALING.md), not emulated.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class ClusterControl:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.sc = spark.sparkContext

    def status(self) -> dict:
        """Cluster shape — the reference's `status` verb."""
        jsc = self.sc._jsc.sc()
        executors = jsc.statusTracker().getExecutorInfos()
        return {
            "app_id": self.sc.applicationId,
            "master": self.sc.master,
            "n_executors": len(executors),
            "default_parallelism": self.sc.defaultParallelism,
            "ui": self.sc.uiWebUrl,
        }

    def coordinator(self) -> str:
        """The reference's `coordinator` verb: where to connect."""
        return self.sc.master

    def request_workers(self, n: int) -> bool:
        """`add_worker` equivalent. No-op (False) on local masters."""
        if self.sc.master.startswith("local"):
            return False
        return self.sc._jsc.sc().requestExecutors(n)

    def remove_workers(self, executor_ids: list[str]) -> bool:
        """`del_worker` equivalent. No-op (False) on local masters."""
        if self.sc.master.startswith("local"):
            return False
        # killExecutors takes a Scala Seq[String], not a java.util.List
        jseq = self.sc._jvm.PythonUtils.toSeq(executor_ids)
        return self.sc._jsc.sc().killExecutors(jseq)

    def stop(self) -> None:
        """The reference's `stop` verb (modulo its self._prof typo bug,
        presto-mgr.py:127, which meant the coordinator JVM never
        actually died — not replicated)."""
        self.spark.stop()
