from presto_on_ray_spark.streaming.ann import stream_ann_ingest
from presto_on_ray_spark.streaming.ingest import (
    prune_admit_log,
    stream_ingest_admit,
    stream_ingest_dedup,
)
from presto_on_ray_spark.streaming.windows import (
    sessionize_events,
    tumbling_window_counts,
    tumbling_window_counts_batch,
)

__all__ = [
    "tumbling_window_counts",
    "tumbling_window_counts_batch",
    "sessionize_events",
    "stream_ingest_dedup",
    "stream_ingest_admit",
    "stream_ann_ingest",
    "prune_admit_log",
]
