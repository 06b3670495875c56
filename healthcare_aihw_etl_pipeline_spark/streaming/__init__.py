from healthcare_aihw_etl_pipeline_spark.streaming.events import (
    EVENTS_RAW_SCHEMA,
    dedup_within_watermark,
    enrich_with_user_dim,
    hourly_event_counts,
    interval_join_clicks_to_purchases,
    read_event_stream,
    user_first_seen_dim,
    session_windows,
    sliding_event_counts,
    user_running_totals,
    write_stream_upsert_partitions,
)
from healthcare_aihw_etl_pipeline_spark.streaming.events import (
    daily_sweep_profile,
)
from healthcare_aihw_etl_pipeline_spark.streaming.fifo import (
    part_fifo_matching,
)
from healthcare_aihw_etl_pipeline_spark.streaming.drift import (
    monitor_drift,
    psi_of_counts,
    reference_counts,
    windowed_bucket_counts,
)

__all__ = [
    "EVENTS_RAW_SCHEMA",
    "dedup_within_watermark",
    "enrich_with_user_dim",
    "hourly_event_counts",
    "interval_join_clicks_to_purchases",
    "read_event_stream",
    "user_first_seen_dim",
    "session_windows",
    "sliding_event_counts",
    "user_running_totals",
    "write_stream_upsert_partitions",
    "daily_sweep_profile",
    "part_fifo_matching",
    "monitor_drift",
    "psi_of_counts",
    "reference_counts",
    "windowed_bucket_counts",
]
