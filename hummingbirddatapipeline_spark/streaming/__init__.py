from hummingbirddatapipeline_spark.streaming.core import (  # noqa: F401
    dedup_events,
    foreach_batch_latest_upsert,
    hourly_tumbling,
    read_events_stream,
    run_available_now,
    sessionize,
    sessions_to_user_rollup,
    tumbling_to_batch,
)
