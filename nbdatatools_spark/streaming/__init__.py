from nbdatatools_spark.streaming.events import (  # noqa: F401
    tumbling_window_agg,
    sliding_window_agg,
    sessionize,
    stream_events,
)
