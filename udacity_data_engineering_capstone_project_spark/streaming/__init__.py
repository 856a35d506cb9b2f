from udacity_data_engineering_capstone_project_spark.streaming.events import (
    read_events_stream,
    run_stream_to_memory,
    windowed_event_counts,
)

__all__ = ["read_events_stream", "run_stream_to_memory", "windowed_event_counts"]
