from rigatoni_spark.sources.change_events import (  # noqa: F401
    as_change_events,
    as_change_events_stateful,
    change_events_oracle_cte,
    read_change_events,
    read_change_events_stream,
)
