from distributed_graph_analytics_spark.streaming.events import (  # noqa: F401
    streaming_edge_counts,
    streaming_event_rollup,
)
