from distributed_graph_analytics_spark.streaming.events import (  # noqa: F401
    streaming_edge_counts,
    streaming_event_rollup,
)
from distributed_graph_analytics_spark.streaming.sessions import (  # noqa: F401
    batch_sessionize,
    batch_sessionize_custom,
    streaming_sessionize,
    streaming_sessionize_custom,
)
