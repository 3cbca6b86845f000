from distributed_graph_analytics_spark.plans.iteration import (  # noqa: F401
    IterationController,
    IterationStats,
)
from distributed_graph_analytics_spark.plans.checkpoint import (  # noqa: F401
    CheckpointManager,
)
