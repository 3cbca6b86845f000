from distributed_graph_analytics_spark.operators.wcc import (  # noqa: F401
    weakly_connected_components,
)
from distributed_graph_analytics_spark.operators.pagerank import pagerank  # noqa: F401
from distributed_graph_analytics_spark.operators.leaf_compression import (  # noqa: F401
    leaf_compression,
)
from distributed_graph_analytics_spark.operators.triangle import (  # noqa: F401
    triangle_count,
    triangle_count_per_vertex,
)
from distributed_graph_analytics_spark.operators.lpa import label_propagation  # noqa: F401
