from distributed_graph_analytics_spark.operators.wcc import (  # noqa: F401
    weakly_connected_components,
)
from distributed_graph_analytics_spark.operators.pagerank import pagerank  # noqa: F401
from distributed_graph_analytics_spark.operators.leaf_compression import (  # noqa: F401
    leaf_compression,
    leaf_compression_giraph,
)
from distributed_graph_analytics_spark.operators.triangle import (  # noqa: F401
    triangle_count,
    triangle_count_per_vertex,
)
from distributed_graph_analytics_spark.operators.lpa import label_propagation  # noqa: F401
from distributed_graph_analytics_spark.operators.louvain import (  # noqa: F401
    louvain,
    louvain_level,
)
from distributed_graph_analytics_spark.operators.hbse import (  # noqa: F401
    hbse,
    save_hbse_run,
)
from distributed_graph_analytics_spark.operators.neighboring_communities import (  # noqa: F401
    neighboring_communities,
)
