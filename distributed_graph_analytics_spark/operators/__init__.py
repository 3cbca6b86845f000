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
from distributed_graph_analytics_spark.operators.kcore import core_numbers  # noqa: F401
from distributed_graph_analytics_spark.operators.pagerank import (  # noqa: F401
    pagerank_delta_push,
    personalized_pagerank,
)
from distributed_graph_analytics_spark.operators.sssp import sssp  # noqa: F401
from distributed_graph_analytics_spark.operators.walks import random_walks  # noqa: F401
from distributed_graph_analytics_spark.operators.link_prediction import (  # noqa: F401
    common_neighbor_scores,
)
from distributed_graph_analytics_spark.operators.stats import graph_summary  # noqa: F401
from distributed_graph_analytics_spark.operators.temporal import (  # noqa: F401
    asof_join,
    interval_join,
)
from distributed_graph_analytics_spark.operators.triangle import (  # noqa: F401
    clustering_coefficient,
)
from distributed_graph_analytics_spark.operators.walks import node2vec_walks  # noqa: F401
from distributed_graph_analytics_spark.operators.closeness import (  # noqa: F401
    closeness_centrality,
)
from distributed_graph_analytics_spark.operators.hits import (  # noqa: F401
    hits,
    weighted_pagerank,
)
from distributed_graph_analytics_spark.operators.stats import (  # noqa: F401
    degree_assortativity,
)
from distributed_graph_analytics_spark.operators.truss import k_truss  # noqa: F401
from distributed_graph_analytics_spark.operators.sampling import (  # noqa: F401
    negative_edge_sample,
    neighbor_sample,
)
from distributed_graph_analytics_spark.operators.star_components import (  # noqa: F401
    star_components,
)
