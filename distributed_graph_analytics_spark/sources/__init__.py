from distributed_graph_analytics_spark.sources.edges import (  # noqa: F401
    canonicalize_edges,
    decode_delimiter,
    dense_string_ids,
    encode_string_edge_list,
    merge_parallel_edges,
    read_edge_list,
    reverse_duplicate,
    undirected_view,
    vertices_of,
)
from distributed_graph_analytics_spark.sources.repo_table import (  # noqa: F401
    edges_from_repo_table,
    ingest_repo_table,
    synthesize_repo_table,
)
