"""distributed_graph_analytics_spark — a PySpark-native link-graph analytics engine.

A from-scratch reimplementation of the analytic capabilities of
Sotera/distributed-graph-analytics (DGA) — PageRank, weakly connected
components, leaf compression, label propagation, Louvain modularity,
high-betweenness set extraction, neighboring communities, triangle
counting — expressed as iterative DataFrame joins and groupBy
aggregations over an ``edges(src, dst, weight)`` table. No GraphX, no
Giraph, no Pregel wrapper: every BSP superstep in the reference becomes
a (broadcast-or-shuffle) hash join of a messages DataFrame against a
partitioned vertex-state DataFrame, with driver-side scalars standing
in for Giraph aggregators.

Package layout
--------------
- ``sources``   : edge-list / repo-table ingest, id encoding, checkpoints
- ``operators`` : the graph analytics (one module per analytic)
- ``functions`` : columnar text / dedup / similarity / multimodal helpers
- ``plans``     : the iteration controller + checkpoint/lineage manager
- ``streaming`` : structured-streaming adapters (event-table demo)
"""

__version__ = "0.1.0"
