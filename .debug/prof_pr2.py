import sys, os, time; sys.path.insert(0, '/root/repo')
from distributed_graph_analytics_spark.session import get_spark
from pyspark import StorageLevel
cpus = int(os.environ.get("CPUS", "32"))
spark = get_spark("prof-pr2", master=f"local[{cpus}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, '/root/repo/tools')
from _scaling_worker import replicated_edges
from distributed_graph_analytics_spark.operators.pagerank import pagerank
edges = replicated_edges(spark, "/root/testdata/sf0.1", 32).persist(StorageLevel.MEMORY_AND_DISK)
print("edges", edges.count(), flush=True)
t0=time.time()
ranks, stats = pagerank(edges)
ranks.count()
print("PR total", round(time.time()-t0,1), "iters", stats.iterations, flush=True)
print("history:", [h["sec"] for h in stats.history], flush=True)
spark.stop()
