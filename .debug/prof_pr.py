import sys, os, time; sys.path.insert(0, '/root/repo')
from distributed_graph_analytics_spark.session import get_spark
from pyspark.sql import functions as F
from pyspark import StorageLevel
cpus = int(os.environ.get("CPUS", "32"))
spark = get_spark("prof-pr", master=f"local[{cpus}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, '/root/repo/tools')
from _scaling_worker import replicated_edges
edges = replicated_edges(spark, "/root/testdata/sf0.1", 32).persist(StorageLevel.MEMORY_AND_DISK)
print("edges", edges.count(), flush=True)
from distributed_graph_analytics_spark.sources.edges import vertices_of
n_part = cpus
out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
contrib_edges = edges.select("src","dst").join(out_deg, "src").select(
    "src","dst",(F.lit(1.0)/F.col("out_deg")).alias("inv_deg"))
vertices = vertices_of(edges).persist(StorageLevel.MEMORY_AND_DISK)
n = vertices.count()
contrib_edges = contrib_edges.repartition(n_part, "src").persist(StorageLevel.MEMORY_AND_DISK)
print("contrib", contrib_edges.count(), "vertices", n, flush=True)
teleport = 0.15 / n
state = vertices.select("id", F.lit(1.0/n).alias("rank")).localCheckpoint(eager=True)
for i in range(4):
    t0 = time.time()
    contribs = (contrib_edges.join(state, contrib_edges["src"]==state["id"])
        .select(F.col("dst").alias("id"), (F.col("rank")*F.col("inv_deg")).alias("c"))
        .groupBy("id").agg(F.sum("c").alias("msg_sum")))
    new_state = (state.withColumnRenamed("rank","old_rank")
        .join(contribs, "id", "left_outer")
        .select("id", (F.lit(teleport)+F.lit(0.85)*F.coalesce("msg_sum",F.lit(0.0))).alias("rank"), "old_rank"))
    t1 = time.time()
    cached = new_state.persist(StorageLevel.MEMORY_AND_DISK)
    md = cached.agg(F.max(F.abs(F.col("rank")-F.col("old_rank"))/F.col("old_rank"))).first()[0]
    t2 = time.time()
    out = cached.select("id","rank").localCheckpoint(eager=True)
    t3 = time.time()
    cached.unpersist()
    state = out
    print(f"iter {i}: build={t1-t0:.2f} agg_job={t2-t1:.2f} ckpt_job={t3-t2:.2f}", flush=True)
# one more: explain the contribs plan exchanges
contribs = (contrib_edges.join(state, contrib_edges["src"]==state["id"])
    .select(F.col("dst").alias("id"), (F.col("rank")*F.col("inv_deg")).alias("c"))
    .groupBy("id").agg(F.sum("c").alias("msg_sum")))
plan = contribs._jdf.queryExecution().executedPlan().toString()
print([l.strip()[:90] for l in plan.split("\n") if "Exchange" in l or "Join" in l or "HashAggregate" in l], flush=True)
spark.stop()
