"""Broadcast-or-shuffle decision for iterative vertex-state joins.

State DataFrames inside a superstep loop are LogicalRDDs (from
localCheckpoint), for which Catalyst has no size statistics — it
assumes worst-case size and never auto-broadcasts, silently degrading
every superstep to a shuffle join even for a 20k-row state. The north
rule calls for "a broadcast-or-shuffle hash join of messages against a
partitioned vertex-state DataFrame": this helper makes that decision
explicitly, driver-side, from the known row count.

~32 bytes/row for (long, double|long) states → the default threshold
keeps broadcasts under roughly 64 MB, matching the session's
autoBroadcastJoinThreshold. Above it, the join stays a shuffled hash
join (preferSortMergeJoin=false in session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BROADCAST_ROW_THRESHOLD = 2_000_000


def maybe_broadcast(df: DataFrame, n_rows: int | None, threshold: int = BROADCAST_ROW_THRESHOLD) -> DataFrame:
    """Broadcast `df` when its known row count is under threshold."""
    if n_rows is not None and n_rows <= threshold:
        return F.broadcast(df)
    return df
