"""Broadcast-or-shuffle decision for iterative vertex-state joins.

State DataFrames inside a superstep loop are LogicalRDDs (from
localCheckpoint), for which Catalyst has no size statistics — it
assumes worst-case size and never auto-broadcasts, silently degrading
every superstep to a shuffle join even for a 20k-row state. The north
rule calls for "a broadcast-or-shuffle hash join of messages against a
partitioned vertex-state DataFrame": this helper makes that decision
explicitly, driver-side, from the known row count.

The threshold is deliberately small: a broadcast is rebuilt EVERY
superstep (driver collect + serialize + ship), so it only wins while
that rebuild is cheaper than shuffling the state — empirically a few
MB. Past it, the per-superstep join must stay a shuffled hash join
(preferSortMergeJoin=false in session.py): the big cached edge side
keeps its pinned hash(src) layout and only the small state/message
side moves. Measured on the sf0.1×8 bench graph (1.28M-vertex state),
per-superstep broadcasts cost ~5s/iteration vs ~1s shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BROADCAST_ROW_THRESHOLD = 100_000


def maybe_broadcast(df: DataFrame, n_rows: int | None, threshold: int = BROADCAST_ROW_THRESHOLD) -> DataFrame:
    """Broadcast `df` when its known row count is under threshold,
    else pin a shuffled hash join.

    The explicit SHUFFLE_HASH hint on the large-state branch matters:
    a checkpointed state reports its real (often < 64 MB) size, so
    Catalyst would auto-broadcast it — rebuilding a driver-side
    HashedRelation of the full vertex state EVERY superstep, a serial
    ~1s/iteration cost that caps scaling (the N→4N efficiency
    criterion). The hinted shuffle moves the same bytes as a parallel
    exchange instead."""
    if n_rows is not None and n_rows <= threshold:
        return F.broadcast(df)
    return df.hint("shuffle_hash")
