"""Sessionization: inactivity-gap user sessions, batch + streaming.

Engine extension (the reference is batch-only BSP — SURVEY.md §2.4 "no
streaming"); this is the training-data-pipeline "user activity
sessions" primitive over the events table.

Two execution paths, by semantics:

- gap-only sessions → Spark's native ``session_window`` (batch AND
  streaming): state-store backed, merge-on-overlap, watermark-driven
  emission. This is the production path — the whole operator is one
  JVM-side stateful aggregation, no Python in the loop.
- gap + max-duration cap (a session also closes once it has spanned
  ``max_duration``, regardless of activity) → NOT expressible with
  ``session_window`` (the split point depends on the session's own
  anchored start, a data-dependent recursion). Implemented as a shared
  pure-pandas fold kernel driven by ``applyInPandas`` in batch and
  ``applyInPandasWithState`` (event-time timeout) in streaming — the
  custom-stateful-operator shape from the build brief.

Session definition (matches ``session_window`` exactly in gap-only
mode): an event joins the user's open session iff ``ts < last_ts +
gap`` (strict); ``session_end = last_ts + gap`` (exclusive end). With
``max_duration`` set, the event must also satisfy ``ts < session_start
+ max_duration``.

All timestamps cross the Python boundary as int64 epoch microseconds —
no tz ambiguity, and the driver-oracle comparison stays integral.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from distributed_graph_analytics_spark.streaming.events import _instant_ts

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

# open-session carry state for applyInPandasWithState:
# (start_us, last_us, n_events, sum_value)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _parse_interval_us(interval: str) -> int:
    """'12 hours' / '30 minutes' / '45 seconds' / '1 day' → microseconds."""
    qty, unit = interval.split()
    mult = {
        "second": 1_000_000,
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
    }[unit.rstrip("s")]
    return int(qty) * mult


def _fold_sessions(
    ts_us, values, gap_us: int, maxd_us: int | None, open_state
) -> Tuple[list, tuple | None]:
    """Fold time-ordered (ts_us, value) pairs into sessions.

    ``open_state`` is a (start, last, n, sum) tuple carried in from a
    previous batch (or None). Returns (closed_sessions, open_state):
    closed sessions as (start, end, n, sum) with end = last + gap.
    Out-of-order rows inside the open session's span (possible within
    the watermark horizon across batches) merge conservatively:
    start = min(start, ts), last = max(last, ts).
    """
    closed = []
    cur = list(open_state) if open_state is not None else None
    for t, v in zip(ts_us, values):
        t = int(t)
        v = float(v)
        if cur is None:
            cur = [t, t, 1, v]
            continue
        joins = t - cur[1] < gap_us
        if joins and maxd_us is not None:
            joins = t - cur[0] < maxd_us
        if joins:
            cur[0] = min(cur[0], t)
            cur[1] = max(cur[1], t)
            cur[2] += 1
            cur[3] += v
        else:
            closed.append((cur[0], cur[1] + gap_us, cur[2], cur[3]))
            cur = [t, t, 1, v]
    return closed, (tuple(cur) if cur is not None else None)


def _prep(events: DataFrame) -> DataFrame:
    return _instant_ts(events).select(
        "user_id", F.col("ts"), F.col("value").cast("double").alias("value")
    )


def batch_sessionize(events: DataFrame, gap: str = "12 hours") -> DataFrame:
    """Gap-only sessions via native ``session_window`` — one JVM-side
    stateful aggregation, shuffle on user_id only, partial-agg
    combines map-side. The scale path: no Python, no window sort over
    the full event log (the session-window agg merges in the state
    store / hash agg, it does not need a global per-user sort first).

    ``session_window.end`` already is last_ts + gap.
    """
    e = _prep(events)
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


def batch_sessionize_custom(
    events: DataFrame,
    gap: str = "12 hours",
    max_duration: str | None = None,
) -> DataFrame:
    """Batch sessionization through the shared pandas fold kernel
    (``applyInPandas``, one group per user). With ``max_duration=None``
    this equals :func:`batch_sessionize` row-for-row (pytest-pinned);
    with it set, sessions additionally split once they span
    ``max_duration`` — the semantics ``session_window`` cannot express.

    Every session closes at end-of-input (batch has no watermark).
    Groups are independent, so the operator scales with the user
    count — and a DOMINANT user cannot blow one Arrow batch: each
    user's history is pre-split at every silence ≥ gap (a session can
    never span such a silence, so the gap-aligned split is
    semantics-preserving) and the fold runs per (user, segment). The
    residual worst case is one user with gap-free continuous activity
    over the whole corpus, which is a degenerate input, not a hub.
    """
    gap_us = _parse_interval_us(gap)
    maxd_us = _parse_interval_us(max_duration) if max_duration else None

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts_us")
        closed, cur = _fold_sessions(
            pdf["ts_us"].to_numpy(), pdf["value"].to_numpy(),
            gap_us, maxd_us, None,
        )
        if cur is not None:
            closed.append((cur[0], cur[1] + gap_us, cur[2], cur[3]))
        uid = int(pdf["user_id"].iloc[0])
        return pd.DataFrame(
            [(uid, s, e, n, v) for (s, e, n, v) in closed],
            columns=[f.name for f in SESSION_SCHEMA.fields],
        )

    e = _prep(events).select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    # gap-aligned pre-split: segment id = running count of ≥gap
    # silences within the user (strict join is ts - last < gap, so a
    # diff == gap already starts a new session — boundaries align)
    w = Window.partitionBy("user_id").orderBy("ts_us")
    e = e.withColumn(
        "_seg",
        F.coalesce(
            F.sum(
                (F.col("ts_us") - F.lag("ts_us").over(w) >= F.lit(gap_us)).cast(
                    "int"
                )
            ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            F.lit(0),
        ),
    )
    return e.groupBy("user_id", "_seg").applyInPandas(fold, SESSION_SCHEMA)


def streaming_sessionize(
    events: DataFrame,
    gap: str = "12 hours",
    watermark: str = "1 day",
) -> DataFrame:
    """Gap-only streaming sessions: native ``session_window`` with a
    watermark — append mode emits a session once the watermark passes
    its end. Same output contract as :func:`batch_sessionize`."""
    e = _prep(events).withWatermark("ts", watermark)
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


def streaming_sessionize_custom(
    events: DataFrame,
    gap: str = "12 hours",
    max_duration: str | None = None,
    watermark: str = "1 day",
) -> DataFrame:
    """Custom stateful streaming sessionization via
    ``applyInPandasWithState`` (event-time timeout).

    Per user, state is the single open session (start, last, n, sum).
    Each micro-batch folds its (sorted) rows through the shared kernel:
    sessions closed by in-batch evidence emit immediately; the
    remaining open session is stored with a timeout at
    ``last_ts + gap`` — when the event-time watermark passes that, the
    no-data batch fires the timeout and the session emits. State is
    one fixed-width row per active user, and idle users' state clears
    on timeout, so an unbounded run stays bounded.
    """
    gap_us = _parse_interval_us(gap)
    maxd_us = _parse_interval_us(max_duration) if max_duration else None

    def fold(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        uid = int(key[0])
        cols = [f.name for f in SESSION_SCHEMA.fields]
        if state.hasTimedOut:
            start, last, n, sv = state.get
            state.remove()
            yield pd.DataFrame(
                [(uid, start, last + gap_us, n, sv)], columns=cols
            )
            return
        cur = state.get if state.exists else None
        closed = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_us")
            got, cur = _fold_sessions(
                pdf["ts_us"].to_numpy(), pdf["value"].to_numpy(),
                gap_us, maxd_us, cur,
            )
            closed.extend(got)
        if cur is not None:
            state.update(cur)
            # fire once the watermark passes session_end
            state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        elif state.exists:
            state.remove()
        if closed:
            yield pd.DataFrame(
                [(uid, s, e, n, v) for (s, e, n, v) in closed], columns=cols
            )

    e = (
        _prep(events)
        .withWatermark("ts", watermark)
        .select("user_id", "ts", F.unix_micros("ts").alias("ts_us"), "value")
    )
    return e.groupBy("user_id").applyInPandasWithState(
        fold,
        SESSION_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
