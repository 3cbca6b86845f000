"""Temporal joins Spark lacks as built-ins: as-of join and interval
(range) join — engine extensions for event-stream enrichment (the
build brief's canonical custom-operator examples).

Both are compositions of existing relational operators, picked for
their scale shape:

- as-of join: union-tag + one window (partition by key, order by
  time) carrying the last right-side payload forward — ONE sort
  shuffle regardless of how far back matches reach, vs the naive
  inequality join's quadratic blowup.
- interval join: intervals explode into the coarse time buckets they
  cover, points equi-join on (key, bucket), exact bounds filter after
  — the standard bucketized range join; the inequality never reaches
  the join condition, so Spark never falls back to
  broadcast-nested-loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    right_cols: tuple[str, ...] = ("event_id", "value"),
    tiebreak: str | None = None,
    prefix: str = "right_",
) -> DataFrame:
    """For each left row, attach the LATEST right row with
    ``right[on] <= left[on]`` within the same ``by`` key (backward
    as-of; equal timestamps match). Right columns come back
    ``prefix``-renamed, NULL when no prior right row exists.

    ``tiebreak`` (a unique right column, e.g. an event id) makes the
    choice among equal-timestamp right rows deterministic — required
    for engine-reproducible output. The payload is carried as ONE
    struct through ``last(ignorenulls)``, so all right columns always
    come from the SAME matched row."""
    by = list(by)
    lcols = left.columns
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_payload")
    if tiebreak:
        # the tiebreak rides the window ordering as a long; a
        # non-integral column would silently cast to NULL and quietly
        # lose the determinism guarantee the parameter exists for
        tb_type = dict(right.dtypes).get(tiebreak)
        if tb_type not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"asof_join tiebreak column {tiebreak!r} must be an "
                f"integral type, got {tb_type!r}"
            )
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    l2 = left.select(
        *by,
        F.col(on).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tb"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                f"{c}:{dict(right.dtypes)[c]}" for c in right_cols
            )
            + ">"
        )
        .alias("_payload"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
    )
    r2 = right.select(
        *by,
        F.col(on).alias("_ts"),
        F.lit(0).alias("_side"),
        tb.cast("long").alias("_tb"),
        payload,
        F.lit(None)
        .cast(l2.schema["_l"].dataType.simpleString())
        .alias("_l"),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l2.unionByName(r2).withColumn(
        "_m", F.last("_payload", ignorenulls=True).over(w)
    )
    out_cols: list[Column] = [F.col(f"_l.{c}").alias(c) for c in lcols]
    out_cols += [
        F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols
    ]
    return carried.where(F.col("_side") == 1).select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    by: tuple[str, ...] = ("user_id",),
    point_ts: str = "ts_us",
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Inner-join each point row to every interval row (same ``by``
    key) with ``start <= point_ts < end``. Interval rows explode into
    the ``bucket_us``-wide buckets they cover; the join is pure
    equi-join on (by..., bucket) with the bounds as a post-filter.
    Pick ``bucket_us`` near the typical interval length: shorter →
    more interval replicas; longer → more false candidates filtered
    after the join."""
    by = list(by)
    pts = points.withColumn(
        "_bucket", (F.col(point_ts) / bucket_us).cast("long")
    )
    ivs = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(start_col) / bucket_us).cast("long"),
                ((F.col(end_col) - 1) / bucket_us).cast("long"),
            )
        ),
    )
    return (
        pts.join(ivs, by + ["_bucket"])
        .where(
            (F.col(start_col) <= F.col(point_ts))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("_bucket")
    )
