"""Event-stream operators over the driver's ``events`` table
``(event_id long, ts timestamp, user_id long, event_type string,
value double, props string)``.

Engine extensions beyond the reference's algorithm set (the reference has
no temporal operators at all — SURVEY.md §2.9): the two shapes a
training-data pipeline needs from an activity log, expressed as
window-function plans Catalyst pushes down fully:

* ``sessionize``   — gap-based sessions per entity: one shuffle on
  user_id, a lag + running-sum window, then a hash aggregate; the classic
  sessionization plan. Timestamps are compared in integer MICROSECONDS
  (``unix_micros``) so the DuckDB oracle (``epoch_us``) is bit-exact.
* ``window_dedup`` — first event per (entity, event_type, tumbling
  window): integer window index = epoch_us // window_us, min-id survivor
  per bucket — the time-window analogue of exact_dedup.

Scale: both plans shuffle once on the entity key; per-entity state is a
single pass (no per-row Python anywhere). A power-user hot key is bounded
by that user's own event count — AQE skew-split applies to the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

US_PER_MIN = 60_000_000


def _epoch_us(ts_col: str):
    """Integer epoch-microseconds, timezone-INDEPENDENT for TIMESTAMP_NTZ
    inputs (unix_micros would route NTZ through the session timezone;
    DuckDB's epoch_us treats naive timestamps as UTC — verified equal)."""
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions: a new session starts when the entity's gap
    since its previous event exceeds ``gap_minutes``. Returns one row per
    session: ``(user_id, session_id, n_events, start_us, end_us,
    value_sum)`` — session_id is the entity's 0-based session index,
    timestamps are integer epoch-microseconds (engine-portable)."""
    gap_us = gap_minutes * US_PER_MIN
    ev = events.select(
        F.col(user_col).alias("user_id"),
        _epoch_us(ts_col).alias("ts_us"),
        F.col(id_col).alias("event_id"),
        F.col(value_col).alias("value"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    new_sess = (
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) > F.lit(gap_us), 1
        ).otherwise(0)
    )
    run = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tagged = ev.withColumn("boundary", new_sess).withColumn(
        "session_id", F.sum("boundary").over(run).cast("long")
    )
    return (
        tagged.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
    )


def window_dedup(
    events: DataFrame,
    window_minutes: int = 60,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First event per (entity, event_type, tumbling window):
    ``(user_id, event_type, win long, keep_event_id, n_dups)`` —
    win = epoch_us // window_us; survivor = min event_id (deterministic).
    """
    window_us = window_minutes * US_PER_MIN
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("event_type"),
        _epoch_us(ts_col).alias("_us"),
        F.col(id_col).alias("event_id"),
    ).select(
        "user_id",
        "event_type",
        # integer division (no double rounding) — DuckDB's // twin
        F.expr(f"_us div {window_us}").cast("long").alias("win"),
        "event_id",
    )
    return ev.groupBy("user_id", "event_type", "win").agg(
        F.min("event_id").alias("keep_event_id"),
        (F.count(F.lit(1)) - 1).cast("long").alias("n_dups"),
    )
