"""Windowed aggregations over the events stream table.

The reference has no streaming path (SURVEY.md §2.6), but a transcript
platform ingests an event firehose next to the transcript store; these are
the standard time-window operators, expressed once for batch (DuckDB-
checkable) and once for Structured Streaming with a watermark (late-data
test in tests/test_events.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1h window per event_type: count, value sum/avg.
    Batch form — pure Catalyst, one shuffle on (hour, event_type)."""
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            # values are 2-decimal; round(sum,2) is exact (double error
            # << 0.005), and deriving avg from the ROUNDED sum keeps both
            # engines on identical doubles — a raw avg differs by 1 ulp
            # between Spark and DuckDB and flips round(...,6) boundaries
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.round(F.sum("value"), 2) / F.count("*"), 6).alias(
                "avg_value"
            ),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def hourly_rollup_sql(table: str = "events") -> str:
    return f"""
SELECT date_trunc('hour', ts) AS hour,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       round(round(sum(value), 2) / count(*), 6) AS avg_value,
       count(DISTINCT user_id) AS n_users
FROM {table}
GROUP BY 1, 2
"""


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: session starts when the previous
    event is > gap older. Window functions only (one shuffle by user)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    # TIMESTAMP_NTZ cannot cast straight to long in Spark 4; unix_timestamp
    # interprets NTZ in the session tz (UTC) == DuckDB epoch()
    epoch = F.unix_timestamp(F.col("ts"))
    gap = epoch - F.lag(epoch).over(w)
    with_start = events.withColumn(
        "is_start",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    sess = with_start.withColumn(
        "session_seq",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def sessionize_sql(gap_minutes: int = 30, table: str = "events") -> str:
    return f"""
WITH lagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                                      ORDER BY ts))
                      > {gap_minutes * 60}
              THEN 1 ELSE 0 END AS is_start
  FROM {table}
),
sess AS (
  SELECT user_id, ts, value,
         CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS session_seq
  FROM lagged
)
SELECT user_id, session_seq,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM sess GROUP BY 1, 2
"""


def user_topk(events: DataFrame, k: int = 3) -> DataFrame:
    """Per event_type, top-k users by event count (ties -> lowest user_id).
    Integer-keyed ranking: no float hazard in the order, the classic
    grouped-top-k window (one shuffle on event_type after partial aggs)."""
    from pyspark.sql import Window

    agg = events.groupBy("event_type", "user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("n_events"), F.asc("user_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("event_type", "rank", "user_id", "n_events", "sum_value")
    )


def user_topk_sql(k: int = 3, table: str = "events") -> str:
    return f"""
WITH agg AS (
  SELECT event_type, user_id, count(*) AS n_events,
         round(sum(value), 2) AS sum_value
  FROM {table} GROUP BY 1, 2
),
r AS (
  SELECT event_type, user_id, n_events, sum_value,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY n_events DESC, user_id ASC)
              AS INTEGER) AS rank
  FROM agg
)
SELECT event_type, rank, user_id, n_events, sum_value
FROM r WHERE rank <= {k}
"""


def streaming_hourly_rollup(stream: DataFrame, watermark: str = "2 hours"):
    """Streaming form: tumbling window + watermark so late events beyond
    the watermark are dropped and state is bounded (the state-retention
    knob a 10^12-event stream needs)."""
    # watermarks require TIMESTAMP (not NTZ); session tz is UTC so the
    # reinterpretation is faithful
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
