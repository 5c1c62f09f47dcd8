"""Structured Streaming variant of the daily-trend / alert pipeline.

The reference runs as a daily cron whose "windows" are CURRENT_DATE
predicates (SURVEY.md §2.6); the streaming-native form is a
file-source stream → 1-day tumbling window aggregate with a watermark
for late data, plus a stream-static broadcast join against the
historical baseline for live regression flags.

Scale notes: the window aggregate is keyed on (window) or (window,
event_type) — bounded state; the watermark expires state after one
day of lateness, so state size is O(open windows × keys), independent
of stream length. The baseline side of the alert join is a tiny
static aggregate — broadcast, so the stream never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Schema for streamed event files (timestamp already normalized —
#: the streaming source reads engine-written parquet, not the
#: driver's nanos files).
EVENT_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream over an events directory (new files appear
    as upstream batches land — the S3-drop pattern of the reference's
    extract stage, tabjolt_email.py:351-359)."""
    return (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )


def daily_trend(stream: DataFrame, lateness: str = "1 day") -> DataFrame:
    """Day-wise Avg/Min/Max — the streaming twin of
    ``summary_line`` + ``q_trend_series`` (tabjolt_email.py:86)."""
    return (
        stream.withWatermark("ts", lateness)
        .groupBy(F.window("ts", "1 day").alias("day"))
        .agg(
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.date_format(F.col("day.start"), "yyyy-MM-dd").alias("summary_date"),
            "avg_value",
            "min_value",
            "max_value",
            "n_events",
        )
    )


def regression_alerts(
    stream: DataFrame, baseline: DataFrame, threshold: float = 20.0
) -> DataFrame:
    """Live red-alert stream: stream-static broadcast join against the
    per-key historical baseline, flag samples whose percentage
    difference exceeds the reference's strict +20% rule
    (tabjolt_email.py:223)."""
    b = F.broadcast(
        baseline.select(
            F.col("response").alias("event_type"), F.col("avg_elapsed_ms")
        )
    )
    pct = (
        (F.col("value") - F.col("avg_elapsed_ms"))
        / F.col("avg_elapsed_ms")
        * 100.0
    )
    return (
        stream.join(b, "event_type")
        .withColumn(
            "percentage_difference",
            F.when(F.col("avg_elapsed_ms") == 0, F.lit(None)).otherwise(
                F.round(pct, 4)
            ),
        )
        .filter(F.col("percentage_difference") > threshold)
        .select(
            "event_id", "ts", "event_type", "value",
            "avg_elapsed_ms", "percentage_difference",
        )
    )


def purchase_click_attribution(
    purchases: DataFrame, clicks: DataFrame, max_gap: str = "1 hour"
) -> DataFrame:
    """Watermarked stream-stream interval join: each purchase joined to
    the same user's clicks within the preceding ``max_gap``.

    Both sides carry watermarks so the join state is bounded: a
    buffered click can be dropped once event time passes click_ts +
    max_gap + watermark — without the time-range condition the state
    would grow forever. This is the streaming twin of the batch as-of
    join (operators/asof.py), trading exact latest-match for bounded
    state and per-event latency.
    """
    p = (
        purchases.withWatermark("ts", "30 minutes")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    c = clicks.withWatermark("ts", "30 minutes").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap}")),
        "inner",
    ).select(
        "purchase_id", "p_user", "purchase_ts", "purchase_value",
        "click_id", "click_ts",
    )


def session_stats_stream(
    stream: DataFrame, gap: str = "30 minutes", lateness: str = "1 day"
) -> DataFrame:
    """Streaming gap sessions via ``session_window`` — the merging
    window whose state closes (and emits) once the watermark passes a
    session's end + gap, so state is O(open sessions), bounded by the
    lateness horizon rather than stream length. The batch twin is
    ``analytics.session_window_stats``; the test asserts they emit
    identical sessions."""
    return (
        stream.withWatermark("ts", lateness)
        .groupBy(
            F.col("user_id"), F.session_window("ts", gap).alias("sw")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(
                    F.round(F.col("value") * 100).cast("bigint")
                ) / F.lit(100.0)
            ).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
            "session_value",
        )
    )


def dedup_events_stream(stream: DataFrame, lateness: str = "1 hour") -> DataFrame:
    """Streaming ingestion dedup: drop replayed events by ``event_id``
    with watermark-bounded state — the streaming twin of
    ``dedup_exact`` for an at-least-once upstream (the reference's
    extract re-runs on cron and can re-deliver a day's file,
    tabjolt_email.py:351-359).

    ``dropDuplicatesWithinWatermark`` keys state on ``event_id`` only
    and expires entries once the watermark passes their event time, so
    state is O(events per lateness window), not O(stream length) —
    the property that makes this runnable forever at 100 TB/day."""
    return stream.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def first_purchase_stream(stream: DataFrame) -> DataFrame:
    """Streaming twin of ``analytics.new_users_daily``'s first-seen
    pass: running MIN(event date) per purchasing user, emitted in
    update mode as earlier first-purchases arrive.

    State is one date per purchasing user — O(entity domain), which
    the acquisition semantics genuinely require (a user's "first
    purchase ever" cannot be horizon-bounded; the horizon-bounded
    cousin is ``dedup_events_stream``). Determinism: MIN is
    order-insensitive, so unlike ``dropDuplicates`` the final state
    is independent of micro-batch arrival order — that's what makes
    the batch equivalence testable exactly."""
    return (
        stream.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("first_date"))
    )


def run_to_memory(
    df: DataFrame, table_name: str, mode: str = "complete"
) -> None:
    """Drain a stream into an in-memory sink with the availableNow
    trigger (test/verification harness path)."""
    (
        df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def purchase_click_left_join(
    purchases: DataFrame, clicks: DataFrame, max_gap: str = "1 hour"
) -> DataFrame:
    """LEFT OUTER watermarked stream-stream interval join: every
    purchase emits — joined to the same user's preceding-``max_gap``
    clicks when they exist, NULL-padded otherwise. The null row for
    an unmatched purchase can only be emitted once the CLICK-side
    watermark has passed the purchase's match window (no future click
    can change the answer) — which is exactly why outer stream-stream
    joins require both watermarks and a time-range join condition:
    the engine needs a provable "no more matches" point per row to
    avoid holding outer state forever.

    Same state-bounding as the inner variant
    (:func:`purchase_click_attribution`); the outer semantics add
    only the timeout-triggered null emission."""
    p = purchases.withWatermark("ts", "30 minutes").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    c = clicks.withWatermark("ts", "30 minutes").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap}")
        ),
        "leftOuter",
    ).select(
        "purchase_id",
        "p_user",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )
