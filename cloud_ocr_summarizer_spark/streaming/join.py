"""Stream-stream join with watermark-bounded state.

Joins two event streams (e.g. clicks and purchases by the same user)
under a time-range condition.  Both sides carry watermarks and the join
condition bounds how long either side's rows can wait for a match, so
Spark can evict state — without the time bound, both state stores grow
forever (the deal-breaker at 100 TB/day).

State bound math (Spark's own): a click row is droppable once the
purchase-side watermark passes click_ts + max_delay; symmetric for
purchases.  Late rows beyond either watermark never join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from cloud_ocr_summarizer_spark.streaming.windowed import EVENT_SCHEMA


def click_purchase_join(clicks: DataFrame, purchases: DataFrame,
                        *, max_delay: str = "1 hour") -> DataFrame:
    """Pair each purchase with the user's clicks in the preceding
    ``max_delay`` — the streaming twin of the batch as-of/interval join
    (q_asof_last_click_before_purchase)."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        F.expr(
            f"""
            c_user = p_user AND
            click_ts <= purchase_ts AND
            click_ts >= purchase_ts - INTERVAL {max_delay}
            """
        ),
        "inner",
    )


def purchase_click_left_join(
    clicks: DataFrame, purchases: DataFrame, *, max_delay: str = "1 hour"
) -> DataFrame:
    """LEFT OUTER twin of ``click_purchase_join`` with purchases as the
    preserved side: every purchase emits, null-padded click columns when
    no click preceded it within ``max_delay``.

    In streaming mode the unmatched rows are emitted only once the
    click-side WATERMARK passes the purchase's join window (the state
    store must prove no matching click can still arrive) — so a purchase
    with no clicks surfaces one watermark-advance later, not in the
    micro-batch that read it.  That delay is the correctness price of
    null-padding under out-of-order input; the test drives it by draining
    twice with newer events in between.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    return p.join(
        c,
        F.expr(
            f"""
            c_user = p_user AND
            click_ts <= purchase_ts AND
            click_ts >= purchase_ts - INTERVAL {max_delay}
            """
        ),
        "left_outer",
    )


def start_click_purchase_join(
    spark: SparkSession,
    *,
    clicks_dir: str,
    purchases_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_delay: str = "1 hour",
    late_threshold: str = "30 minutes",
    join_type: str = "inner",
) -> StreamingQuery:
    """AvailableNow drain of the watermarked stream-stream join into an
    exactly-once parquet sink.  ``join_type``: "inner" (default) or
    "left_outer" (purchases preserved, see purchase_click_left_join)."""

    def src(d: str) -> DataFrame:
        return (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 16)
            .parquet(d)
            .withWatermark("ts", late_threshold)
        )

    join_fn = {
        "inner": click_purchase_join,
        "left_outer": purchase_click_left_join,
    }[join_type]
    joined = join_fn(src(clicks_dir), src(purchases_dir), max_delay=max_delay)
    return (
        joined.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
