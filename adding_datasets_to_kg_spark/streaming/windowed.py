"""Watermarked event-time window aggregation over the transcript stream.

Covers the late-data contract of Structured Streaming (SURVEY.md §2.5/§2.10
— the reference is batch-only, this is the Spark-idiomatic incremental
counterpart of its per-source census): tumbling event-time windows on the
turn timestamp, a watermark bounding how late a turn may arrive, append
output so a window is emitted exactly once — when the watermark passes its
end and the result is final.

Semantics under the watermark (delay = ``late_threshold``):
- a turn later than (max event time seen) - delay may be DROPPED;
- windows finalize (append-mode emit) only once the watermark passes their
  end — downstream consumers never see a count that later grows.

Scale notes: state = one running aggregate per (window, role) — bounded by
the watermark horizon, evicted on finalization; the aggregation itself is
the standard partial-agg exchange, identical to the batch tumbling-window
plan (entry ``w_tumbling_window``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen.transcripts import TRANSCRIPT_SCHEMA


def windowed_turn_counts(
    stream: DataFrame,
    window: str = "1 hour",
    late_threshold: str = "30 minutes",
) -> DataFrame:
    """Streaming transcript turns → finalized per-window per-role counts."""
    return (
        stream.withWatermark("ts", late_threshold)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "role",
            "n_turns",
        )
    )


def run_windowed_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    window: str = "1 hour",
    late_threshold: str = "30 minutes",
    max_files_per_trigger: int = 1,
):
    """Drain available files one per micro-batch (so watermark advancement
    between files is observable) into an append-mode parquet sink of
    FINALIZED windows. Returns the started query."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    out = windowed_turn_counts(stream, window, late_threshold)
    return (
        out.writeStream.format("parquet")
        .option("path", os.path.join(output_dir, "windows"))
        .option("checkpointLocation", os.path.join(output_dir, "_window_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def read_finalized_windows(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_dir, "windows"))
