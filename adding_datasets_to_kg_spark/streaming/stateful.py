"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY.md §2.10); incremental.py
covers stateless per-batch extract→emit. This module adds the genuinely
STATEFUL shape — per-conversation running aggregates that survive across
micro-batches AND across query restarts (state store under the streaming
checkpoint): the Structured Streaming analog of a keyed accumulator, the
mechanism a production ingest uses for "how many turns / how far has each
conversation progressed so far" without re-scanning history.

Scale notes: state is partitioned by the group key (conv_id) across
executors; per-group state here is two longs, so the state store stays tiny
no matter the corpus. Arrow batches stream per group — no per-row Python.
"""

from __future__ import annotations

import os
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..datagen.transcripts import TRANSCRIPT_SCHEMA

STATE_SCHEMA = "n_turns long, max_turn_idx long"
OUTPUT_SCHEMA = "conv_id string, n_turns long, max_turn_idx long, batch_turns long"


def _track_conversation(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    """Accumulate (total turns, max turn_idx) per conversation; emit one
    updated summary row per group per micro-batch."""
    n_turns, max_idx = state.get if state.exists else (0, -1)
    batch_turns = 0
    for pdf in pdfs:
        batch_turns += len(pdf)
        if len(pdf):
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
    n_turns += batch_turns
    state.update((n_turns, max_idx))
    yield pd.DataFrame(
        [{
            "conv_id": key[0],
            "n_turns": n_turns,
            "max_turn_idx": max_idx,
            "batch_turns": batch_turns,
        }]
    )


def conversation_progress(stream: DataFrame) -> DataFrame:
    """Streaming DataFrame → per-conversation running progress (stateful)."""
    return (
        stream.select("conv_id", "turn_idx")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _track_conversation,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_progress_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
):
    """Drain currently-available transcript files through the stateful
    tracker, appending each micro-batch's updated summaries (stamped with
    the batch id) to a parquet log. State persists in the checkpoint's
    state store: a later run with the SAME output_dir resumes the
    accumulated counts, not from zero. (foreachBatch, not the memory sink —
    the memory sink cannot recover from a checkpoint.)
    """
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    progress_path = os.path.join(output_dir, "progress")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("_batch_id", F.lit(batch_id)).write.mode("append").parquet(
            progress_path
        )

    return (
        conversation_progress(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(output_dir, "_state_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def read_progress(spark: SparkSession, output_dir: str) -> DataFrame:
    """Latest per-conversation summary from the progress log (update-mode
    rows superseded by later batches are dropped)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    log = spark.read.parquet(os.path.join(output_dir, "progress"))
    w = Window.partitionBy("conv_id").orderBy(F.col("_batch_id").desc())
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .drop("_rn", "_batch_id")
    )
