"""Structured Streaming variant of the extraction stage.

The reference is strictly batch (SURVEY.md §2.10) and the north rule asks
for resumable incremental batch, which pipeline.py provides. This module
adds the streaming-native path for continuously-arriving transcripts:

  readStream (file source over the transcripts directory)
    -> mapInPandas extraction (stateless, streaming-safe)
    -> watermark on ts
    -> tumbling-window triple counts
    -> writeStream with checkpointLocation (exactly-once file sink /
       observable memory sink in tests)

Late data: a 10-minute watermark bounds state; windows older than the
watermark finalize and stop accepting late turns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..udfs import TRIPLES_SCHEMA, extract_triples_batches


def streaming_triples(spark: SparkSession, input_dir: str,
                      schema=None) -> DataFrame:
    """File-source stream of transcript parquet -> per-turn triples."""
    if schema is None:
        from ..datagen import transcripts_spark_schema
        schema = transcripts_spark_schema()
    stream = (spark.readStream.schema(schema).parquet(input_dir))
    return (stream.select("conv_id", "turn_idx", "ts", "text")
            .mapInPandas(extract_triples_batches, TRIPLES_SCHEMA))


def windowed_triple_counts(triples: DataFrame,
                           window: str = "1 hour",
                           watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window aggregation of extraction throughput."""
    return (triples
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "pred")
            .agg(F.count(F.lit(1)).alias("n_triples"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "pred", "n_triples"))


CONV_STATE_SCHEMA = "n_turns LONG, n_triples LONG, last_turn_idx LONG"
CONV_OUT_SCHEMA = ("conv_id STRING, n_turns LONG, n_triples LONG, "
                   "last_turn_idx LONG, closed BOOLEAN")


def conversation_progress_stateful(turns: DataFrame,
                                   idle_timeout_ms: int = 1_800_000) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): running
    per-conversation progress — turn count, extracted-triple count, max
    turn_idx — emitted on every update, with a final ``closed`` row when a
    conversation goes idle past the processing-time timeout (the streaming
    analog of the reference's per-Task progress counters,
    utils.py:151-163). State is ONE tiny tuple per live conversation and
    is evicted at timeout — bounded regardless of stream length."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from .. import core

    def update(key, pdfs, state):
        (conv_id,) = key
        if state.hasTimedOut:
            n_turns, n_triples, last_idx = state.get
            state.remove()
            yield pd.DataFrame([{
                "conv_id": conv_id, "n_turns": n_turns,
                "n_triples": n_triples, "last_turn_idx": last_idx,
                "closed": True}])
            return
        n_turns, n_triples, last_idx = (
            state.get if state.exists else (0, 0, -1))
        for pdf in pdfs:
            n_turns += len(pdf)
            last_idx = max(last_idx, int(pdf["turn_idx"].max()))
            n_triples += sum(
                len(core.extract_triples(t or "")) for t in pdf["text"])
        state.update((n_turns, n_triples, last_idx))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame([{
            "conv_id": conv_id, "n_turns": n_turns,
            "n_triples": n_triples, "last_turn_idx": last_idx,
            "closed": False}])

    return (turns.groupBy("conv_id").applyInPandasWithState(
        update, CONV_OUT_SCHEMA, CONV_STATE_SCHEMA, "update",
        GroupStateTimeout.ProcessingTimeTimeout))


def run_to_memory(spark: SparkSession, input_dir: str,
                  query_name: str = "stream_triples") -> "object":
    """Start the stream into an in-memory sink (tests/demo). Returns the
    StreamingQuery; caller awaits processAllAvailable() then reads
    spark.table(query_name).

    Append mode: the watermark actually evicts window state and finalized
    windows emit exactly once (complete mode would retain all state forever,
    voiding the bounded-state claim)."""
    agg = windowed_triple_counts(streaming_triples(spark, input_dir))
    return (agg.writeStream.format("memory").queryName(query_name)
            .outputMode("append").start())
