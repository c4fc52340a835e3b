"""Incremental batch ingest: process ONLY conversations not yet committed.

The stage-level resume in pipeline.py skips whole stages when the input is
unchanged. This module handles the other production case: the transcripts
table GREW (new conversations appended). The expensive stage — pandas-UDF
extraction — runs only on the delta (left-anti join against the committed
conversation ledger, the Spark-native generalization of the reference's
cache probe utils.py:38-47); cheap derived tables (linking, canonicalization,
graph) are rebuilt from the full extracted table.

At 10^12-turn scale the ledger anti-join is a real distributed join (the
ledger has one row per conversation, not per turn).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from .tableio import TableIO
from .udfs import EXTRACTED_SCHEMA, extract_turn_batches

LEDGER = "processed_convs"


def _ledger(spark: SparkSession, io: TableIO) -> DataFrame | None:
    path = io._data_dir(LEDGER)
    if not Path(path).exists():
        return None
    return io.read(spark, LEDGER)


def append_new_conversations(spark: SparkSession, transcripts: DataFrame,
                             out_dir: str, alias_dict: DataFrame,
                             extract_partitions: int | None = None) -> dict:
    """Extract the not-yet-processed conversations, append to the
    ``extracted`` table and the conversation ledger, then rebuild the
    derived tables. Returns {"new_convs": n, "new_rows": m}."""
    io = TableIO(out_dir)
    n_part = extract_partitions or spark.sparkContext.defaultParallelism * 4

    ledger = _ledger(spark, io)
    todo = transcripts
    if ledger is not None:
        todo = transcripts.join(ledger, "conv_id", "left_anti")

    new_convs_df = todo.select("conv_id").distinct()
    new_convs = new_convs_df.count()
    if new_convs == 0:
        return {"new_convs": 0, "new_rows": 0}

    delta = (todo.select("conv_id", "turn_idx", "ts", "text")
             .repartition(n_part, "conv_id", "turn_idx")
             .mapInPandas(extract_turn_batches, EXTRACTED_SCHEMA))
    delta.write.mode("append").parquet(str(io._data_dir("extracted")))
    new_convs_df.write.mode("append").parquet(str(io._data_dir(LEDGER)))
    # Crash between the two appends above leaves extracted rows for convs
    # missing from the ledger; the retry re-extracts them, and because
    # extraction is deterministic the duplicates are EXACT — _rebuild_derived
    # drops them (dropDuplicates on the full row), making retries idempotent.

    # refresh the extracted manifest in the standard TableIO shape
    extracted = io.read(spark, "extracted")
    new_rows = extracted.count()
    io.write_manifest("extracted", f"incremental:{new_rows}")

    _rebuild_derived(spark, io, alias_dict, transcripts=transcripts)
    return {"new_convs": new_convs, "new_rows": new_rows}


def _rebuild_derived(spark: SparkSession, io: TableIO,
                     alias_dict: DataFrame,
                     transcripts: DataFrame | None = None) -> None:
    """Derive triples/mentions/linked/entity_map/nodes/edges (and, when the
    pipeline previously committed them, chunks/corpus) from the full
    extracted table (cheap relative to extraction; all JVM-side except the
    minhash signatures over distinct surfaces)."""
    from . import core
    from .canonicalize import build_entity_map

    # dropDuplicates makes a crash-retried append idempotent (extraction is
    # deterministic, so re-extracted rows are exact duplicates)
    extracted = io.read(spark, "extracted").dropDuplicates()
    snapshot = f"derived:{extracted.count()}"

    triples = extracted.filter(F.col("kind") == "T").select(
        "conv_id", "turn_idx", "ts", "subj", "pred", "obj", "confidence",
        "mtype")
    io.commit(triples, "triples", snapshot)
    triples = io.read(spark, "triples")

    mentions = extracted.filter(F.col("kind") == "M").select(
        "conv_id", "turn_idx", "mention_id", "surface", "span_start",
        "span_end", "mtype")
    io.commit(mentions, "mentions", snapshot)
    mentions = io.read(spark, "mentions")

    linked = mentions.join(
        F.broadcast(alias_dict),
        F.lower(F.col("surface")) == F.col("alias"), "left") \
        .select("conv_id", "turn_idx", "mention_id", "surface", "mtype",
                "canonical_id",
                F.coalesce(F.col("prior"), F.lit(0.0)).alias("link_score"))
    io.commit(linked, "linked_mentions", snapshot)
    linked = io.read(spark, "linked_mentions")

    surfaces = (mentions.select("surface")
                .union(triples.filter(F.col("subj") != core.SELF_SUBJECT)
                       .select(F.col("subj").alias("surface")))
                .distinct())
    entity_map, _ = build_entity_map(surfaces, alias_dict)
    io.commit(entity_map, "entity_map", snapshot)
    entity_map = io.read(spark, "entity_map")

    nodes = (linked.join(entity_map, "surface")
             .groupBy("entity_id")
             .agg(F.min("surface").alias("canonical"),
                  F.sort_array(F.collect_set("surface")).alias("aliases"),
                  F.count(F.lit(1)).alias("n_mentions")))
    io.commit(nodes, "nodes", snapshot)

    em_subj = entity_map.select(F.col("surface").alias("subj"),
                                F.col("entity_id").alias("src"))
    em_obj = entity_map.select(F.col("surface").alias("obj"),
                               F.col("entity_id").alias("dst"))
    t = (triples
         .withColumn("self_src", F.concat(F.lit("conv:"), F.col("conv_id")))
         .join(em_subj, "subj", "left")
         .join(em_obj, "obj", "left"))
    edges = (t.select(
        F.when(F.col("subj") == core.SELF_SUBJECT, F.col("self_src"))
        .otherwise(F.coalesce(F.col("src"), F.col("subj"))).alias("src"),
        F.coalesce(F.col("dst"), F.col("obj")).alias("dst"),
        "pred", "ts", "confidence")
        .groupBy("src", "dst", "pred")
        .agg(F.count(F.lit(1)).alias("weight"),
             F.round(F.avg("confidence"), 6).alias("avg_confidence"),
             F.min("ts").alias("first_ts"),
             F.max("ts").alias("last_ts")))
    io.commit(edges, "edges", snapshot)

    # chunks/corpus are conversation-level — rebuild from the full
    # transcripts when the pipeline previously committed them, so they don't
    # go stale relative to the sibling tables
    if transcripts is not None and io.manifest("chunks") is not None:
        from .pipeline import chunk_stage_df
        chunks = chunk_stage_df(transcripts)
        io.commit(chunks, "chunks", snapshot)
        chunks = io.read(spark, "chunks")
        alternation = core.keyword_alternation(
            core.DATASET_KEYWORDS + core.BASELINE_KEYWORDS)
        io.commit(chunks.filter(F.col("chunk_text").rlike(alternation)),
                  "corpus", snapshot)
