"""The KG construction pipeline: transcripts -> triples/mentions/chunks ->
linking -> canonicalization -> nodes/edges, with per-stage snapshot commits,
per-partition lineage metrics, and resume.

Stage plan (new-engine lifecycle, SURVEY.md §3):

  scan transcripts
    -> [extract]   repartition(hash(conv_id, turn_idx)) -> mapInPandas
                   triple + mention extraction (stateless per turn => hash on
                   the FULL key: perfectly balanced even under Zipf conv_id
                   skew — this is the salting strategy for the UDF stages)
    -> [chunks]    groupBy(conv_id).applyInPandas (order restored inside,
                   W1/W2); corpus keyword filter (P1) BEFORE any downstream
                   embedding — the hand-kept pushdown Catalyst can't do
                   across opaque UDFs (SURVEY §4)
    -> [link]      mentions x broadcast(alias_dict) (J6 — broadcast hash
                   join, no shuffle on the skewed surface side)
    -> [canon]     MinHash-LSH blocking + iterative-join connected components
    -> [graph]     nodes + edges tables
    -> [metrics]   run_metrics: per-stage wall/rows + per-file lineage

Every stage commits via TableIO (parquet + manifest snapshot); a rerun with
the same input fingerprint skips committed stages (resume-from-checkpoint,
north rule).
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import core
from .canonicalize import build_entity_map
from .tableio import TableIO
from .udfs import (CHUNKS_SCHEMA, EXTRACTED_SCHEMA, chunk_text_udf,
                   extract_turn_batches, make_verify_udf,
                   stream_chunk_batches)


#: Buckets for the explicit two-phase salted aggregation (skew handling)
SALT_BUCKETS = 16

#: Per-node alias arrays are capped here (VERDICT round-2 'What's wrong':
#: an uncapped collect_set makes a mega-entity with millions of distinct
#: surfaces one unbounded row — the same OOM class as round 1's chunk
#: rows). n_aliases keeps the TRUE distinct count, so overflow is visible
#: (n_aliases > size(aliases)), never fatal.
ALIAS_CAP = 100


def node_aggregates(linked_em: DataFrame, alias_cap: int = ALIAS_CAP) -> DataFrame:
    """(entity_id, canonical, aliases[<=cap], n_aliases, n_mentions) with
    BOUNDED row sizes by construction: the alias sample is taken by RANKING
    distinct surfaces through a window and collecting only rank<=cap, so
    surfaces stream through a sort — no entity-sized array ever
    materializes, even for a hot entity with millions of surfaces (a
    post-agg slice would still build the unbounded intermediate).
    n_aliases/n_mentions stay exact."""
    from pyspark.sql.window import Window

    stats = (linked_em.groupBy("entity_id")
             .agg(F.min("surface").alias("canonical"),
                  F.countDistinct("surface").alias("n_aliases"),
                  F.count(F.lit(1)).alias("n_mentions")))
    w = Window.partitionBy("entity_id").orderBy("surface")
    top = (linked_em.select("entity_id", "surface").distinct()
           .withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") <= alias_cap)
           .groupBy("entity_id")
           .agg(F.sort_array(F.collect_list("surface")).alias("aliases")))
    return (stats.join(top, "entity_id")
            .select("entity_id", "canonical", "aliases", "n_aliases",
                    "n_mentions"))


def conv_stats_df(transcripts: DataFrame) -> DataFrame:
    """Per-conversation stats via EXPLICIT two-phase salted aggregation
    (north-star skew handling): partial agg on (conv_id, salt) spreads a hot
    conversation over SALT_BUCKETS reducers, final agg combines the partials
    — the pattern any conv-keyed aggregate uses at 10^12 turns. Shared by
    the pipeline and the incremental delta path."""
    partial = (
        transcripts
        .withColumn("salt", F.pmod(F.xxhash64("turn_idx"),
                                   F.lit(SALT_BUCKETS)))
        .groupBy("conv_id", "salt")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.length("text")).alias("chars"),
             F.min("ts").alias("lo"), F.max("ts").alias("hi"),
             # turn-ordering invariant inputs ride the SAME aggregation
             # (round 3: the order check was its own full transcript pass —
             # pure overhead; salt is a function of turn_idx, so each
             # distinct turn_idx lands in exactly one bucket and the
             # per-bucket distinct counts SUM to the global one)
             F.countDistinct("turn_idx").alias("nd_idx"),
             F.min("turn_idx").alias("lo_idx"),
             F.max("turn_idx").alias("hi_idx")))
    return (partial.groupBy("conv_id")
            .agg(F.sum("n").alias("n_turns"),
                 F.sum("chars").alias("n_chars"),
                 F.min("lo").alias("first_ts"),
                 F.max("hi").alias("last_ts"),
                 F.sum("nd_idx").alias("nd_turn_idx"),
                 F.min("lo_idx").alias("min_turn_idx"),
                 F.max("hi_idx").alias("max_turn_idx")))


def cue_prefilter_condition(spark: SparkSession):
    """JVM-side prefilter for the extract stage (round-3 VERDICT ask #1:
    the extract UDF is ~91% of the narrow-cluster wall, and every turn
    crossed the Arrow boundary just to be rejected by the Python cue gate).

    Keeps (a) every row matching the Java translation of
    core.turn_may_extract — exact on ASCII text, where deburr is the
    identity and ``(?i)`` equals Python's ASCII casefold — and (b) every
    non-ASCII row, because only Python can run deburr; the in-UDF gate
    still decides those. Rows the gate rejects emit ZERO extract output
    (core.extract_turn returns ([], []) for them), so filtering them
    JVM-side is output-exact — property-tested in tests/test_pipeline.py.

    Returns None (caller skips the prefilter) if the JVM regex dialect
    ever rejects the translated pattern — correctness never depends on
    the translation."""
    pat = core.java_cue_gate_pattern()
    try:
        spark._jvm.java.util.regex.Pattern.compile(pat)
    except Exception:                                # pragma: no cover
        return None
    # cue-alternation first: cheap and matches most surviving rows, so the
    # Or short-circuits before the non-ASCII scan
    return F.col("text").rlike(pat) | F.col("text").rlike("[^\\x00-\\x7F]")


#: Conversations longer than this many turns take the SEGMENTED streaming
#: path — bounded row sizes instead of one conversation-sized row
CHUNK_SEG_TURNS = 4096


def chunk_stage_df(transcripts: DataFrame,
                   seg_turns: int = CHUNK_SEG_TURNS,
                   input_clustered: bool = False) -> DataFrame:
    """Conversation chunking with BOUNDED row sizes (round-2 fix for the
    mega-conversation OOM hazard, VERDICT #3 / ADVICE #5).

    Turns aggregate per (conv_id, segment-of-seg_turns-turns) — ordering
    enforced JVM-side via sort_array(collect_list(struct(turn_idx, text)))
    (W2) — so no single row ever exceeds ~seg_turns turns of text.

    - Single-segment conversations (the overwhelmingly common case) chunk
      via ONE vectorized pandas UDF over many conversations per Arrow
      batch (W1), byte-identical to the reference chunker.
    - Multi-segment conversations stream their segments IN ORDER through
      core.StreamingChunker inside mapInPandas (sortWithinPartitions on
      (conv_id, seg_idx) after a conv_id repartition): live state is one
      in-progress chunk + a raw carry tail, so a 10^6-turn conversation
      chunks without materializing itself anywhere. Segment boundaries cut
      at the last sentence terminator; normalization rules that would span
      a cut point may differ from whole-text processing in rare edge texts
      — the documented trade for boundedness (the reference itself cannot
      process such conversations at all).

    ``input_clustered=True`` declares that ``transcripts`` is already
    hash-clustered by conv_id (a conv_id-bucketed catalog table, or an
    Iceberg ``bucket(conv_id)`` scan with storage partitioning): Catalyst
    then plans the seg aggregation WITHOUT an exchange (HashPartitioning
    on conv_id satisfies the (conv_id, seg_idx) clustered distribution —
    plan-asserted in tests/test_pipeline.py::
    test_bucketed_input_chunks_identical_and_shuffle_free), eliminating
    the pipeline's one
    large shuffle — raw turn text never crosses executors. The flag itself
    only skips the mega-conv path's now-redundant ``repartition(conv_id)``
    (the aggregation output keeps the input's conv_id clustering, so the
    streaming chunker's co-location precondition already holds); the main
    win comes from the scan's bucketing metadata. Measured on the round-5
    local-cluster protocol legs: see BENCH/BASELINE.md.
    """
    base = transcripts.select("conv_id", "turn_idx", "text")
    # conversations spilling past segment 0 — detected by a PUSHED-DOWN
    # turn_idx >= seg_turns scan predicate (row-group stats skip the read)
    # and broadcast, so the small/large routing joins are MAP-SIDE: the
    # seg-text rows shuffle exactly once (the aggregation), same as the
    # round-1 plan. (A per-conv window count here would re-shuffle every
    # conversation's text a second time — measured +23% on the stage.)
    big_ids = (base.filter(F.col("turn_idx") >= seg_turns)
               .select("conv_id").distinct())
    segs = (
        base
        .withColumn("seg_idx", (F.col("turn_idx") / seg_turns).cast("int"))
        .groupBy("conv_id", "seg_idx")
        .agg(F.concat_ws(" ", F.expr(
            "transform(sort_array(collect_list(struct(turn_idx, text))), "
            "s -> s.text)")).alias("seg_text")))

    small = (segs.join(F.broadcast(big_ids), "conv_id", "left_anti")
             .select("conv_id",
                     F.posexplode(chunk_text_udf(F.col("seg_text")))
                     .alias("chunk_idx", "chunk_text")))
    big = segs.join(F.broadcast(big_ids), "conv_id", "left_semi") \
        .select("conv_id", "seg_idx", "seg_text")
    if not input_clustered:
        big = big.repartition("conv_id")
    big = (big.sortWithinPartitions("conv_id", "seg_idx")
           .mapInPandas(stream_chunk_batches, CHUNKS_SCHEMA))
    return small.unionByName(big)


@dataclass
class PipelineResult:
    run_id: str
    out_dir: str
    tables: dict = field(default_factory=dict)
    metrics: list = field(default_factory=list)

    @property
    def triples(self) -> DataFrame:
        return self.tables["triples"]


def input_fingerprint(transcripts: DataFrame) -> str:
    """Cheap deterministic input identity: one pass computing row count +
    TWO order-independent content hashes. Drives snapshot ids for resume.

    bit_xor alone is cancellation-prone (any even multiset of identical rows
    XORs to 0, so swapping two copies of row A for two copies of row B
    preserves count AND xor); the decimal sum of the same row hashes is
    cancellation-free, so the pair is robust. decimal(38,0) accumulates
    10^12 rows x 2^63 without overflow (ANSI-safe)."""
    row = transcripts.select(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(conv_id, turn_idx, text))").alias("h"),
        F.expr("sum(cast(xxhash64(conv_id, turn_idx, text) "
               "as decimal(38,0)))").alias("s"),
    ).collect()[0]
    return f"{row['n']}:{row['h']}:{row['s']}"


class _StageRunner:
    def __init__(self, spark: SparkSession, io: TableIO, base_token: str,
                 resume: bool, run_id: str):
        self.spark, self.io, self.base_token = spark, io, base_token
        self.resume, self.run_id = resume, run_id
        self.metrics: list[dict] = []

    def run_group(self, jobs: list[tuple]) -> dict[str, DataFrame]:
        """Commit INDEPENDENT stages concurrently (C1 fan-out at stage
        granularity): each job is (name, compute, kwargs). Spark's
        scheduler interleaves the concurrent jobs' tasks (FAIR mode,
        session.py), so one stage's slot-idle gaps — Python-worker spinup,
        shuffle barriers, single-threaded write tails — are filled by
        another's tasks instead of serializing ~2-3 s of latency per
        stage. Resume semantics are unchanged: every stage still checks /
        writes its own manifest."""
        from concurrent.futures import ThreadPoolExecutor

        if len(jobs) == 1:
            name, compute, kw = jobs[0]
            return {name: self.run(name, compute, **kw)}
        # NOTE (r6): one-scheduler-pool-per-stage (root FAIR is fair ACROSS
        # pools; the shared default pool is FIFO internally) was A/B'd in 3
        # interleaved pairs and did NOT beat the shared pool (medians 32.3 s
        # vs 28.1 s with one weather-outlier pair the other way) — the
        # default pool's FIFO still backfills idle slots well enough at
        # this stage mix, so the simpler form stays (OPTIMIZATION_r06.md).
        with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
            futs = {name: ex.submit(self.run, name, compute, **kw)
                    for name, compute, kw in jobs}
            return {name: f.result() for name, f in futs.items()}

    def snapshot_id(self, name: str, extra: str = "") -> str:
        return hashlib.sha256(
            f"{name}:{self.base_token}:{extra}".encode()).hexdigest()[:16]

    def is_current(self, name: str, extra: str = "") -> bool:
        """True when the table is committed at THIS run's snapshot (i.e.
        run() would skip-resume it)."""
        return self.io.is_committed(name, self.snapshot_id(name, extra))

    def run(self, name: str, compute, partition_by: list[str] | None = None,
            extra: str = "", force: bool = False) -> DataFrame:
        """``force=True`` recomputes even when the snapshot is current —
        for stages whose side-products feed a SIBLING commit that is
        missing or stale (the fixpoint/chunk_embeddings pair)."""
        snapshot_id = self.snapshot_id(name, extra)
        t0 = time.perf_counter()
        if self.resume and not force and self.io.is_committed(name,
                                                              snapshot_id):
            manifest = self.io.manifest(name)
            self.metrics.append({
                "run_id": self.run_id, "stage": name,
                "snapshot_id": snapshot_id, "skipped": True,
                "rows_out": manifest["rows"], "n_files": manifest["n_files"],
                "wall_ms": 0.0,
                "files_json": json.dumps(manifest["files"]),
            })
            return self.io.read(self.spark, name)
        df = compute()
        manifest = self.io.commit(df, name, snapshot_id,
                                  partition_by=partition_by)
        self.metrics.append({
            "run_id": self.run_id, "stage": name, "snapshot_id": snapshot_id,
            "skipped": False, "rows_out": manifest["rows"],
            "n_files": manifest["n_files"],
            "wall_ms": round((time.perf_counter() - t0) * 1000, 3),
            "files_json": json.dumps(manifest["files"]),
        })
        return self.io.read(self.spark, name)


def run_pipeline(spark: SparkSession, transcripts: DataFrame, out_dir: str,
                 alias_dict: DataFrame, *, resume: bool = True,
                 with_chunks: bool = True, run_id: str | None = None,
                 extract_partitions: int | None = None,
                 snapshot_token: str | None = None,
                 with_fixpoint: bool = False,
                 input_clustered: bool = False) -> PipelineResult:
    io = TableIO(out_dir)
    # Input identity for resume. An EXTERNAL snapshot token (Iceberg snapshot
    # id / manifest version of the source table) skips the full input scan —
    # at 100 TB the fingerprint pass is a full read just to decide whether to
    # skip work. resume=False needs no stable identity at all, so it also
    # skips the scan (a fresh nonce forces recompute of every stage).
    fingerprint_scanned = False
    if snapshot_token is not None:
        fp = f"token:{snapshot_token}"
    elif not resume:
        fp = f"nonce:{time.time_ns()}"
    else:
        fp = input_fingerprint(transcripts)
        fingerprint_scanned = True
    # alias-dependent stages must recompute when the dictionary changes
    alias_row = alias_dict.select(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(alias, canonical_id, prior))").alias("h"),
    ).collect()[0]
    alias_fp = f"alias:{alias_row['n']}:{alias_row['h']}"
    run_id = run_id or f"run_{hashlib.sha256(f'{fp}:{time.time()}'.encode()).hexdigest()[:10]}"
    st = _StageRunner(spark, io, fp, resume, run_id)
    # cores*4: fine-grained tasks cut the straggler tail of the Python
    # extraction waves (measured: ~20% wall reduction vs cores*2 at 32 cores)
    n_part = extract_partitions or spark.sparkContext.defaultParallelism * 4

    # ---- extract: per-turn, stateless => ANY row-balanced partitioning is
    # correct, so do NOT shuffle the full corpus text unless the input
    # partitioning is too coarse (parquet splits are row-balanced regardless
    # of conv_id skew). When we must, hash on the FULL (conv_id, turn_idx)
    # key — balanced even under Zipf conversations.
    # ONE pandas pass emits both triple and mention rows (kind column);
    # splitting into tables is JVM-side filter+project.
    turns = transcripts.select("conv_id", "turn_idx", "ts", "text")
    # JVM cue-gate prefilter: gate-rejected turns never reach Arrow. Placed
    # BEFORE the repartition so the shuffle moves only surviving rows.
    pre = cue_prefilter_condition(spark)
    if pre is not None:
        turns = turns.filter(pre)
    # partition-count probe without building an RDD conversion plan for the
    # common file-backed case: inputFiles() is a metadata-only lookup
    # (parquet scans split at maxPartitionBytes, so n_files lower-bounds the
    # scan partitions); .rdd is the fallback for in-memory inputs only
    # input_clustered: a conv_id-bucketed scan is already row-balanced at
    # bucket granularity AND re-shuffling would throw away the clustering
    # the chunk stage exploits — never repartition it.
    if not input_clustered:
        n_in = len(transcripts.inputFiles()) or turns.rdd.getNumPartitions()
        if n_in < max(2, n_part // 4):
            turns = turns.repartition(n_part, "conv_id", "turn_idx")

    # every per-conversation table is partitioned by an ingest 'batch'
    # column (batch = deterministic function of the input identity): the
    # incremental path (incremental.py) appends a NEW batch partition per
    # delta and rewrites ONLY the partitions containing re-processed
    # conversations — O(delta + touched partitions), never O(history)
    batch_token = "b" + hashlib.sha256(fp.encode()).hexdigest()[:12]

    # ---- wave 1: the three transcripts-rooted stages run CONCURRENTLY —
    # extraction (Python-heavy), chunking (shuffle+Python), and the salted
    # stats agg interleave under the FAIR scheduler, filling each other's
    # slot-idle gaps (the measured serial fraction was the 4->16 scaling
    # bottleneck, BENCH/BASELINE.md)
    wave1 = [
        ("extracted",
         lambda: turns.mapInPandas(extract_turn_batches, EXTRACTED_SCHEMA)
         .withColumn("batch", F.lit(batch_token)),
         {"partition_by": ["batch"]}),
        ("conv_stats",
         lambda: conv_stats_df(transcripts)
         .withColumn("batch", F.lit(batch_token)),
         {"partition_by": ["batch"]}),
    ]
    if with_chunks:
        # ordering enforced JVM-side (sort_array(collect_list(...)), W2);
        # ONE vectorized pandas UDF chunks many conversations per Arrow
        # batch (W1); mega-conversations stream segmented (bounded rows)
        wave1.append((
            "chunks",
            lambda: chunk_stage_df(transcripts,
                                   input_clustered=input_clustered)
            .withColumn("batch", F.lit(batch_token)),
            {"partition_by": ["batch"]}))
    w1 = st.run_group(wave1)
    extracted = w1["extracted"]
    tables_conv_stats = w1["conv_stats"]

    # ---- wave 2: projections of wave-1 outputs (all independent).
    # processed_convs = the conversation ledger seeding incremental
    # appends; n_turns lets it DETECT conversations that grew after
    # processing (re-extracted, not silently dropped). corpus = the P1
    # keyword filter kept BEFORE anything expensive downstream (the
    # hand-held pushdown Catalyst can't do across opaque UDFs).
    alternation = core.keyword_alternation(core.DATASET_KEYWORDS
                                           + core.BASELINE_KEYWORDS)

    # projections of the committed extraction, shared by the commit stages
    # AND the wave-2 consumers below (r6: verification / linking /
    # canonicalization used to wait for the triples/mentions COMMITS and
    # then re-read them — but a filter of the committed `extracted` table
    # is row-identical to reading the committed filter output, so all
    # seven stages are independent and run as ONE concurrent wave,
    # removing a full wave of commit latency from the critical path)
    def _triples_proj():
        return extracted.filter(F.col("kind") == "T") \
            .select("conv_id", "turn_idx", "ts", "subj", "pred", "obj",
                    "confidence", "mtype", "batch")

    def _mentions_proj():
        return extracted.filter(F.col("kind") == "M") \
            .select("conv_id", "turn_idx", "mention_id", "surface",
                    "span_start", "span_end", "mtype", "batch")

    # Verification (VERDICT gap #2): every triple's entities pass the
    # offline verifier before they count (verify_entity,
    # ent_extraction.py:344-355) — broadcast alias vocabulary + vectorized
    # shared-core check; 'self' subjects are exempt (the speaking agent,
    # not an extracted candidate).
    alias_set = frozenset(
        r["alias"] for r in alias_dict.select("alias").distinct().collect())
    verify_udf = make_verify_udf(spark, alias_set)

    def _verified_triples():
        return _triples_proj().filter(
            verify_udf(F.col("obj"), F.col("mtype"))
            & ((F.col("subj") == core.SELF_SUBJECT)
               | verify_udf(F.col("subj"), F.col("mtype"))))

    # linking: mentions x broadcast(alias_dict) (J6 — broadcast hash join,
    # no shuffle on the skewed surface side)
    def _linked():
        return (_mentions_proj().join(
            F.broadcast(alias_dict),
            F.lower(F.col("surface")) == F.col("alias"), "left")
            .select("conv_id", "turn_idx", "mention_id", "surface", "mtype",
                    "canonical_id",
                    F.coalesce(F.col("prior"), F.lit(0.0)).alias("link_score"),
                    "batch"))

    # canonicalization (LSH + CC) also only needs the extraction output;
    # its driver-loop convergence probes are latency-bound and overlap
    # perfectly with the Arrow verification/linking stages
    canon_info = {"n_dropped_buckets": 0}

    def _entity_map():
        surfaces = (
            _mentions_proj().select("surface")
            .union(_triples_proj()
                   .filter(F.col("subj") != core.SELF_SUBJECT)
                   .select(F.col("subj").alias("surface")))
            .distinct())
        em, n_dropped = build_entity_map(surfaces, alias_dict)
        canon_info["n_dropped_buckets"] = n_dropped
        return em.withColumn("batch", F.lit(batch_token))

    wave2 = [
        ("triples", _triples_proj, {"partition_by": ["batch"]}),
        ("mentions", _mentions_proj, {"partition_by": ["batch"]}),
        ("processed_convs",
         lambda: tables_conv_stats.select("conv_id", "n_turns", "batch"),
         {"partition_by": ["batch"]}),
        ("verified_triples", _verified_triples,
         {"extra": alias_fp, "partition_by": ["batch"]}),
        ("linked_mentions", _linked,
         {"extra": alias_fp, "partition_by": ["batch"]}),
        ("entity_map", _entity_map,
         {"extra": alias_fp, "partition_by": ["batch"]}),
    ]
    if with_chunks:
        chunks_b = w1["chunks"]
        wave2.append((
            "corpus",
            lambda: chunks_b.filter(F.col("chunk_text").rlike(alternation)),
            {"partition_by": ["batch"]}))
    w2 = st.run_group(wave2)
    triples = w2["triples"].drop("batch")
    mentions = w2["mentions"].drop("batch")

    tables = {"triples": triples, "mentions": mentions,
              "conv_stats": tables_conv_stats.drop("batch")}
    if with_chunks:
        tables["chunks"] = w1["chunks"].drop("batch")
        tables["corpus"] = w2["corpus"].drop("batch")
    tables["verified_triples"] = w2["verified_triples"].drop("batch")
    linked = w2["linked_mentions"].drop("batch")
    tables["linked_mentions"] = linked
    entity_map = w2["entity_map"].drop("batch")
    tables["entity_map"] = entity_map

    # ---- extraction fixpoint (VERDICT gap #1): the reference's core
    # algorithm — retrieval-gated extract + verify + keyword growth to
    # convergence (ent_extraction.py:293-377) — composed over the chunk
    # corpus. Off by default in the hot path (it is a per-corpus analytical
    # loop, not a per-turn stage); run_pipeline(with_fixpoint=True) commits
    # its entity table + per-round convergence metrics.
    fixpoint_info: dict = {}
    if with_fixpoint and with_chunks:
        from .fixpoint import EmbeddingCache, extraction_fixpoint_all

        embed_cache = EmbeddingCache(("conv_id", "chunk_idx"))

        def _fixpoint():
            ents, info = extraction_fixpoint_all(tables["chunks"], alias_dict,
                                                 embed_cache=embed_cache)
            fixpoint_info.update(info)
            return ents

        # fixpoint_entities + chunk_embeddings are an atomic PAIR for
        # resume: the embeddings are a side-product of the fixpoint run
        # (embed-once cache), unrecoverable without re-running it. A crash
        # between the two commits previously left the resumed run with a
        # skip-resumed fixpoint, an empty cache, and either a silently
        # missing table or an io.commit(None) crash on a stale manifest
        # (ADVICE round-4 low) — so when the embeddings commit is missing
        # or stale, FORCE the fixpoint recompute to refill the cache.
        force_fix = (st.resume
                     and st.is_current("fixpoint_entities", alias_fp)
                     and not st.is_current("chunk_embeddings", alias_fp))
        tables["fixpoint_entities"] = st.run(
            "fixpoint_entities", _fixpoint, extra=alias_fp, force=force_fix)
        # When both are current, run() skip-serves the committed table and
        # never calls the lambda; when the fixpoint recomputed, the cache
        # is live. The cache can only be empty here if no fixpoint corpus
        # had any rows — nothing to commit.
        if embed_cache.df is not None \
                or st.is_current("chunk_embeddings", alias_fp):
            tables["chunk_embeddings"] = st.run(
                "chunk_embeddings", lambda: embed_cache.df, extra=alias_fp)

    # ---- graph materialization
    def _nodes():
        return node_aggregates(linked.join(entity_map, "surface"))
    # (definition below; committed together with edges in one wave)

    def _edges():
        em_subj = entity_map.select(
            F.col("surface").alias("subj"), F.col("entity_id").alias("src"))
        em_obj = entity_map.select(
            F.col("surface").alias("obj"), F.col("entity_id").alias("dst"))
        t = (triples
             .withColumn("self_src", F.concat(F.lit("conv:"), F.col("conv_id")))
             .join(em_subj, "subj", "left")
             .join(em_obj, "obj", "left"))
        return (
            t.select(
                F.when(F.col("subj") == core.SELF_SUBJECT, F.col("self_src"))
                .otherwise(F.coalesce(F.col("src"), F.col("subj"))).alias("src"),
                F.coalesce(F.col("dst"), F.col("obj")).alias("dst"),
                "pred", "ts", "confidence")
            .groupBy("src", "dst", "pred")
            .agg(F.count(F.lit(1)).alias("weight"),
                 F.round(F.avg("confidence"), 6).alias("avg_confidence"),
                 F.min("ts").alias("first_ts"),
                 F.max("ts").alias("last_ts"))
        )
    w5 = st.run_group([
        ("nodes", _nodes, {"extra": alias_fp}),
        ("edges", _edges, {"extra": alias_fp}),
    ])
    tables["nodes"] = w5["nodes"]
    tables["edges"] = w5["edges"]

    # ---- ordering invariant check (north_star's
    # Window.partitionBy(conv_id).orderBy(turn_idx) contract): a
    # projection of the COMMITTED conv_stats output — one row per
    # conversation, zero additional transcript passes (round 3: this was
    # its own full scan, first serial at run end, then overlapped — both
    # cost a whole extra read of the corpus; riding the salted
    # aggregation costs three tiny columns)
    if "nd_turn_idx" in tables_conv_stats.columns:
        order_violations = (
            tables_conv_stats
            .filter((F.col("n_turns") != F.col("nd_turn_idx"))
                    | (F.col("max_turn_idx") - F.col("min_turn_idx") + 1
                       != F.col("n_turns"))).count())
    else:
        # resumed against a pre-widening conv_stats commit (round <=2
        # schema without the folded order-check columns, ADVICE round-4
        # low): fall back to the standalone aggregation — one extra
        # transcript pass, paid only on legacy output dirs
        order_violations = (
            transcripts.groupBy("conv_id")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.countDistinct("turn_idx").alias("nd"),
                 F.min("turn_idx").alias("lo"),
                 F.max("turn_idx").alias("hi"))
            .filter((F.col("n") != F.col("nd"))
                    | (F.col("hi") - F.col("lo") + 1 != F.col("n")))
            .count())

    # ---- run_metrics table
    st.metrics.append({
        "run_id": run_id, "stage": "_input_identity",
        "snapshot_id": hashlib.sha256(fp.encode()).hexdigest()[:16],
        "skipped": not fingerprint_scanned,
        "rows_out": 0, "n_files": 0, "wall_ms": 0.0,
        "files_json": json.dumps(
            {"fingerprint_scanned": fingerprint_scanned,
             "token_provided": snapshot_token is not None}),
    })
    st.metrics.append({
        "run_id": run_id, "stage": "_order_check",
        "snapshot_id": "", "skipped": False,
        "rows_out": order_violations, "n_files": 0, "wall_ms": 0.0,
        "files_json": json.dumps({"lsh_buckets_dropped": canon_info["n_dropped_buckets"]}),
    })
    if fixpoint_info:
        st.metrics.append({
            "run_id": run_id, "stage": "_fixpoint_convergence",
            "snapshot_id": "", "skipped": False,
            "rows_out": sum(i["rounds"] for i in fixpoint_info.values()),
            "n_files": 0, "wall_ms": 0.0,
            "files_json": json.dumps(fixpoint_info),
        })
    metrics_df = spark.createDataFrame(
        [(m["run_id"], m["stage"], m["snapshot_id"], bool(m["skipped"]),
          int(m["rows_out"]), int(m["n_files"]), float(m["wall_ms"]),
          m["files_json"]) for m in st.metrics],
        "run_id string, stage string, snapshot_id string, skipped boolean, "
        "rows_out long, n_files int, wall_ms double, files_json string")
    metrics_df.write.mode("append").parquet(f"{out_dir}/run_metrics")
    tables["run_metrics"] = spark.read.parquet(f"{out_dir}/run_metrics")

    return PipelineResult(run_id=run_id, out_dir=out_dir, tables=tables,
                          metrics=st.metrics)
