"""Extraction fixpoint loop (ent_extraction.py:293-377 analog) — the
round-2 keystone: Spark driver loop == single-process oracle, convergence,
round-2 literal-keyword semantics, and pipeline-stage wiring."""

import pytest
from pyspark.sql import functions as F

from master_project_spark import core
from master_project_spark.datagen import (alias_df, gen_alias_dict,
                                          gen_transcripts,
                                          transcripts_spark_schema)
from master_project_spark.fixpoint import (extraction_fixpoint,
                                           extraction_fixpoint_all,
                                           oracle_extraction_fixpoint)
from master_project_spark.oracle import oracle_chunks, oracle_verified_triples
from master_project_spark.pipeline import run_pipeline

N_CONVS, MAX_TURNS = 40, 18


@pytest.fixture(scope="module")
def rows():
    return gen_transcripts(N_CONVS, MAX_TURNS, seed=13)


@pytest.fixture(scope="module")
def chunk_rows(rows):
    return oracle_chunks(rows)


@pytest.fixture(scope="module")
def chunks_df(spark, chunk_rows):
    return spark.createDataFrame(
        chunk_rows, "conv_id string, chunk_idx int, chunk_text string")


@pytest.fixture(scope="module")
def alias_set():
    return frozenset(r["alias"] for r in gen_alias_dict())


@pytest.mark.parametrize("mtype", ["DATASET", "BASELINE"])
def test_fixpoint_matches_oracle_exactly(spark, chunks_df, chunk_rows,
                                         alias_set, mtype):
    """Same loop, same core, same retrieval tie-breaks => identical entity
    sets AND identical first-discovered rounds."""
    res = extraction_fixpoint(chunks_df, alias_df(spark), mtype=mtype)
    got = {(r["entity"], r["first_round"])
           for r in res.entities.collect()}
    want = oracle_extraction_fixpoint(chunk_rows, set(alias_set),
                                      mtype=mtype)
    assert got == set(want["entities"].items())
    assert res.converged and want["converged"]
    assert res.rounds == want["rounds"]
    assert got, "fixture must actually exercise the loop"


def test_fixpoint_converges_and_rounds_progress(spark, chunks_df):
    """The loop terminates via the no-new-entities probe (X2 analog) within
    max_rounds, and the last recorded round adds zero entities."""
    res = extraction_fixpoint(chunks_df, alias_df(spark), mtype="DATASET")
    assert res.converged
    assert res.new_per_round[-1] == 0
    assert sum(res.new_per_round) > 0


def test_round2_literal_semantics(spark, alias_set):
    """Rounds >= 2 must match keywords LITERALLY (regex=False,
    ent_extraction.py:28-33): an entity containing a regex metacharacter
    ('CIFAR-10++' style) must not be treated as a pattern. We verify the
    literal corpus join selects exactly the chunks whose lowercase text
    contains the keyword substring."""
    from master_project_spark.fixpoint import fixpoint_loop
    chunks = spark.createDataFrame(
        [("c1", 0, "we evaluated x++ today on something."),
         ("c2", 0, "we evaluated xy today on something."),
         ("c3", 0, "nothing relevant here at all.")],
        "conv_id string, chunk_idx int, chunk_text string")
    kws = spark.createDataFrame([("x++",)], "kw string")
    got = sorted(r["conv_id"] for r in chunks.join(
        F.broadcast(kws), F.expr("contains(lower(chunk_text), kw)"),
        "left_semi").collect())
    # regex semantics would also match 'xy' ('x++' ~ one-or-more 'x');
    # literal semantics match only c1
    assert got == ["c1"]


def test_fixpoint_pipeline_stage(spark, rows, tmp_path):
    """run_pipeline(with_fixpoint=True) commits the fixpoint_entities table
    + per-type convergence metrics, and the table equals the oracle loop."""
    tdf = spark.createDataFrame(rows, transcripts_spark_schema())
    res = run_pipeline(spark, tdf, str(tmp_path / "fx"), alias_df(spark),
                       resume=False, with_chunks=True, with_fixpoint=True)
    assert "fixpoint_entities" in res.tables
    got = {(r["entity"], r["mtype"], r["first_round"])
           for r in res.tables["fixpoint_entities"].collect()}
    alias_set = {r["alias"] for r in gen_alias_dict()}
    chunk_rows = oracle_chunks(rows)
    want = set()
    for mtype in ("DATASET", "BASELINE"):
        o = oracle_extraction_fixpoint(chunk_rows, alias_set, mtype=mtype)
        want |= {(e, mtype, rnd) for e, rnd in o["entities"].items()}
    assert got == want
    conv = [m for m in res.metrics if m["stage"] == "_fixpoint_convergence"]
    assert conv and '"converged": true' in conv[0]["files_json"]


def test_verified_triples_stage_matches_oracle(spark, rows, tmp_path):
    """VERDICT gap #2: the pipeline's verification stage filters triples
    through core.verify_offline exactly like the single-process oracle."""
    from datetime import datetime, timezone
    # datagen entities are all dictionary-backed; add a conversation whose
    # extracted entity is NOT in the alias dict so verification has
    # something real to reject
    rows = rows + [{
        "conv_id": "convUNVERIFIED", "turn_idx": 0, "role": "user",
        "text": "OurModel was trained on MysteryCorpus for several weeks.",
        "tool": None, "ts": datetime(2025, 1, 1, tzinfo=timezone.utc)}]
    tdf = spark.createDataFrame(rows, transcripts_spark_schema())
    res = run_pipeline(spark, tdf, str(tmp_path / "vt"), alias_df(spark),
                       resume=False, with_chunks=False)
    got = sorted((r["conv_id"], r["turn_idx"], r["subj"], r["pred"], r["obj"])
                 for r in res.tables["verified_triples"].collect())
    alias_set = {r["alias"] for r in gen_alias_dict()}
    want = sorted((t["conv_id"], t["turn_idx"], t["subj"], t["pred"], t["obj"])
                  for t in oracle_verified_triples(rows, alias_set))
    assert got == want
    assert got, "fixture must produce verified triples"
    # verification actually rejects something (it is a real filter)
    n_all = res.tables["triples"].count()
    assert len(got) < n_all


def test_fixpoint_repartition_invariance(spark, chunks_df, alias_set):
    """Set semantics only — same result under repartition(1)."""
    res1 = extraction_fixpoint(chunks_df, alias_df(spark), mtype="DATASET")
    res2 = extraction_fixpoint(chunks_df.repartition(1), alias_df(spark),
                               mtype="DATASET")
    g1 = sorted(map(tuple, res1.entities.collect()))
    g2 = sorted(map(tuple, res2.entities.collect()))
    assert g1 == g2
