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


def test_incremental_ledger_rows(spark, tmp_path):
    t = transcripts_df(spark, 8, 6, seed=3)
    out = str(tmp_path / "led")
    append_new_conversations(spark, t, out, alias_df(spark))
    ledger = spark.read.parquet(f"{out}/processed_convs")
    assert ledger.count() == 8
    assert ledger.distinct().count() == 8
