"""TableIO crash-window + snapshot-token resume (round-2 hardening).

Covers the two ADVICE findings: (a) a manifest must never outlive the data
it describes — commit() invalidates it BEFORE the overwrite starts, so a run
killed mid-overwrite leaves the table uncommitted instead of
committed-but-clobbered; (b) the input fingerprint must be cancellation-free
(bit_xor alone zeroes out on even duplicate multisets)."""

import pytest
from pyspark.sql import functions as F

from master_project_spark.datagen import alias_df, transcripts_df
from master_project_spark.pipeline import input_fingerprint, run_pipeline
from master_project_spark.tableio import TableIO


def test_commit_invalidates_manifest_before_overwrite(spark, tmp_path):
    io = TableIO(tmp_path)
    io.commit(spark.range(5).withColumnRenamed("id", "x"), "t", "snap1")
    assert io.is_committed("t", "snap1")

    # a failing overwrite (kill analog) must leave the table UNcommitted
    from pyspark.sql.functions import udf

    @udf("long")
    def boom(x):
        raise RuntimeError("killed mid-overwrite")

    bad = spark.range(5).select(boom("id").alias("x"))
    with pytest.raises(Exception):
        io.commit(bad, "t", "snap1")
    assert not io.is_committed("t", "snap1")
    assert io.manifest("t") is None


def test_fingerprint_detects_even_duplicate_swap(spark):
    """Swapping two copies of row A for two copies of row B preserves both
    count and bit_xor — the decimal-sum component must still differ."""
    base = [("c1", 0, "same text"), ("c2", 0, "other")]
    a = spark.createDataFrame(
        base + [("c3", 1, "AAAA")] * 2, "conv_id string, turn_idx int, text string")
    b = spark.createDataFrame(
        base + [("c3", 1, "BBBB")] * 2, "conv_id string, turn_idx int, text string")
    assert input_fingerprint(a) != input_fingerprint(b)


def test_snapshot_token_skips_fingerprint_scan(spark, tmp_path):
    """VERDICT #5: an external snapshot token (Iceberg snapshot id analog)
    must skip the full-input fingerprint scan; resume still works."""
    t = transcripts_df(spark, 8, 6, seed=21)
    out = str(tmp_path / "tok")
    r1 = run_pipeline(spark, t, out, alias_df(spark), resume=True,
                      with_chunks=False, snapshot_token="snapA")
    ident1 = [m for m in r1.metrics if m["stage"] == "_input_identity"][0]
    assert '"fingerprint_scanned": false' in ident1["files_json"]
    assert '"token_provided": true' in ident1["files_json"]

    r2 = run_pipeline(spark, t, out, alias_df(spark), resume=True,
                      with_chunks=False, snapshot_token="snapA")
    skipped = {m["stage"] for m in r2.metrics if m["skipped"]}
    assert {"extracted", "triples", "mentions"} <= skipped

    # a NEW token invalidates: everything recomputes
    r3 = run_pipeline(spark, t, out, alias_df(spark), resume=True,
                      with_chunks=False, snapshot_token="snapB")
    assert all(not m["skipped"] for m in r3.metrics
               if m["stage"] not in ("_order_check", "_input_identity"))


def test_resume_false_skips_fingerprint_scan(spark, tmp_path):
    """resume=False needs no input identity — no fingerprint scan."""
    t = transcripts_df(spark, 6, 5, seed=22)
    r = run_pipeline(spark, t, str(tmp_path / "nof"), alias_df(spark),
                     resume=False, with_chunks=False)
    ident = [m for m in r.metrics if m["stage"] == "_input_identity"][0]
    assert '"fingerprint_scanned": false' in ident["files_json"]
