"""Corpus retrieval — the reference's E1 stages IR3-IR6 (SURVEY.md §3):
canned queries -> embeddings (computed once, broadcast; the analog of the
disk-cached query embeddings, utils.py:25-27) -> corpus embeddings
(vectorized UDF; texts.py:122 / ent_extraction.py:51 analog) -> cosine
top-k=20 semantic search (ent_extraction.py:308) -> semi-join back to the
corpus rows (resolve_hit_documents, ent_extraction.py:36-48).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .. import core
from ..udfs import embed_text_udf

# The reference's canned DATASET retrieval queries (ent_extraction.py:168-189).
DATASET_QUERIES = [
    "Data used in the study", "Datasets employed for analysis",
    "Data sources referenced", "Dataset utilized for research",
    "Data collection methods", "Datasets examined in the paper",
    "Data analysis conducted", "Datasets referenced in the research",
    "Data sources investigated", "Dataset mentioned in the study",
    "Data utilized for analysis", "Datasets considered in the research",
    "Data collection procedures", "Dataset discussed in the paper",
    "Data sources utilized", "Datasets referenced for analysis",
    "Data used for research purposes", "Dataset examined in the study",
    "Data sources referenced in the paper",
    "Datasets employed for investigation",
]
# ent_extraction.py:191-207
BASELINE_QUERIES = [
    "Compare against baselines", "Baseline performance evaluation",
    "Benchmark comparison", "Reference models assessment",
    "Established method versus", "Baseline accuracy comparison",
    "Evaluate against traditional approaches",
    "Benchmark algorithm performance", "Control method comparison",
    "Prior method assessment", "Compare with standard models",
    "Evaluation protocol for baselines", "Baseline experimental setup",
    "Benchmark algorithm effectiveness", "Comparison results of baselines",
]

_DOT = ("aggregate(zip_with(qe, ce, (x, y) -> CAST(x AS DOUBLE) * "
        "CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v)")


def query_embeddings_df(spark, queries: list[str]) -> DataFrame:
    """Compute query embeddings ONCE on the driver (C4: the reference's
    disk-cached embeddings become an explicit broadcast side).

    Built from a pandas frame so the Arrow path yields a JVM-local table
    (r6): the plain-list form becomes a pickled Python RDD whose every
    broadcast/evaluation spins Python workers — measured seconds of
    first-use latency in a fresh session for a 5-row constant table. The
    float32 values are identical either way (both paths cast the same
    doubles to FloatType)."""
    import pandas as pd
    pdf = pd.DataFrame({
        "query_id": range(len(queries)),
        "query": list(queries),
        "qe": [core.embed_text(q) for q in queries],
    })
    return spark.createDataFrame(
        pdf, "query_id int, query string, qe array<float>")


def semantic_search(corpus: DataFrame, queries: list[str] | DataFrame,
                    text_col: str = "chunk_text", id_cols: list[str] | None = None,
                    top_k: int = 20,
                    embeddings: DataFrame | None = None) -> DataFrame:
    """Cosine top-k of every query against the corpus. Embeddings are
    unit-norm (core.embed_text), so the dot product IS the cosine.

    ``id_cols`` must uniquely identify corpus rows (the same key contract
    resolve_hit_rows relies on): ranking runs over one row per id and
    hit_text is re-attached by an id join, so duplicate ids would share a
    rank instead of consuming separate top-k slots.

    ``embeddings``: optional precomputed (id_cols..., ce) table covering at
    least the corpus ids — when given, the corpus is joined to it instead
    of re-running the embedding UDF (the embed-once path the fixpoint uses;
    embed_text is deterministic, so the join is semantics-identical)."""
    spark = corpus.sparkSession
    if not isinstance(queries, DataFrame):
        queries = query_embeddings_df(spark, queries)
    id_cols = id_cols or ["conv_id", "chunk_idx"]
    # Rank on (ids, score) ONLY — the text payload does not enter the
    # scoring cross-join or the ranking window's exchange (guide §8: every
    # shuffle but the last moves a lightweight proxy; the heavy column is
    # attached to the n_queries x top_k winners afterwards by a broadcast
    # join, so corpus text is never shuffled at all). Scores, ordering keys
    # and output rows are identical to the fused form.
    if embeddings is not None:
        embedded = embeddings.select(*id_cols, "ce").join(
            corpus.select(*id_cols), id_cols, "left_semi")
    else:
        embedded = corpus.select(
            *id_cols, embed_text_udf(F.col(text_col)).alias("ce"))
    scored = (
        embedded
        .crossJoin(F.broadcast(queries.select("query_id", "query", "qe")))
        .withColumn("score", F.round(F.expr(_DOT), 6))
        .select("query_id", "query", *id_cols, "score"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), *[F.col(c) for c in id_cols])
    topk = (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k))
    return (corpus.select(*id_cols, F.col(text_col).alias("hit_text"))
            .join(F.broadcast(topk), id_cols)
            .select("query_id", "query", *id_cols, "hit_text", "score",
                    "rank"))


def resolve_hit_rows(corpus: DataFrame, hits: DataFrame,
                     id_cols: list[str] | None = None) -> DataFrame:
    """Semi-join: corpus rows that appear in ANY query's hit list
    (resolve_hit_documents, ent_extraction.py:36-48)."""
    id_cols = id_cols or ["conv_id", "chunk_idx"]
    return corpus.join(hits.select(*id_cols).distinct(), id_cols,
                       "left_semi")
