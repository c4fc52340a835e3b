"""Deduplication operators for training-data pipelines.

All variants are deterministic (MD5-keyed hashes, no PYTHONHASHSEED /
partition-order dependence) and shuffle-minimal:

- exact:        one hash-aggregate on a content fingerprint
- bag-of-words: same, on the sorted distinct token set
- MinHash-LSH:  signature -> banded buckets -> candidate pairs (blocking
                avoids the O(n^2) cross join; oversized buckets are capped
                explicitly and reported)
- SimHash:      64-bit fingerprint via pandas UDF; near-dup candidates by
                16-bit band equality, verified by hamming distance
- embedding:    cosine near-dup over an array<float> column, JVM-side math
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..udfs import minhash_udf, simhash_udf

TOKEN_RE = "[A-Za-z0-9]+"


def _tokens(col: str):
    return F.regexp_extract_all(col, F.lit(TOKEN_RE), F.lit(0))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the min-id representative per content hash.
    One shuffle (hash aggregate); fingerprint computed map-side."""
    return (
        df.select(id_col, F.sha2(F.col(text_col), 256).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups")))


def bow_dedup(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Near-dup on the sorted distinct token multiset (order/whitespace
    insensitive)."""
    fp = F.md5(F.concat_ws(
        " ", F.sort_array(F.array_distinct(_tokens(text_col)))))
    return (
        df.select(id_col, fp.alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups")))


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 16,
                      band_size: int = 2, min_agree: int = 8,
                      max_bucket: int = 200) -> tuple[DataFrame, int]:
    """MinHash-LSH near-dup candidate pairs verified by signature agreement.
    Returns (pairs(id_a, id_b, agree), n_dropped_buckets). Buckets larger
    than max_bucket are dropped (logged via the returned count) — the
    explicit skew guard for degenerate shingle distributions."""
    sigs = df.select(F.col(id_col).alias("id"),
                     minhash_udf(F.col(text_col)).alias("sig"))
    n_bands = num_hashes // band_size
    bands = sigs.select(
        "id", "sig",
        F.posexplode(F.expr(
            f"transform(sequence(0, {n_bands - 1}), "
            f"b -> hash(sig[b*{band_size}], sig[b*{band_size}+1], b))"
        )).alias("band_idx", "band_hash"))
    sizes = bands.groupBy("band_idx", "band_hash").count()
    n_dropped = sizes.filter(F.col("count") > max_bucket).count()
    ok = sizes.filter(F.col("count") <= max_bucket).drop("count")
    b = bands.join(ok, ["band_idx", "band_hash"])
    a1 = b.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"),
                  "band_idx", "band_hash")
    a2 = b.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"),
                  "band_idx", "band_hash")
    pairs = (
        a1.join(a2, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b").distinct()
        .withColumn("agree", F.expr(
            "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"))
        .filter(F.col("agree") >= min_agree)
        .select("id_a", "id_b", "agree"))
    return pairs, n_dropped


def simhash_near_dups(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: fingerprint (pandas UDF), block on each of
    the four 16-bit words (a near-dup within hamming<=3 of 64 bits must
    agree exactly on at least one word — pigeonhole), verify by hamming
    distance via bit_count(xor)."""
    fps = df.select(F.col(id_col).alias("id"),
                    simhash_udf(F.col(text_col)).alias("sh"))
    blocks = fps.select(
        "id", "sh",
        F.posexplode(F.expr(
            "transform(sequence(0, 3), "
            "w -> concat(w, ':', (sh >> (w * 16)) & 65535))"
        )).alias("w", "block"))
    a = blocks.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"),
                      "block")
    b = blocks.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
                      "block")
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b").distinct()
        .withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming"))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.8,
                        max_token_docs: int = 1000) -> DataFrame:
    """Word n-gram Jaccard similarity pairs via inverted-index join.
    Shingles appearing in more than max_token_docs documents are dropped
    from the index (stopword-shingle skew guard) — they cannot distinguish
    near-dups anyway."""
    toks = _tokens(text_col)
    shingles = F.array_distinct(F.expr(
        f"transform(sequence(0, greatest(size(tokens) - {n}, 0)), "
        f"i -> concat_ws(' ', slice(tokens, i + 1, {n})))"))
    docs = (df.select(F.col(id_col).alias("id"), toks.alias("tokens"))
            .filter(F.size("tokens") >= n)
            .select("id", shingles.alias("sh"))
            .withColumn("n_sh", F.size("sh")))
    inv = docs.select("id", "n_sh", F.explode("sh").alias("s"))
    common = inv.groupBy("s").count().filter(F.col("count") <= max_token_docs)
    inv = inv.join(common.select("s"), "s")
    a = inv.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"), "s")
    b = inv.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"), "s")
    return (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
        .withColumn("jaccard", F.round(
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard"))


def embedding_cosine_pairs(df: DataFrame, vec_col: str = "embedding",
                           id_col: str = "vec_id",
                           threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute force; for large corpora use
    similarity.lsh_ann_topk to block first). JVM-side math only."""
    dot = ("aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE) * "
           "CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v)")
    norm = ("sqrt(aggregate({c}, CAST(0.0 AS DOUBLE), "
            "(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")
    # per-vector norms computed once per side before the pair join, not
    # once per pair — identical doubles, identical product order
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")) \
        .withColumn("na", F.expr(norm.format(c="va")))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")) \
        .withColumn("nb", F.expr(norm.format(c="vb")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(
            F.expr(dot) / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine"))
