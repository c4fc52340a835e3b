"""The reference's extraction FIXPOINT loop (ent_extraction.py:293-377),
composed as a driver-side loop over DataFrames — round 1's missing piece
(VERDICT.md "What's missing" #1).

Reference round structure, with file:line cites into /root/reference:

  1. corpus filter — round 1 uses the regex phrase bank
     (``regex=len(entities)<1``, ent_extraction.py:304-305); every later
     round re-filters ALL chunks against the GROWN literal keyword set
     (``re.escape`` semantics, :28-33). Spark-first: round 1 is one
     ``rlike`` alternation; literal rounds are a broadcast ``contains()``
     semi-join against the keyword table (P1's round>=2 mapping, SURVEY
     §2.2).
  2. retrieval gate — cosine top-k of the canned queries against the
     filtered corpus (:306-308); extraction runs ONLY over retrieved hit
     chunks (resolve_hit_documents, :36-48).
  3. extract — candidate entity surfaces from the hit chunks (:312-344).
  4. verify — every candidate passes the verifier before it counts
     (:344-355); de-externalized to alias-set membership
     (core.verify_offline).
  5. set-union + convergence — ``entities |= verified``; stop when the
     round adds nothing (``temp_entities - entities == set()``, :356-362).
  6. keyword growth — parenthetical alias mining expands the keyword set
     (:364-371, core.expand_aliases); recurse (:372-377).

``localCheckpoint`` per round truncates the growing lineage (C5, SURVEY
§2.11); the convergence probe is the single action per round. Broadcast
sizes: the keyword table is the entity vocabulary — small relative to the
corpus by construction (same assumption the reference makes holding the
set in driver memory).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from . import core
from .operators.retrieval import (BASELINE_QUERIES, DATASET_QUERIES,
                                  resolve_hit_rows, semantic_search)

MENTION_SURFACES_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("surface", T.StringType()),
    T.StructField("mtype", T.StringType()),
]))


@pandas_udf(MENTION_SURFACES_SCHEMA)
def mention_surfaces_udf(texts: pd.Series) -> pd.Series:
    """Candidate entity surfaces per chunk (shared-core extraction, so the
    Spark loop and the single-process oracle cannot diverge)."""
    return texts.map(lambda t: [(m["surface"], m["mtype"])
                                for m in core.extract_mentions(t or "")])


@dataclass
class FixpointResult:
    entities: DataFrame          # (entity, first_round) [+ mtype when tagged]
    rounds: int
    new_per_round: list[int] = field(default_factory=list)
    converged: bool = True


class EmbeddingCache:
    """Embed-once corpus embeddings, accumulated lazily across fixpoint
    rounds AND task types (VERDICT round-2 'What's wrong' #1: the loop
    previously re-ran embed_text_udf over the filtered corpus on every
    round x type — up to 16x per chunk; at 100x scale the embedding UDF is
    the dominant avoidable cost).

    Each ``ensure(corpus)`` embeds ONLY the corpus rows not already cached
    (an id-only anti-join) and returns the accumulated (id_cols..., ce)
    table, so every chunk is embedded at most once per job no matter how
    many rounds or task types touch it — strictly cheaper than both
    per-round re-embedding and eager whole-corpus embedding (round-1
    corpora are keyword-filtered subsets). embed_text is deterministic, so
    joining cached vectors is exactly equivalent to recomputing them."""

    def __init__(self, id_cols: tuple[str, ...],
                 text_col: str = "chunk_text"):
        self.id_cols = list(id_cols)
        self.text_col = text_col
        self.df: DataFrame | None = None    # (id_cols..., ce)

    def ensure(self, corpus: DataFrame) -> DataFrame:
        from .udfs import embed_text_udf
        need = corpus.select(*self.id_cols, self.text_col)
        if self.df is not None:
            need = need.join(self.df.select(*self.id_cols), self.id_cols,
                             "left_anti")
        new = need.select(*self.id_cols,
                          embed_text_udf(F.col(self.text_col)).alias("ce"))
        grown = (new if self.df is None
                 else self.df.unionByName(new))
        # eager checkpoint = the one action that pays the embedding cost,
        # once; also truncates the across-round lineage growth
        self.df = grown.localCheckpoint(eager=True)
        return self.df


def fixpoint_loop(chunks: DataFrame, *, round1_corpus, literal_corpus,
                  extract, verify, grow_keywords, max_rounds: int = 8) -> FixpointResult:
    """Generic driver-side fixpoint (C5). All stage arguments are
    DataFrame->DataFrame callables:

    - round1_corpus(chunks) -> corpus            (regex phrase-bank filter)
    - literal_corpus(chunks, keywords) -> corpus (grown literal keywords)
    - extract(corpus) -> DataFrame('entity')     (candidate surfaces)
    - verify(cands) -> DataFrame('entity')       (verified subset)
    - grow_keywords(entities) -> DataFrame('kw') (alias-expanded keywords)

    Returns the verified entity set with the round each entity first
    appeared. Deterministic under any partitioning (set semantics only).
    """
    entities: DataFrame | None = None
    keywords: DataFrame | None = None
    new_per_round: list[int] = []
    converged = False
    rounds = 0
    for rnd in range(1, max_rounds + 1):
        rounds = rnd
        corpus = (round1_corpus(chunks) if keywords is None
                  else literal_corpus(chunks, keywords))
        verified = verify(extract(corpus)).select("entity").distinct()
        new = (verified if entities is None
               else verified.join(entities.select("entity"), "entity",
                                  "left_anti"))
        new = new.withColumn("first_round", F.lit(rnd))
        # one action per round: materializes the truncated lineage AND
        # tests convergence (X2 exceptAll-isEmpty analog)
        entities = (new if entities is None
                    else entities.unionByName(new)).localCheckpoint(eager=True)
        n_new = entities.filter(F.col("first_round") == rnd).count()
        new_per_round.append(n_new)
        if n_new == 0:
            converged = True
            break
        # keywords checkpoint stays LAZY (r6): the eager materialization
        # was a pure extra job per round — measured 1.86 s -> 1.52 s median
        # on the fixpoint_entities bench query (sf1.0, 5 runs). eager=False
        # (rather than no checkpoint at all) still caches the result on
        # first use, so callers whose per-round corpus feeds SEVERAL
        # actions (the retrieval-gated pipeline variant: embed-cache
        # commit, top-k search, hit resolve) do not re-run the keyword
        # derivation — incl. its pandas expand_udf — once per action.
        # Lineage stays truncated through the entities checkpoint.
        keywords = grow_keywords(entities).localCheckpoint(eager=False)
    return FixpointResult(entities=entities, rounds=rounds,
                          new_per_round=new_per_round, converged=converged)


# ---------------------------------------------------------------------------
# Reference-faithful variant over transcript chunks (the pipeline stage)
# ---------------------------------------------------------------------------

_TYPE_BANKS = {
    "DATASET": (core.DATASET_KEYWORDS, DATASET_QUERIES),
    "BASELINE": (core.BASELINE_KEYWORDS, BASELINE_QUERIES),
}


def extraction_fixpoint(chunks: DataFrame, alias_dict: DataFrame, *,
                        mtype: str, top_k: int = 20, max_rounds: int = 8,
                        id_cols: tuple[str, str] = ("conv_id", "chunk_idx"),
                        text_col: str = "chunk_text",
                        embed_cache: EmbeddingCache | None = None) -> FixpointResult:
    """One task-type loop (the reference runs DATASET and BASELINE as
    separate Tasks, models.py:33-41). Retrieval-gated: extraction only sees
    the top-k hit chunks of the type's canned queries.

    ``embed_cache``: shared EmbeddingCache so chunks embed once across
    rounds (and across task types when the caller shares one instance —
    extraction_fixpoint_all does). Created per-call when omitted, which
    still de-duplicates across this loop's rounds."""
    spark = chunks.sparkSession
    embed_cache = embed_cache or EmbeddingCache(id_cols, text_col)
    keywords_bank, queries = _TYPE_BANKS[mtype]
    alternation = core.keyword_alternation(keywords_bank)
    # verification set: broadcast the (small) alias vocabulary to the
    # executors once — the de-externalized verify_entity (C4+J6)
    alias_set = frozenset(
        r["alias"] for r in alias_dict.select("alias").distinct().collect())
    bc_aliases = spark.sparkContext.broadcast(alias_set)

    @pandas_udf(T.BooleanType())
    def verified_udf(surfaces: pd.Series) -> pd.Series:
        lookup = bc_aliases.value
        return surfaces.map(
            lambda s: core.verify_offline(s or "", mtype, lookup))

    def round1_corpus(ch):
        return ch.filter(F.col(text_col).rlike(alternation))

    def literal_corpus(ch, kws):
        # reference rounds>=2: regex=False (re.escape) keyword match over
        # ALL chunks — case-insensitive literal containment, which in Spark
        # is a broadcast theta semi-join (no regex recompilation per round)
        return ch.join(F.broadcast(kws),
                       F.expr(f"contains(lower({text_col}), kw)"),
                       "left_semi")

    def extract(corpus):
        hits = semantic_search(corpus, queries, text_col=text_col,
                               id_cols=list(id_cols), top_k=top_k,
                               embeddings=embed_cache.ensure(corpus))
        hit_chunks = resolve_hit_rows(corpus, hits, id_cols=list(id_cols))
        return (hit_chunks
                .select(F.explode(mention_surfaces_udf(F.col(text_col)))
                        .alias("m"))
                .filter(F.col("m.mtype") == mtype)
                .select(F.col("m.surface").alias("entity")))

    def verify(cands):
        return cands.filter(verified_udf(F.col("entity")))

    def grow_keywords(entities):
        # parenthetical alias mining (:367-373) + lowercase literal forms
        @pandas_udf(T.ArrayType(T.StringType()))
        def expand_udf(ents: pd.Series) -> pd.Series:
            return ents.map(
                lambda e: sorted(a.lower()
                                 for a in core.expand_aliases({e or ""}) if a))
        return (entities
                .select(F.explode(expand_udf(F.col("entity"))).alias("kw"))
                .distinct())

    return fixpoint_loop(chunks, round1_corpus=round1_corpus,
                         literal_corpus=literal_corpus, extract=extract,
                         verify=verify, grow_keywords=grow_keywords,
                         max_rounds=max_rounds)


def extraction_fixpoint_all(chunks: DataFrame, alias_dict: DataFrame, *,
                            top_k: int = 20, max_rounds: int = 8,
                            id_cols: tuple[str, str] = ("conv_id", "chunk_idx"),
                            text_col: str = "chunk_text",
                            embed_cache: EmbeddingCache | None = None) -> tuple[DataFrame, dict]:
    """Both task types (the reference's task fan-out C1), unioned with an
    mtype tag. Returns (entities_df(entity, mtype, first_round), info).
    ONE EmbeddingCache spans both type loops, so a chunk retrieved by both
    DATASET and BASELINE rounds still embeds exactly once (pass one in to
    also reuse/commit it from the caller — pipeline.py commits it as the
    chunk_embeddings table)."""
    outs, info = [], {}
    embed_cache = embed_cache or EmbeddingCache(id_cols, text_col)
    for mtype in ("DATASET", "BASELINE"):
        res = extraction_fixpoint(chunks, alias_dict, mtype=mtype,
                                  top_k=top_k, max_rounds=max_rounds,
                                  id_cols=id_cols, text_col=text_col,
                                  embed_cache=embed_cache)
        outs.append(res.entities.select(
            "entity", F.lit(mtype).alias("mtype"), "first_round"))
        info[mtype] = {"rounds": res.rounds, "converged": res.converged,
                       "new_per_round": res.new_per_round}
    return outs[0].unionByName(outs[1]), info


# ---------------------------------------------------------------------------
# Single-process oracle (shared core — SURVEY §5.2 keystone pattern)
# ---------------------------------------------------------------------------

def oracle_extraction_fixpoint(chunk_rows: list[dict], alias_set: set[str], *,
                               mtype: str, top_k: int = 20,
                               max_rounds: int = 8,
                               id_cols: tuple[str, str] = ("conv_id", "chunk_idx"),
                               text_col: str = "chunk_text") -> dict:
    """Pure-Python mirror of extraction_fixpoint over materialized chunk
    rows. Replicates the Spark side's EXACT retrieval tie-breaking:
    score rounded to 6, rank by (-score, *id_cols)."""
    keywords_bank, queries = _TYPE_BANKS[mtype]
    q_embeds = [core.embed_text(q) for q in queries]
    entities: dict[str, int] = {}
    keywords: list[str] | None = None
    rounds, converged = 0, False
    for rnd in range(1, max_rounds + 1):
        rounds = rnd
        if keywords is None:
            corpus = [c for c in chunk_rows
                      if core.chunk_matches_keywords(c[text_col],
                                                     keywords_bank)]
        else:
            corpus = [c for c in chunk_rows
                      if any(kw in c[text_col].lower() for kw in keywords)]
        # retrieval: top-k per query, Spark-identical ordering
        hit_ids = set()
        scored = [(c, core.embed_text(c[text_col])) for c in corpus]
        for qe in q_embeds:
            ranked = sorted(
                ((round(sum(a * b for a, b in zip(qe, ce)), 6), c)
                 for c, ce in scored),
                key=lambda t: (-t[0],) + tuple(t[1][k] for k in id_cols))
            for _, c in ranked[:top_k]:
                hit_ids.add(tuple(c[k] for k in id_cols))
        hit_chunks = [c for c in corpus
                      if tuple(c[k] for k in id_cols) in hit_ids]
        verified = set()
        for c in hit_chunks:
            for m in core.extract_mentions(c[text_col]):
                if m["mtype"] == mtype and core.verify_offline(
                        m["surface"], mtype, alias_set):
                    verified.add(m["surface"])
        new = verified - set(entities)
        for e in new:
            entities[e] = rnd
        if not new:
            converged = True
            break
        keywords = sorted({a.lower()
                           for e in entities
                           for a in core.expand_aliases({e}) if a})
    return {"entities": entities, "rounds": rounds, "converged": converged}
