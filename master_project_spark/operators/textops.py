"""Text-analysis operators for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting. All JVM-side Column
expressions (whole-stage codegen; no Python in the hot path) so they compose
freely with scans and keep predicate pushdown intact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_RE = "[A-Za-z0-9]+"

# Minimal per-language stopword cues (n-gram heuristic language-ID).
LANG_STOPWORDS = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|was)\b",
    "de": r"\b(der|die|das|und|nicht|ist|ein|mit|auf|für)\b",
    "fr": r"\b(le|la|les|et|des|un|une|est|dans|pour)\b",
    "es": r"\b(el|la|los|las|y|de|que|en|un|por)\b",
}


def tokens(col: str | Column) -> Column:
    return F.regexp_extract_all(col, F.lit(TOKEN_RE), F.lit(0))


def token_count(col: str | Column) -> Column:
    """F20 — token counting (pydash words analog)."""
    return F.size(tokens(col))


def lang_scores(col: str | Column) -> dict[str, Column]:
    low = F.lower(col)
    return {lang: F.size(F.regexp_extract_all(low, F.lit(pat), F.lit(0)))
            for lang, pat in LANG_STOPWORDS.items()}


def predict_lang(col: str | Column) -> Column:
    """argmax over stopword-hit counts; 'unk' when nothing matches.
    Deterministic tie-break: language key order en < de < fr < es by
    greatest-first comparison chain."""
    scores = lang_scores(col)
    best = None
    best_score = None
    for lang in ("en", "de", "fr", "es"):
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("unk"))


def quality_features(col: str | Column) -> dict[str, Column]:
    """Length / punctuation / stopword ratios (quality scoring)."""
    n_tok = F.greatest(token_count(col), F.lit(1))
    n_chars = F.length(col)
    n_punct = F.size(F.regexp_extract_all(col, F.lit(r"[.,;:!?]"), F.lit(0)))
    n_stop = F.size(F.regexp_extract_all(
        F.lower(col), F.lit(LANG_STOPWORDS["en"]), F.lit(0)))
    return {
        "n_tokens": token_count(col),
        "n_chars": n_chars,
        "chars_per_token": F.round(n_chars.cast("double") / n_tok, 4),
        "punct_ratio": F.round(n_punct.cast("double") / n_tok, 4),
        "stopword_ratio": F.round(n_stop.cast("double") / n_tok, 4),
    }


def quality_score(col: str | Column) -> Column:
    """Composite [0,1] quality score: penalize extreme token lengths, no
    stopwords, heavy punctuation. Deterministic, monotone in each feature."""
    f = quality_features(col)
    len_ok = F.when((f["chars_per_token"] >= 2.5)
                    & (f["chars_per_token"] <= 12), 1.0).otherwise(0.5)
    stop_ok = F.least(f["stopword_ratio"] * 5, F.lit(1.0))
    punct_ok = F.when(f["punct_ratio"] <= 0.3, 1.0).otherwise(0.5)
    return F.round(len_ok * 0.4 + stop_ok * 0.4 + punct_ok * 0.2, 4)


def fingerprint(col: str | Column) -> Column:
    """Document fingerprint: md5 over the whitespace-normalized lowercase
    text (rolling-hash analog; exact-dedup key)."""
    return F.md5(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))))


def shingle_fingerprint(col: str | Column, n: int = 3) -> Column:
    """Order-sensitive shingled fingerprint: md5 of the sorted distinct
    word n-grams (near-dup key robust to local edits)."""
    toks = tokens(col)
    shingles = F.expr(
        f"transform(sequence(0, greatest(size(regexp_extract_all({_sql(col)}, "
        f"'{TOKEN_RE}', 0)) - {n}, 0)), i -> concat_ws(' ', "
        f"slice(regexp_extract_all({_sql(col)}, '{TOKEN_RE}', 0), i + 1, {n})))")
    return F.md5(F.concat_ws("|", F.sort_array(F.array_distinct(shingles))))


def _sql(col: str | Column) -> str:
    if isinstance(col, str):
        return col
    raise ValueError("shingle_fingerprint needs a column NAME")


def annotate(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach lang + quality features + fingerprint."""
    feats = quality_features(F.col(text_col))
    out = df.withColumn("predicted_lang", predict_lang(F.col(text_col)))
    for name, c in feats.items():
        out = out.withColumn(name, c)
    return (out
            .withColumn("quality", quality_score(F.col(text_col)))
            .withColumn("fingerprint", fingerprint(F.col(text_col))))
