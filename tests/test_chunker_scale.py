"""Bounded segmented chunking (VERDICT #3): the streaming chunker equals
the whole-conversation chunker on clean-boundary text, and long
conversations chunk through bounded segment rows instead of one
conversation-sized row."""

from master_project_spark import core
from master_project_spark.datagen import gen_transcripts
from master_project_spark.oracle import oracle_chunks
from master_project_spark.pipeline import chunk_stage_df


def test_streaming_chunker_equals_group_sentences():
    """Core state machine: fed piecewise, emits exactly what
    group_sentences emits on the full sentence list (both quirks: first
    chunk drop, overshoot-by-one)."""
    rows = gen_transcripts(4, 30, seed=5)
    text = " ".join(r["text"] for r in sorted(
        rows, key=lambda r: (r["conv_id"], r["turn_idx"]))
        if r["conv_id"] == rows[0]["conv_id"])
    sentences = core.normalize_and_split(text)
    for max_tokens, overlap in [(50, 2), (100, 1), (30, 0), (200, 2)]:
        want = core.group_sentences(sentences, max_tokens, overlap)
        for piece in (1, 3, 7):
            sc = core.StreamingChunker(max_tokens, overlap)
            got = []
            for i in range(0, len(sentences), piece):
                got.extend(sc.feed_sentences(sentences[i:i + piece]))
            got.extend(sc.finish())
            assert got == want, (max_tokens, overlap, piece)


def test_streaming_feed_text_equals_chunker():
    """feed_text with raw-tail carry across arbitrary cut points equals
    core.chunker on the joined text (cuts at sentence boundaries)."""
    rows = [r for r in gen_transcripts(1, 40, seed=8)]
    rows.sort(key=lambda r: r["turn_idx"])
    texts = [r["text"] for r in rows]
    full = core.chunker(" ".join(texts), max_tokens=200, overlap=2)
    for seg in (1, 4, 9):
        sc = core.StreamingChunker(200, 2)
        got = []
        for i in range(0, len(texts), seg):
            got.extend(sc.feed_text(" ".join(texts[i:i + seg])))
        got.extend(sc.finish())
        assert got == full, seg


def test_segmented_stage_equals_oracle(spark):
    """chunk_stage_df with a tiny segment size (forcing the multi-segment
    path for EVERY conversation) still equals the oracle chunker."""
    rows = gen_transcripts(8, 30, seed=42)
    tdf = spark.createDataFrame(
        [(r["conv_id"], r["turn_idx"], r["text"]) for r in rows],
        "conv_id string, turn_idx int, text string")
    got = sorted((r["conv_id"], r["chunk_idx"], r["chunk_text"])
                 for r in chunk_stage_df(tdf, seg_turns=6).collect())
    want = sorted((c["conv_id"], c["chunk_idx"], c["chunk_text"])
                  for c in oracle_chunks(rows))
    assert got == want


def test_mixed_small_and_large_convs(spark):
    """Routing: single-segment convs use the vectorized path, multi-segment
    the streaming path; both outputs coexist and match the oracle."""
    rows = gen_transcripts(3, 8, seed=3)          # small convs
    rows += [dict(r, conv_id="convBIG") for r in
             gen_transcripts(1, 40, seed=4)]      # one large conv
    tdf = spark.createDataFrame(
        [(r["conv_id"], r["turn_idx"], r["text"]) for r in rows],
        "conv_id string, turn_idx int, text string")
    got = sorted((r["conv_id"], r["chunk_idx"], r["chunk_text"])
                 for r in chunk_stage_df(tdf, seg_turns=10).collect())
    want = sorted((c["conv_id"], c["chunk_idx"], c["chunk_text"])
                  for c in oracle_chunks(rows))
    assert got == want


def test_mega_conversation_bounded(spark):
    """A single 60k-turn conversation (far beyond any fixture) chunks
    through bounded segment rows — the stage completes and chunk indices
    are dense from 0."""
    n = 60_000
    turns = spark.range(n).selectExpr(
        "'convMEGA' AS conv_id", "CAST(id AS INT) AS turn_idx",
        "concat('We trained SparkNet on SQuAD in run ', id, "
        "' with strong results overall.') AS text")
    out = chunk_stage_df(turns, seg_turns=2048)
    stats = out.selectExpr("count(*) AS n", "min(chunk_idx) AS lo",
                           "max(chunk_idx) AS hi").collect()[0]
    assert stats["n"] > 100
    assert stats["lo"] == 0 and stats["hi"] == stats["n"] - 1
