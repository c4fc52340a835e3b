"""Operator-library tests: dedup, similarity, textops, multimodal,
streaming (SURVEY.md §2 + the training-data-pipeline operators)."""

import math

import pytest
from pyspark.sql import functions as F

from master_project_spark.operators import dedup, multimodal, similarity, textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog"),   # near dup
        (3, "completely different text about spark pipelines and shuffles"),
        (4, "Der schnelle braune Fuchs springt über den faulen Hund und das"),
        (5, "le renard brun rapide saute par dessus le chien paresseux dans"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


# ------------------------------------------------------------------ dedup

def test_exact_dedup(docs):
    got = {r["fp"]: (r["keep_id"], r["n_dups"])
           for r in dedup.exact_dedup(docs).collect()}
    dups = [v for v in got.values() if v[1] > 1]
    assert dups == [(0, 2)]


def test_bow_dedup(docs):
    got = [r for r in dedup.bow_dedup(docs).collect() if r["n_dups"] > 1]
    assert len(got) == 1 and got[0]["keep_id"] == 0


def test_minhash_lsh_pairs(docs):
    pairs, dropped = dedup.minhash_lsh_pairs(docs, min_agree=8)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got          # exact dup must be a candidate
    assert (2, 3) not in got      # unrelated text must not
    assert dropped == 0


def test_simhash_near_dups(docs):
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dedup.simhash_near_dups(docs, max_hamming=10).collect()}
    assert got[(0, 1)] == 0
    assert (0, 2) in got          # one-word edit stays within hamming 10
    assert (0, 3) not in got


def test_ngram_jaccard_pairs(docs):
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert got[(0, 1)] == 1.0
    # one-word edit on 9 tokens: 4 shared of 10 distinct trigrams = 0.4
    assert got[(0, 2)] == 0.4
    assert (0, 3) not in got


@pytest.fixture(scope="module")
def vectors(spark):
    import random
    rng = random.Random(7)
    rows = []
    for i in range(40):
        base = [0.0] * 8
        base[i % 4] = 1.0
        rows.append((i, [v + rng.uniform(-0.05, 0.05) for v in base]))
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def test_embedding_cosine_pairs(vectors):
    pairs = dedup.embedding_cosine_pairs(
        vectors.filter("vec_id < 12"), threshold=0.95).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 4) in got          # same axis -> cosine ~1
    assert (0, 1) not in got      # orthogonal axes


# ------------------------------------------------------------- similarity

def test_brute_force_topk(vectors):
    queries = vectors.filter("vec_id < 2")
    corpus = vectors.filter("vec_id >= 2")
    got = similarity.brute_force_topk(queries, corpus, k=5)
    rows = got.collect()
    assert {r["query_id"] for r in rows} == {0, 1}
    by_q = {q: sorted((r["rank"], r["corpus_id"], r["score"])
                      for r in rows if r["query_id"] == q) for q in (0, 1)}
    # top hit for query 0 (axis 0) must be an axis-0 vector (id % 4 == 0)
    assert by_q[0][0][1] % 4 == 0
    assert all(len(v) == 5 for v in by_q.values())


def test_lsh_ann_topk_agrees_with_exact_on_top1(vectors):
    queries = vectors.filter("vec_id < 2")
    corpus = vectors.filter("vec_id >= 2")
    exact = {(r["query_id"], r["rank"]): r["corpus_id"]
             for r in similarity.brute_force_topk(
                 queries, corpus, k=1).collect()}
    ann = {(r["query_id"], r["rank"]): r["corpus_id"]
           for r in similarity.lsh_ann_topk(
               queries, corpus, k=1, n_planes=4, dim=8).collect()}
    # ANN top-1 equals exact top-1 when the bucket captured it; with
    # axis-aligned clusters and 4 planes it must for at least one query
    assert any(ann.get(k) == v for k, v in exact.items())


# ---------------------------------------------------------------- textops

def test_predict_lang(spark):
    rows = [(0, "the cat and the dog sat on the mat with the hat"),
            (1, "der hund und die katze sind nicht auf der matte ein"),
            (2, "le chien et la chatte sont dans un jardin pour les"),
            (3, "xqz zzz qqq")]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r["id"]: r["lang"] for r in df.select(
        "id", textops.predict_lang(F.col("text")).alias("lang")).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "unk"}


def test_quality_and_fingerprint(spark):
    df = spark.createDataFrame(
        [(0, "The quick brown fox jumps over the lazy dog."),
         (1, "?!?! ,,,, ....  !!"),
         (2, "the   QUICK  brown fox jumps over the lazy dog.")],
        "id int, text string")
    out = textops.annotate(df).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[0]["quality"] > by_id[1]["quality"]
    assert 0 < by_id[0]["quality"] <= 1.0
    # fingerprint is whitespace/case robust
    assert by_id[0]["fingerprint"] == by_id[2]["fingerprint"]


def test_token_count_matches_python(spark):
    import re
    text = "Spark 4.1 runs fast-UDFs over 100TB"
    expected = len(re.findall("[A-Za-z0-9]+", text))
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(textops.token_count(F.col("text")).alias("n")).collect()
    assert got[0]["n"] == expected


def _np_kmeans_oracle(ids, vecs, n_cells, n_iter):
    """Single-process mirror of similarity.kmeans_centroids: farthest-first
    seeding on 6-dp-rounded cosine (ties by id), Lloyd with 6-dp-rounded
    per-dim means, empty cells keep their centroid."""
    import numpy as np

    def cos6(a, b):
        n = float(np.linalg.norm(a)) * float(np.linalg.norm(b))
        if n == 0.0:             # zero-norm guard, mirrors similarity.cos6
            return 0.0
        return round(float(np.dot(a, b)) / n, 6)

    order = np.argsort(ids)
    ids = [ids[i] for i in order]
    vecs = [np.asarray(vecs[i], dtype=np.float64) for i in order]
    seeds = [vecs[0].copy()]
    for _ in range(1, n_cells):
        best = [(max(cos6(v, s) for s in seeds), ids[i])
                for i, v in enumerate(vecs)]
        # MIN best-similarity = farthest; ties by id ascending
        pick = min(range(len(vecs)), key=lambda i: (best[i][0], best[i][1]))
        seeds.append(vecs[pick].copy())
    cents = [s.copy() for s in seeds]
    for _ in range(n_iter):
        assign = []
        for v in vecs:
            sims = [cos6(v, c) for c in cents]
            # max sim, ties by LOWEST cell_id (matches the window order)
            assign.append(max(range(n_cells),
                              key=lambda j: (sims[j], -j)))
        for j in range(n_cells):
            members = [vecs[i] for i in range(len(vecs)) if assign[i] == j]
            if members:
                cents[j] = np.round(np.mean(members, axis=0), 6)
    return cents


def test_kmeans_centroids_match_numpy_oracle(spark):
    """similarity.kmeans_centroids is deterministic and equals the
    single-process oracle (seeding choices exactly; Lloyd means to within
    float-sum-order noise far below the 6-dp rounding)."""
    import numpy as np

    from master_project_spark.operators.similarity import kmeans_centroids

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet") \
        .filter(F.col("vec_id") < 120)
    rows = e.collect()
    ids = [r["vec_id"] for r in rows]
    vecs = [[float(x) for x in r["embedding"]] for r in rows]

    got = {r["cell_id"]: np.asarray(r["cv"])
           for r in kmeans_centroids(e, n_cells=4, n_iter=3).collect()}
    want = _np_kmeans_oracle(ids, vecs, n_cells=4, n_iter=3)
    assert sorted(got) == [0, 1, 2, 3]
    for j in range(4):
        assert np.allclose(got[j], want[j], atol=2e-6), j
    # deterministic across invocations
    again = {r["cell_id"]: np.asarray(r["cv"])
             for r in kmeans_centroids(e, n_cells=4, n_iter=3).collect()}
    for j in range(4):
        assert np.array_equal(got[j], again[j])


def test_ivf_fixture_matches_trainer(spark):
    """The committed fixtures_ivf.IVF_CENTROIDS ARE the trainer's output
    (round-4 VERDICT ask #6): re-running kmeans_centroids with the
    fixture's documented provenance (sf0.01 embeddings vec_id >= 8,
    n_cells=8, n_iter=3) reproduces every frozen value exactly, and the
    hash-checked ann_ivf_fixed_topk query equals the rows-only
    ann_ivf_trained_topk (same index -> same probe/rescore output)."""
    from master_project_spark.entry_queries import (ann_ivf_fixed_topk,
                                                    ann_ivf_trained_topk)
    from master_project_spark.fixtures_ivf import IVF_CENTROIDS
    from master_project_spark.operators.similarity import kmeans_centroids

    sf_dir = "/root/testdata/sf0.01"
    c = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .filter(F.col("vec_id") >= 8)
    trained = {r["cell_id"]: [float(x) for x in r["cv"]]
               for r in kmeans_centroids(c, n_cells=8, n_iter=3).collect()}
    assert trained == {cid: vec for cid, vec in IVF_CENTROIDS}

    fixed = sorted(map(tuple, ann_ivf_fixed_topk(spark, sf_dir).collect()))
    live = sorted(map(tuple, ann_ivf_trained_topk(spark, sf_dir).collect()))
    assert fixed == live


def test_ivf_kmeans_recall_at_10(spark):
    """Recall@10 of the IVF probe vs exact brute force on the embeddings
    table, for both quantizers. The trained k-means centroids must be a
    usable index (recall well above the nprobe/n_cells random-cell floor);
    both numbers are reported in BENCH/BASELINE.md."""
    from master_project_spark.operators.similarity import (
        brute_force_topk, ivf_ann_topk, kmeans_centroids)

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q, c = e.filter(F.col("vec_id") < 8), e.filter(F.col("vec_id") >= 8)
    exact = brute_force_topk(q, c, k=10)
    gold = {}
    for r in exact.collect():
        gold.setdefault(r["query_id"], set()).add(r["corpus_id"])

    def recall(df):
        hits = {}
        for r in df.collect():
            hits.setdefault(r["query_id"], set()).add(r["corpus_id"])
        return sum(len(hits.get(qid, set()) & g) / len(g)
                   for qid, g in gold.items()) / len(gold)

    cents = kmeans_centroids(c, n_cells=8, n_iter=5,
                             cid="vec_id", cvec="embedding")
    r_kmeans = recall(ivf_ann_topk(q, c, k=10, n_cells=8, nprobe=2,
                                   centroids=cents))
    r_toy = recall(ivf_ann_topk(q, c, k=10, n_cells=8, nprobe=2))
    print(f"\nIVF recall@10 (nprobe=2/8): kmeans={r_kmeans:.3f} "
          f"lowest-id={r_toy:.3f}")
    assert r_kmeans >= 0.5          # far above the 0.25 random-cell floor


# ------------------------------------------------------------- multimodal

def test_image_features_stub(spark):
    """Unrecognized containers (no codec in this sandbox) still flow
    through the same seam with the deterministic stand-in features."""
    rows = [("m1", "image", bytearray(b"fake-image-bytes-1"), "{}"),
            ("m2", "image", bytearray(b"fake-image-bytes-2"), "{}"),
            ("m3", "audio", bytearray(b"fake-audio"), "{}")]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = multimodal.image_features(media).collect()
    assert {r["media_id"] for r in feats} == {"m1", "m2"}  # audio filtered
    r = [x for x in feats if x["media_id"] == "m1"][0]
    assert r["n_bytes"] == 18
    assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
    # deterministic across runs
    again = multimodal.image_features(media).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))


# --- independent encoders (forward filters / container headers written by
# --- hand here, so the decoder is checked against different math)

def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data)))


def _encode_png(pixels, ctype: int, filters=None) -> bytes:
    """pixels: list of rows, each a list of per-pixel channel tuples."""
    import struct
    import zlib
    nch = {0: 1, 2: 3, 6: 4}[ctype]
    h, w = len(pixels), len(pixels[0])
    filters = filters or [0] * h
    raw = bytearray()
    prev = bytes(w * nch)
    for row, ft in zip(pixels, filters):
        line = bytes(v for px in row for v in px)
        raw.append(ft)
        for i in range(len(line)):
            a = line[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if ft == 0:
                raw.append(line[i])
            elif ft == 1:
                raw.append((line[i] - a) & 0xFF)
            elif ft == 2:
                raw.append((line[i] - b) & 0xFF)
            elif ft == 3:
                raw.append((line[i] - ((a + b) >> 1)) & 0xFF)
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                raw.append((line[i] - pr) & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def test_png_decode_real_pixels():
    """True width/height/mean-luma from actual encoded PNG bytes, across
    every filter type and gray/RGB/RGBA color types."""
    from master_project_spark.operators.multimodal import _decode_image

    # 3x2 RGB, filter 0: known BT.601 luma
    px = [[(255, 0, 0), (0, 255, 0), (0, 0, 255)],
          [(255, 255, 255), (0, 0, 0), (128, 128, 128)]]
    w, h, luma = _decode_image(_encode_png(px, ctype=2))
    want = (0.299 * 255 + 0.587 * 255 + 0.114 * 255      # r+g+b pixels
            + 255 + 0 + 128) / 6 / 255.0
    assert (w, h) == (3, 2)
    assert abs(luma - want) < 1e-6

    # 4x5 grayscale exercising filters Sub/Up/Average/Paeth on real data
    rows = [[(v,) for v in (10, 200, 30, 77)],
            [(v,) for v in (0, 13, 255, 8)],
            [(v,) for v in (1, 2, 3, 4)],
            [(v,) for v in (250, 249, 3, 128)],
            [(v,) for v in (42, 42, 42, 42)]]
    flat = [v for row in rows for (v,) in row]
    for filt in (0, 1, 2, 3, 4):
        w, h, luma = _decode_image(
            _encode_png(rows, ctype=0, filters=[filt] * 5))
        assert (w, h) == (4, 5), filt
        assert abs(luma - sum(flat) / len(flat) / 255.0) < 1e-6, filt
    # mixed filters
    w, h, luma = _decode_image(
        _encode_png(rows, ctype=0, filters=[0, 1, 2, 3, 4]))
    assert abs(luma - sum(flat) / len(flat) / 255.0) < 1e-6

    # RGBA: alpha ignored by luma
    px = [[(10, 20, 30, 0), (10, 20, 30, 255)]]
    w, h, luma = _decode_image(_encode_png(px, ctype=6, filters=[4]))
    assert (w, h) == (2, 1)
    assert abs(luma - (0.299 * 10 + 0.587 * 20 + 0.114 * 30) / 255.0) < 1e-6


def test_bmp_and_ppm_decode_real_pixels():
    import struct

    from master_project_spark.operators.multimodal import _decode_image

    # 3x2 24-bit BMP, bottom-up, rows padded to 4 bytes (9 -> 12)
    rows_bgr = [[(0, 0, 255), (0, 255, 0), (255, 0, 0)],     # image row 0
                [(255, 255, 255), (0, 0, 0), (128, 128, 128)]]
    raster = b""
    for row in reversed(rows_bgr):                           # bottom-up
        line = bytes(v for px in row for v in px)
        raster += line + b"\x00" * (12 - len(line))
    header = (b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0,
                            len(raster), 2835, 2835, 0, 0))
    w, h, luma = _decode_image(header + raster)
    want = (0.299 * 255 + 0.587 * 255 + 0.114 * 255
            + 255 + 0 + 128) / 6 / 255.0
    assert (w, h) == (3, 2)
    assert abs(luma - want) < 1e-6

    # PPM P6 with a header comment
    px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    ppm = b"P6\n# test comment\n2 2\n255\n" + px
    w, h, luma = _decode_image(ppm)
    want = (0.299 * 255 + 0.587 * 255 + 0.114 * 255 + 9) / 4 / 255.0
    assert (w, h) == (2, 2)
    assert abs(luma - want) < 1e-6


def test_image_features_spark_path_with_real_png(spark):
    """The mapInPandas operator end-to-end over real encoded bytes."""
    png = _encode_png([[(0, 0, 0), (255, 255, 255)]], ctype=2)
    media = spark.createDataFrame(
        [("real1", "image", bytearray(png), "{}")], multimodal.MEDIA_SCHEMA)
    r = multimodal.image_features(media).collect()[0]
    assert (r["width"], r["height"]) == (2, 1)
    assert abs(r["mean_luma"] - 0.5) < 1e-6
    assert r["n_bytes"] == len(png)


def test_frame_sample_and_resize_plan(spark):
    media = spark.createDataFrame(
        [("v1", "video", bytearray(b"x"), '{"duration_s": 12}')],
        multimodal.MEDIA_SCHEMA)
    frames = multimodal.frame_sample_plan(media, every_n_seconds=5).collect()
    assert [r["ts_offset_s"] for r in frames] == [0, 5, 10]
    dims = spark.createDataFrame([("v1", 640, 360)],
                                 "media_id string, width int, height int")
    plan = multimodal.resize_plan(dims, max_side=256).collect()[0]
    assert plan["out_width"] == 256 and plan["out_height"] == 144


# -------------------------------------------------------------- streaming

def test_streaming_extraction(spark, tmp_path):
    from master_project_spark.datagen import transcripts_df
    from master_project_spark.streaming.stream_pipeline import run_to_memory

    inp = str(tmp_path / "stream_in")
    transcripts_df(spark, 10, 8, seed=5).write.parquet(inp)
    q = run_to_memory(spark, inp, query_name="t_stream")
    try:
        q.processAllAvailable()
        got = spark.table("t_stream").collect()
    finally:
        q.stop()
    assert got, "windowed triple counts must be non-empty"
    assert sum(r["n_triples"] for r in got) > 0
    assert all(r["window_end"] > r["window_start"] for r in got)


# -------------------------------------------------------------- retrieval

def test_semantic_search_and_resolve(spark):
    from master_project_spark.operators import retrieval
    corpus = spark.createDataFrame(
        [("c1", 0, "datasets employed for analysis of results"),
         ("c1", 1, "the weather is nice today outside"),
         ("c2", 0, "data sources referenced in the appendix")],
        "conv_id string, chunk_idx int, chunk_text string")
    hits = retrieval.semantic_search(
        corpus, ["Datasets employed for analysis"], top_k=2)
    rows = hits.collect()
    assert len(rows) == 2
    # the lexically-overlapping chunk must rank first
    top = [r for r in rows if r["rank"] == 1][0]
    assert top["conv_id"] == "c1" and top["chunk_idx"] == 0
    resolved = retrieval.resolve_hit_rows(corpus, hits)
    assert resolved.count() == 2


def test_query_embeddings_deterministic(spark):
    from master_project_spark.operators import retrieval
    a = retrieval.query_embeddings_df(spark, ["alpha beta"]).collect()
    b = retrieval.query_embeddings_df(spark, ["alpha beta"]).collect()
    assert a == b


def test_stateful_conversation_progress(spark, tmp_path):
    """applyInPandasWithState custom stateful operator: running per-conv
    progress counters match a batch recomputation; state is per-conv and
    update-mode emits one row per conv per microbatch."""
    from master_project_spark.datagen import (gen_transcripts,
                                              transcripts_spark_schema)
    from master_project_spark.oracle import oracle_triples
    from master_project_spark.streaming.stream_pipeline import (
        conversation_progress_stateful)

    rows = gen_transcripts(6, 10, seed=41)
    in_dir = str(tmp_path / "stream_in")
    spark.createDataFrame(rows, transcripts_spark_schema()) \
        .write.parquet(in_dir)

    stream = (spark.readStream.schema(transcripts_spark_schema())
              .parquet(in_dir))
    q = (conversation_progress_stateful(stream)
         .writeStream.format("memory").queryName("conv_progress")
         .outputMode("update").start())
    try:
        # NB: processAllAvailable() never returns here — processing-time
        # timeouts keep triggering empty state-cleanup microbatches by
        # design. Poll for the expected conversations instead.
        import time
        n_convs = len({r["conv_id"] for r in rows})
        deadline = time.time() + 120
        got = {}
        while time.time() < deadline:
            got = {r["conv_id"]: (r["n_turns"], r["n_triples"],
                                  r["last_turn_idx"], r["closed"])
                   for r in spark.table("conv_progress").collect()}
            if len(got) == n_convs:
                break
            time.sleep(1)
    finally:
        q.stop()

    from collections import Counter, defaultdict
    want_turns = Counter(r["conv_id"] for r in rows)
    want_last = defaultdict(int)
    for r in rows:
        want_last[r["conv_id"]] = max(want_last[r["conv_id"]], r["turn_idx"])
    want_triples = Counter(t["conv_id"] for t in oracle_triples(rows))
    assert set(got) == set(want_turns)
    for conv_id, (n_turns, n_triples, last_idx, closed) in got.items():
        assert n_turns == want_turns[conv_id]
        assert n_triples == want_triples.get(conv_id, 0)
        assert last_idx == want_last[conv_id]
        assert closed is False  # no idle timeout elapsed in-test


def test_jpeg_sof_dimensions_real_header():
    """Round-4 ask #7: JPEG width/height come from a REAL SOF marker walk
    (luma stays the documented stand-in). Fixture bytes are a hand-built
    minimal JPEG: SOI + APP0 + DQT + SOF0(17x23) + SOS stub + EOI."""
    import struct
    from master_project_spark.operators.multimodal import (_decode_image,
                                                           _jpeg_dimensions)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
            + payload

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes(64))
    sof0 = seg(0xC0, b"\x08" + struct.pack(">HH", 23, 17)   # h=23, w=17
               + b"\x03\x01\x11\x00\x02\x11\x00\x03\x11\x00")
    jpg = b"\xff\xd8" + app0 + dqt + sof0 + seg(0xDA, b"\x01\x01\x00") \
        + b"\xff\xd9"
    assert _jpeg_dimensions(jpg) == (17, 23)
    w, h, luma = _decode_image(jpg)
    assert (w, h) == (17, 23)
    assert 0.0 <= luma <= 1.0
    # progressive (SOF2) works too
    jpg2 = jpg.replace(b"\xff\xc0", b"\xff\xc2")
    assert _jpeg_dimensions(jpg2) == (17, 23)


def test_corrupt_images_fall_back_never_raise(spark):
    """ADVICE (medium, round 4): any undecodable payload must fall back to
    the deterministic stand-in instead of raising — one bad image cannot
    fail the whole Spark stage."""
    import struct
    import zlib
    from master_project_spark.operators import multimodal
    from master_project_spark.operators.multimodal import _decode_image

    good = _encode_png([[(10, 20, 30)] * 4] * 3, ctype=2)
    bad = [
        good[:40],                                    # truncated PNG (zlib)
        b"\x89PNG\r\n\x1a\n" + _png_chunk(            # 16-bit depth PNG
            b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + _png_chunk(b"IEND", b""),
        b"BM" + b"\x00" * 20,                         # short BMP header
        b"BM" + b"\x00" * 12 + struct.pack("<ii", 4, 4)
        + b"\x00" * 2 + struct.pack("<H", 24) + struct.pack("<I", 1)
        + b"\x00" * 20,                               # RLE BMP
        b"P6 2 2 65535\n" + b"\x00" * 24,             # 16-bit PPM
        b"P6 2 2 255\n" + b"\x00" * 3,                # short PPM raster
        b"\xff\xd8\xff\xd9",                          # JPEG with no SOF
        b"",                                          # empty payload
    ]
    for payload in bad:
        w, h, luma = _decode_image(payload)           # must not raise
        assert w > 0 and h > 0 and 0.0 <= luma <= 1.0

    # and through the actual Spark stage: one good + all bad completes
    rows = [("ok", "image", bytearray(good), "{}")] + [
        (f"bad{i}", "image", bytearray(p), "{}")
        for i, p in enumerate(bad)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in
             multimodal.image_features(media).collect()}
    assert len(feats) == 1 + len(bad)
    assert (feats["ok"]["width"], feats["ok"]["height"]) == (4, 3)


def test_png_unfilter_vectorized_matches_scalar_and_is_faster():
    """Round-4 ask #8: the numpy Up/Sub unfilter paths must be
    byte-identical to the scalar reference and materially faster on a
    1024x1024 RGB image."""
    import time
    from master_project_spark.operators.multimodal import _png_unfilter

    def scalar_unfilter(raw, width, height, bpp):
        # the pre-round-4 per-byte reference implementation
        stride = width * bpp
        out = bytearray(height * stride)
        pos = 0
        for y in range(height):
            ftype = raw[pos]; pos += 1
            line = bytearray(raw[pos:pos + stride]); pos += stride
            prev_off = (y - 1) * stride
            if ftype == 1:
                for i in range(bpp, stride):
                    line[i] = (line[i] + line[i - bpp]) & 0xFF
            elif ftype == 2:
                if y:
                    for i in range(stride):
                        line[i] = (line[i] + out[prev_off + i]) & 0xFF
            elif ftype == 3:
                for i in range(stride):
                    a = line[i - bpp] if i >= bpp else 0
                    b = out[prev_off + i] if y else 0
                    line[i] = (line[i] + ((a + b) >> 1)) & 0xFF
            elif ftype == 4:
                for i in range(stride):
                    a = line[i - bpp] if i >= bpp else 0
                    b = out[prev_off + i] if y else 0
                    c = out[prev_off + i - bpp] if (y and i >= bpp) else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                    line[i] = (line[i] + pr) & 0xFF
            out[y * stride:(y + 1) * stride] = line
        return out

    import random
    rng = random.Random(5)
    w = h = 96                          # full filter matrix, all 5 types
    bpp = 3
    raw = bytearray()
    for y in range(h):
        raw.append(y % 5)
        raw.extend(rng.randrange(256) for _ in range(w * bpp))
    assert bytes(_png_unfilter(bytes(raw), w, h, bpp)) == \
        bytes(scalar_unfilter(bytes(raw), w, h, bpp))

    # throughput on the photographic common case (Sub/Up rows), 1024^2 RGB
    w = h = 1024
    raw = bytearray()
    for y in range(h):
        raw.append(1 if y % 2 else 2)
        raw.extend((y * 31 + i) % 256 for i in range(w * bpp))
    raw = bytes(raw)
    t0 = time.perf_counter(); fast = _png_unfilter(raw, w, h, bpp)
    t_fast = time.perf_counter() - t0
    t0 = time.perf_counter(); slow = scalar_unfilter(raw, w, h, bpp)
    t_slow = time.perf_counter() - t0
    assert bytes(fast) == bytes(slow)
    ratio = t_slow / max(t_fast, 1e-9)
    print(f"png_unfilter 1024x1024 RGB speedup: {ratio:.1f}x "
          f"({t_slow:.3f}s -> {t_fast:.3f}s)")
    assert ratio >= 2.0, ratio          # >=5x typical; 2x floor for CI noise


def test_ann_ivf_trained_query_exact_vs_oracle_quantizer(spark):
    """Round-4 ask #5: the trained-quantizer IVF contract entry
    (entry_queries.ann_ivf_trained_topk) equals, row-for-row, the same
    probe/rescore fed by the independently computed NumPy-oracle
    centroids — the production index-build path is pytest-EXACT."""
    from master_project_spark.entry_queries import ann_ivf_trained_topk
    from master_project_spark.operators.similarity import ivf_ann_topk

    sf_dir = "/root/testdata/sf0.01"
    got = sorted(map(tuple, ann_ivf_trained_topk(spark, sf_dir).collect()))

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c = e.filter(F.col("vec_id") >= 8)
    rows = (c.withColumn("h", F.xxhash64("vec_id"))
            .orderBy("h", "vec_id").limit(8 * 64)
            .select("vec_id", "embedding").collect())
    ids = [r["vec_id"] for r in rows]
    vecs = [[float(x) for x in r["embedding"]] for r in rows]
    oracle_cents = _np_kmeans_oracle(ids, vecs, n_cells=8, n_iter=3)
    cents_df = spark.createDataFrame(
        [(i, [float(x) for x in cv]) for i, cv in enumerate(oracle_cents)],
        "cell_id int, cv array<double>")
    want = sorted(map(tuple, ivf_ann_topk(
        e.filter(F.col("vec_id") < 8), c, k=10, n_cells=8, nprobe=2,
        centroids=cents_df)
        .withColumn("rank", F.col("rank").cast("int")).collect()))
    assert got == want and len(got) > 0


# --- JPEG baseline decode (round-4 VERDICT #7, delivered round 5) -------
# The encoder below is written BY HAND from T.81 Annex C/F (canonical
# code assignment, magnitude categories, byte stuffing) and the pixel
# oracle is a naive double-loop IDCT with an ALGORITHMICALLY generated
# zigzag — no constant or helper is shared with the decoder under test.

def _jseg(marker: int, payload: bytes) -> bytes:
    import struct
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
        + payload


def _gen_zigzag():
    """Zigzag order generated from the diagonal-walk definition (odd
    diagonals descend, even ascend) — independent of the decoder's
    hardcoded table."""
    return sorted(((r, c) for r in range(8) for c in range(8)),
                  key=lambda rc: (rc[0] + rc[1],
                                  rc[0] if (rc[0] + rc[1]) % 2 else -rc[0]))


def _canon_codes(counts, symbols):
    """symbol -> (code, length) by T.81 Annex C canonical assignment."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _JBitWriter:
    def __init__(self):
        self.acc = self.n = 0
        self.out = bytearray()

    def put(self, val: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:                      # byte stuffing
                    self.out.append(0x00)
                self.acc = self.n = 0

    def flush(self) -> bytes:
        while self.n:
            self.put(1, 1)                                # pad with 1s
        return bytes(self.out)


def _put_signed(bw, codes, prefix_sym_of_size, v):
    """Emit (huffman symbol for category s) + s magnitude bits for v."""
    s = abs(v).bit_length()
    code, length = codes[prefix_sym_of_size(s)]
    bw.put(code, length)
    if s:
        bw.put(v if v > 0 else v + (1 << s) - 1, s)


def _write_block(bw, dc_codes, ac_codes, dc_diff, ac_rle, eob=True):
    """ac_rle: list of (zero_run, value) in zigzag order after the DC."""
    _put_signed(bw, dc_codes, lambda s: s, dc_diff)
    for run, val in ac_rle:
        while run > 15:
            code, length = ac_codes[0xF0]                 # ZRL
            bw.put(code, length)
            run -= 16
        s = abs(val).bit_length()
        code, length = ac_codes[(run << 4) | s]
        bw.put(code, length)
        bw.put(val if val > 0 else val + (1 << s) - 1, s)
    if eob:
        code, length = ac_codes[0x00]
        bw.put(code, length)


#: all test symbols at code length 4 (<=15 of 16 codes, all-ones avoided)
_T_DC_COUNTS = [0, 0, 0, 8] + [0] * 12
_T_DC_SYMS = list(range(8))
_T_AC_SYMS = [0x00, 0x01, 0x02, 0x03, 0x04, 0x05,
              0x11, 0x12, 0x13, 0x21, 0x22, 0x23, 0x31, 0xF0]
_T_AC_COUNTS = [0, 0, 0, len(_T_AC_SYMS)] + [0] * 12
_DC_CODES = _canon_codes(_T_DC_COUNTS, _T_DC_SYMS)
_AC_CODES = _canon_codes(_T_AC_COUNTS, _T_AC_SYMS)


def _jpeg_bytes(width, height, comps, qtabs, scan_data, dri=0):
    """Assemble SOI..EOI. comps: [(cid, h, v, tq, td, ta)]; qtabs:
    {tq: 64 zigzag values}; scan_data: already entropy-coded bytes."""
    import struct
    out = b"\xff\xd8"
    for tq, vals in sorted(qtabs.items()):
        out += _jseg(0xDB, bytes([tq]) + bytes(vals))
    dht = b""
    for tc in (0, 1):
        counts = _T_DC_COUNTS if tc == 0 else _T_AC_COUNTS
        syms = _T_DC_SYMS if tc == 0 else _T_AC_SYMS
        dht += bytes([tc << 4]) + bytes(counts) + bytes(syms)
    out += _jseg(0xC4, dht)
    if dri:
        out += _jseg(0xDD, struct.pack(">H", dri))
    sof = b"\x08" + struct.pack(">HH", height, width) + bytes([len(comps)])
    for cid, h, v, tq, _td, _ta in comps:
        sof += bytes([cid, (h << 4) | v, tq])
    out += _jseg(0xC0, sof)
    sos = bytes([len(comps)])
    for cid, _h, _v, _tq, td, ta in comps:
        sos += bytes([cid, (td << 4) | ta])
    out += _jseg(0xDA, sos + b"\x00\x3f\x00")
    return out + scan_data + b"\xff\xd9"


def _oracle_block_pixels(zz_coeffs, qt_zz):
    """Naive T.81 A.3.3 IDCT (double loop, math.cos) + level shift."""
    zz = _gen_zigzag()
    fm = [[0.0] * 8 for _ in range(8)]
    for i, (r, c) in enumerate(zz):
        fm[r][c] = zz_coeffs[i] * qt_zz[i]

    def cc(u):
        return 1.0 / math.sqrt(2.0) if u == 0 else 1.0

    px = [[0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (cc(u) * cc(v) * fm[u][v]
                          * math.cos((2 * y + 1) * u * math.pi / 16)
                          * math.cos((2 * x + 1) * v * math.pi / 16))
            px[y][x] = min(255, max(0, round(s / 4.0 + 128.0)))
    return px


def test_jpeg_baseline_gray_dc_only_exact_luma():
    """8x8 grayscale, DC-only block: decoded mean luma is the exact
    closed-form flat value (DC*q/8 + 128)."""
    from master_project_spark.operators.multimodal import _decode_image
    qt = [4] + [1] * 63
    bw = _JBitWriter()
    _write_block(bw, _DC_CODES, _AC_CODES, dc_diff=10, ac_rle=[])
    jpg = _jpeg_bytes(8, 8, [(1, 1, 1, 0, 0, 0)], {0: qt}, bw.flush())
    w, h, luma = _decode_image(jpg)
    assert (w, h) == (8, 8)
    assert luma == round(133 / 255.0, 6)          # 10*4/8 + 128 = 133 flat


def test_jpeg_420_color_luma_ignores_chroma():
    """16x16 4:2:0 YCbCr MCU: mean luma is the mean of the four flat Y
    blocks; chroma blocks are entropy-decoded past (nonzero DC there must
    not disturb the Y plane); DC differentials accumulate per component."""
    from master_project_spark.operators.multimodal import _decode_image
    qt = [1] * 64
    bw = _JBitWriter()
    y_abs = [8, -8, 16, -16]                       # -> 129, 127, 130, 126
    pred = 0
    for dc in y_abs:
        _write_block(bw, _DC_CODES, _AC_CODES, dc - pred, [])
        pred = dc
    _write_block(bw, _DC_CODES, _AC_CODES, 24, [])   # Cb: nonzero, ignored
    _write_block(bw, _DC_CODES, _AC_CODES, -24, [])  # Cr
    jpg = _jpeg_bytes(16, 16,
                      [(1, 2, 2, 0, 0, 0), (2, 1, 1, 0, 0, 0),
                       (3, 1, 1, 0, 0, 0)], {0: qt}, bw.flush())
    w, h, luma = _decode_image(jpg)
    assert (w, h) == (16, 16)
    assert luma == round(128 / 255.0, 6)           # (129+127+130+126)/4


def test_jpeg_crop_excludes_mcu_padding():
    """11x5 grayscale (2x1 partial blocks): the mean must weight the
    right-edge block by its 3 real columns, not the 8 padded ones."""
    from master_project_spark.operators.multimodal import _decode_image
    bw = _JBitWriter()
    _write_block(bw, _DC_CODES, _AC_CODES, 24, [])            # -> 131
    _write_block(bw, _DC_CODES, _AC_CODES, -48, [])           # 24-48 -> 125
    jpg = _jpeg_bytes(11, 5, [(1, 1, 1, 0, 0, 0)], {0: [1] * 64},
                      bw.flush())
    w, h, luma = _decode_image(jpg)
    assert (w, h) == (11, 5)
    assert luma == round((8 * 131 + 3 * 125) / 11 / 255.0, 6)


def test_jpeg_ac_coefficients_match_independent_idct():
    """AC runs, a >15 zero run (ZRL), negative values and a non-flat
    quant table: decoder mean equals the naive double-loop IDCT oracle."""
    from master_project_spark.operators.multimodal import _decode_image
    qt = [(i % 7) + 1 for i in range(64)]
    ac_rle = [(0, 3), (2, -7), (17, 2), (1, -1)]
    zz = [0.0] * 64
    zz[0] = 5
    zz[1], zz[4], zz[22], zz[24] = 3, -7, 2, -1    # same layout as ac_rle
    bw = _JBitWriter()
    _write_block(bw, _DC_CODES, _AC_CODES, 5, ac_rle)
    jpg = _jpeg_bytes(8, 8, [(1, 1, 1, 0, 0, 0)], {0: qt}, bw.flush())
    w, h, luma = _decode_image(jpg)
    px = _oracle_block_pixels(zz, qt)
    want = sum(sum(row) for row in px) / 64.0
    assert (w, h) == (8, 8)
    assert luma == round(want / 255.0, 6)


def test_jpeg_restart_interval_resets_dc_predictor():
    """DRI=1 with RST0/RST1 between three blocks: predictors reset, the
    bitstream re-aligns per segment."""
    from master_project_spark.operators.multimodal import _decode_image
    segs = []
    for dc in (40, 56, -48):                       # absolute after reset
        bw = _JBitWriter()
        _write_block(bw, _DC_CODES, _AC_CODES, dc, [])
        segs.append(bw.flush())
    scan = segs[0] + b"\xff\xd0" + segs[1] + b"\xff\xd1" + segs[2]
    jpg = _jpeg_bytes(24, 8, [(1, 1, 1, 0, 0, 0)], {0: [1] * 64}, scan,
                      dri=1)
    w, h, luma = _decode_image(jpg)
    assert (w, h) == (24, 8)
    assert luma == round((133 + 135 + 122) / 3 / 255.0, 6)


def test_jpeg_nonbaseline_and_oversize_fall_back_to_standin():
    """Progressive (SOF2) and over-fence frames keep REAL dims but the
    documented content-hash stand-in luma — the never-raise seam."""
    import hashlib
    from master_project_spark.operators.multimodal import _decode_image
    bw = _JBitWriter()
    _write_block(bw, _DC_CODES, _AC_CODES, 10, [])
    jpg = _jpeg_bytes(8, 8, [(1, 1, 1, 0, 0, 0)], {0: [1] * 64},
                      bw.flush())
    prog = jpg.replace(b"\xff\xc0", b"\xff\xc2")
    w, h, luma = _decode_image(prog)
    assert (w, h) == (8, 8)
    assert luma == round(hashlib.sha256(prog).digest()[2] / 255.0, 6)

    big = _jpeg_bytes(3000, 3000, [(1, 1, 1, 0, 0, 0)], {0: [1] * 64},
                      b"")
    w, h, luma = _decode_image(big)
    assert (w, h) == (3000, 3000)                  # 9 Mpx > 4 Mpx fence
    assert luma == round(hashlib.sha256(big).digest()[2] / 255.0, 6)


def test_jpeg_through_spark_stage(spark):
    """The real JPEG decode flows through image_features' mapInPandas
    batch path next to the other containers."""
    from master_project_spark.operators import multimodal
    bw = _JBitWriter()
    _write_block(bw, _DC_CODES, _AC_CODES, 10, [])
    jpg = _jpeg_bytes(8, 8, [(1, 1, 1, 0, 0, 0)], {0: [4] + [1] * 63},
                      bw.flush())
    media = spark.createDataFrame(
        [("j1", "image", bytearray(jpg), "{}")], multimodal.MEDIA_SCHEMA)
    r = multimodal.image_features(media).collect()[0]
    assert (r["width"], r["height"]) == (8, 8)
    assert r["mean_luma"] == round(133 / 255.0, 6)


# --- WebP header dimensions + WAV audio decode (round-5 late additions) --

def _riff(fourcc: bytes, body: bytes) -> bytes:
    import struct
    return fourcc + struct.pack("<I", len(body)) + body \
        + (b"\x00" if len(body) & 1 else b"")


def _webp(chunks: bytes) -> bytes:
    import struct
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def test_webp_dimensions_all_three_flavors():
    """VP8 keyframe tag / VP8L packed bits / VP8X 24-bit canvas each give
    REAL dimensions with the content-hash stand-in luma; a corrupt VP8
    chunk falls through to the generic stand-in (never raises)."""
    import hashlib
    import struct
    from master_project_spark.operators.multimodal import _decode_image

    vp8 = _webp(_riff(b"VP8 ", b"\x00\x00\x00\x9d\x01\x2a"
                      + struct.pack("<HH", 320, 240)))
    vp8l = _webp(_riff(b"VP8L", b"\x2f" + struct.pack(
        "<I", (199 << 14) | 299)))                  # w-1=299, h-1=199
    vp8x = _webp(_riff(b"VP8X", b"\x00\x00\x00\x00"
                       + (1023).to_bytes(3, "little")
                       + (767).to_bytes(3, "little")))
    for blob, (ew, eh) in [(vp8, (320, 240)), (vp8l, (300, 200)),
                           (vp8x, (1024, 768))]:
        w, h, luma = _decode_image(blob)
        assert (w, h) == (ew, eh)
        assert luma == round(hashlib.sha256(blob).digest()[2] / 255.0, 6)

    bad = _webp(_riff(b"VP8 ", b"\x01\x00\x00\xff\xff\xff\x00\x00\x00\x00"))
    w, h, luma = _decode_image(bad)                 # interframe: stand-in
    d = hashlib.sha256(bad).digest()
    assert (w, h) == (64 + d[0] % 192, 64 + d[1] % 192)


def _wav(fmt_tag, channels, rate, bits, payload, extra_chunks=b""):
    import struct
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", fmt_tag, channels, rate,
                      rate * block, block, bits)
    chunks = _riff(b"fmt ", fmt) + extra_chunks + _riff(b"data", payload)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_pcm16_exact_features():
    """16-bit stereo PCM with hand-picked samples: rate/channels/frames/
    duration and the mean |amplitude| all match closed-form values."""
    import struct
    from master_project_spark.operators.multimodal import _decode_audio

    samples = [16384, -16384, 32767, 0, -32768, 8192]   # 3 stereo frames
    wav = _wav(1, 2, 8000, 16, struct.pack("<6h", *samples))
    rate, ch, n, dur, amp = _decode_audio(wav)
    assert (rate, ch, n) == (8000, 2, 3)
    assert dur == round(3 / 8000, 6)
    want = sum(abs(s) for s in samples) / 6 / 32768.0
    assert amp == round(want, 6)


def test_wav_pcm8_and_float32_normalization():
    """8-bit WAV is unsigned around 128; float32 passes through as-is."""
    import struct
    from master_project_spark.operators.multimodal import _decode_audio

    wav8 = _wav(1, 1, 16000, 8, bytes([128, 255, 0, 128]))
    rate, ch, n, dur, amp = _decode_audio(wav8)
    assert (rate, ch, n) == (16000, 1, 4)
    assert amp == round((0 + 127 + 128 + 0) / 4 / 128.0, 6)

    vals = (0.5, -0.25, 1.0, 0.0)
    wavf = _wav(3, 1, 48000, 32, struct.pack("<4f", *vals))
    rate, ch, n, dur, amp = _decode_audio(wavf)
    assert (rate, ch, n) == (48000, 1, 4)
    assert amp == round(sum(abs(v) for v in vals) / 4, 6)


def test_wav_skips_non_data_chunks_and_pads():
    """An odd-sized LIST chunk before data must be walked over with RIFF
    even-padding; trailing partial frames are dropped, not crashed on."""
    import struct
    from master_project_spark.operators.multimodal import _decode_audio

    extra = _riff(b"LIST", b"INFOxyz")                  # 7 bytes -> padded
    payload = struct.pack("<3h", 100, -100, 300) + b"\x7f"  # partial frame
    wav = _wav(1, 1, 44100, 16, payload, extra_chunks=extra)
    rate, ch, n, dur, amp = _decode_audio(wav)
    assert (rate, ch, n) == (44100, 1, 3)
    assert amp == round((100 + 100 + 300) / 3 / 32768.0, 6)


def test_audio_decode_never_raises_and_standin_is_deterministic():
    """Compressed/corrupt payloads fall back to the hash stand-in at the
    same seam — the never-raise contract image decode already carries."""
    import hashlib
    from master_project_spark.operators.multimodal import _decode_audio

    for payload in [b"", b"ID3\x03\x00mp3-ish", b"OggS\x00\x02vorbis",
                    b"RIFF\x08\x00\x00\x00WAVE",          # no chunks
                    _wav(2, 1, 8000, 4, b"\x00\x00"),     # ADPCM: unsupported
                    _wav(1, 0, 8000, 16, b"\x00\x00"),    # zero channels
                    _wav(1, 1, 8000, 16, b"")[:20]]:      # truncated
        a = _decode_audio(payload)
        b = _decode_audio(payload)
        assert a == b
        assert a[0] >= 8000 and a[1] in (1, 2) and 0.0 <= a[4] <= 1.0


def test_audio_features_through_spark_stage(spark):
    """Real WAV decode + stand-in fallback flow through audio_features'
    mapInPandas path; image rows are filtered out."""
    import struct
    from master_project_spark.operators import multimodal

    wav = _wav(1, 1, 8000, 16, struct.pack("<4h", 16384, -16384, 0, 32767))
    media = spark.createDataFrame(
        [("a1", "audio", bytearray(wav), "{}"),
         ("a2", "audio", bytearray(b"ID3\x03not-really-mp3"), "{}"),
         ("i1", "image", bytearray(b"not audio"), "{}")],
        multimodal.MEDIA_SCHEMA)
    rows = {r["media_id"]: r for r in multimodal.audio_features(media).collect()}
    assert set(rows) == {"a1", "a2"}
    r = rows["a1"]
    assert (r["sample_rate"], r["channels"], r["n_samples"]) == (8000, 1, 4)
    assert r["duration_s"] == round(4 / 8000, 6)
    assert r["mean_abs"] == round((16384 + 16384 + 0 + 32767) / 4 / 32768.0, 6)
    assert rows["a2"]["sample_rate"] >= 8000        # stand-in, non-crashing
