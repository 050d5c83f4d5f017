"""LLM-pipeline operator tests.

Approximate operators (MinHash-LSH, SimHash, hyperplane ANN) are pinned
against their exact counterparts — recall bounds, not value equality —
which is the correct contract for an approximation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.io.tables import load_table
from datalake2anomali_spark.llm.dedup import (
    dedup_against,
    dedup_exact,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from datalake2anomali_spark.llm.multimodal import decode_image, extract_features, with_binary_payload
from datalake2anomali_spark.llm.similarity import (
    ann_hyperplane_topk,
    cosine_topk,
    embedding_neardup_exact,
    embedding_neardup_lsh,
)
from datalake2anomali_spark.llm.text import bpe_tokens_col, lang_id, shingles_col


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def test_exact_dedup_no_dups_at_small_sf(docs):
    # sf0.001 corpus has no exact duplicates: every doc survives, n_copies=1
    out = dedup_exact(docs)
    assert out.count() == docs.count()
    assert out.filter(F.col("n_copies") > 1).count() == 0


def test_minhash_recall_vs_exact(docs):
    exact = {(r.d1, r.d2) for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    approx = {(r.d1, r.d2) for r in minhash_dedup_pairs(docs, threshold=0.8).collect()}
    assert exact, "corpus should contain planted near-dup pairs"
    # verify step removes false positives entirely
    assert approx <= exact
    # banding with k=64/b=16 at J>=0.8 should recover nearly all true pairs
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall}"


def test_simhash_finds_planted_neardups(docs):
    exact = {(r.d1, r.d2) for r in ngram_jaccard_pairs(docs, threshold=0.9).collect()}
    sim = {(r.d1, r.d2) for r in simhash_near_pairs(docs, max_distance=3).collect()}
    assert sim, "no simhash pairs found"
    # simhash@3 should be dominated by genuinely similar pairs
    prec = len(sim & exact) / len(sim)
    assert prec >= 0.7, f"simhash precision vs J>=0.9: {prec}"


def test_ann_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=5).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_hyperplane_topk(
            emb, queries, k=5, n_tables=8, bits_per_table=4
        ).collect()
    }
    recall = len(approx & exact) / len(exact)
    # 8-table×4-bit LSH on random embeddings: multi-probe union should recall
    # well above chance (5/500 = 1%)
    assert recall >= 0.5, f"ann recall {recall}"


def test_embedding_neardup_lsh_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    exact = {(r.id1, r.id2) for r in embedding_neardup_exact(emb, threshold=0.4).collect()}
    approx = {
        (r.id1, r.id2)
        for r in embedding_neardup_lsh(
            emb, threshold=0.4, n_tables=16, bits_per_table=4
        ).collect()
    }
    assert exact, "corpus should contain high-cosine pairs at threshold 0.4"
    # verify step removes all false positives
    assert approx <= exact
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.8, f"embedding LSH recall {recall}"


def test_quantize_roundtrip_error_bound(spark, sf_dir):
    from datalake2anomali_spark.llm.similarity import dequantize_col, quantize_embeddings

    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    dq = quantize_embeddings(emb).select(
        "vec_id", dequantize_col(F.col("q8"), F.col("q_scale")).alias("deq")
    )
    joined = emb.join(dq, "vec_id").select(
        F.array_max(
            F.zip_with("embedding", "deq", lambda a, b: F.abs(a - b))
        ).alias("max_err"),
        F.array_max(F.transform("embedding", lambda x: F.abs(x))).alias("max_abs"),
    )
    # per-axis error ≤ scale/254 + fp slop; scale = max|x| of the vector
    bad = joined.filter(F.col("max_err") > F.col("max_abs") / 254.0 + 1e-9).count()
    assert bad == 0


def test_bm25_matches_python_reference(spark):
    import math

    from datalake2anomali_spark.llm.search import bm25_scores

    corpus = ["spark join fast", "spark spark window table", "nothing to see here"]
    terms = ["spark", "window"]
    df = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    got = {r.doc_id: (r.n_matched, r.score) for r in bm25_scores(df, terms).collect()}

    k1, b = 1.2, 0.75
    n = len(corpus)
    toks = [c.split(" ") for c in corpus]
    avgdl = sum(len(t) for t in toks) / n
    def score(d):
        s = 0.0
        for t in terms:
            dfreq = sum(1 for tk in toks if t in tk)
            tf = toks[d].count(t)
            idf = math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks[d]) / avgdl))
        return round(s, 6)

    assert set(got) == {0, 1}  # doc 2 matches nothing
    assert got[0] == (1, score(0))
    assert got[1] == (2, score(1))


def test_bpe_tokens(spark):
    df = spark.createDataFrame(
        [(1, "Hello, world! abc123 x-y")], "doc_id long, text string"
    )
    toks = df.select(bpe_tokens_col("text").alias("t")).first().t
    assert toks == ["Hello", ",", "world", "!", "abc", "123", "x", "-", "y"]


def test_lang_id_multilingual(spark):
    rows = [
        (1, "the cat sat on a mat and the dog"),
        (2, "der hund und die katze und das haus"),
        (3, "le chat et la maison et les chiens"),
        (4, "el gato y los perros y las casas"),
        (5, "nothing matching here whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    preds = {r.doc_id: r.pred_lang for r in lang_id(df).collect()}
    assert preds == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "unknown"}


def test_shingles_short_doc_guard(spark):
    df = spark.createDataFrame([(1, "one two three")], "doc_id long, text string")
    out = df.select(shingles_col("text", 4).alias("sh")).first()
    assert out.sh == []  # < n tokens → empty, not a descending-sequence crash


def test_repetition_stats_crafted(spark):
    from datalake2anomali_spark.llm.text import repetition_stats

    rows = [
        (1, "spam spam spam spam"),          # bigram "spam spam" ×3 of 3
        (2, "a b c d e"),                    # all bigrams unique
        (3, "x y x y x y"),                  # "x y" ×3, "y x" ×2 of 5
        (4, "one two"),                      # bigram exists, no trigram
        (5, "single"),                       # no bigrams at all
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert out[1].max_bigram_count == 3 and out[1].n_bigrams == 3
    assert out[1].max_bigram_frac == 1.0 and not out[1].gopher_keep
    assert out[2].max_bigram_count == 1 and out[2].dup_trigram_frac == 0.0
    assert out[2].max_bigram_frac == 0.25  # short doc: 1/4 > cap, so filtered
    assert not out[2].gopher_keep
    assert out[3].max_bigram_count == 3 and out[3].max_bigram_frac == 0.6
    assert out[3].dup_trigram_frac == 0.5  # 4 trigrams, 2 distinct
    assert out[4].dup_trigram_frac == 0.0 and out[4].n_bigrams == 1
    assert out[5].n_bigrams == 0 and out[5].max_bigram_frac == 0.0


def test_normalize_text_nfc_and_whitespace(spark):
    from datalake2anomali_spark.llm.text import normalize_text

    # "e" + combining acute (U+0301) must NFC-compose to U+00E9
    rows = [(1, "  Cafe\u0301   du\tMonde\x00ok  "), (2, "already clean")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in normalize_text(df, nfc=True).collect()}
    assert out[1].norm_text == "caf\u00e9 du monde ok"
    assert out[1].changed
    assert out[2].norm_text == "already clean" and not out[2].changed
    # default path (no NFC) cleans whitespace but keeps the combining form
    out0 = {r.doc_id: r for r in normalize_text(df).collect()}
    assert out0[1].norm_text == "cafe\u0301 du monde ok"


def test_scrub_pii_crafted(spark):
    from datalake2anomali_spark.llm.text import scrub_pii

    rows = [
        (1, "mail a.b+c@test.org and 192.168.0.1 plus 12345678 end"),
        (2, "no pii here 123.456 short 123456"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert out[1].clean_text == "mail <EMAIL> and <IP> plus <NUM> end"
    assert (out[1].n_emails, out[1].n_ips, out[1].n_long_nums) == (1, 1, 1)
    assert out[2].clean_text == "no pii here 123.456 short 123456"
    assert (out[2].n_emails, out[2].n_ips, out[2].n_long_nums) == (0, 0, 0)


def test_multimodal_plumbing(docs):
    feats = extract_features(with_binary_payload(docs.limit(50)))
    rows = feats.collect()
    assert len(rows) == 50
    r = rows[0]
    assert r.fake_width == r.n_bytes % 640
    assert len(r.checksum) == 32


def test_decode_image_ppm_roundtrip():
    from datalake2anomali_spark.llm.multimodal import encode_ppm

    pixels = bytes(range(2 * 3 * 3))  # 2x3 RGB
    img = decode_image(encode_ppm(2, 3, pixels))
    assert (img.width, img.height, img.mode) == (2, 3, "RGB")
    assert img.pixels == pixels


def test_decode_image_ppm_comments_and_pgm():
    # netpbm allows # comments inside the header
    img = decode_image(b"P6\n# a camera\n2 1\n# depth\n255\n" + bytes(6))
    assert (img.width, img.height) == (2, 1)
    gray = decode_image(b"P5\n3 2\n255\n" + bytes(6))
    assert (gray.width, gray.height, gray.mode) == (3, 2, "L")


def test_decode_image_bmp_bottom_up_bgr():
    import struct

    # 2x2 24-bit BMP, bottom-up, rows padded to 4 bytes (2*3=6 -> stride 8);
    # the file stores the image's BOTTOM row first, samples as BGR
    bottom = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"  # BGR: red, green
    top = bytes([255, 0, 0, 255, 255, 255]) + b"\x00\x00"  # BGR: blue, white
    pixel_data = bottom + top
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pixel_data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    )
    img = decode_image(header + pixel_data)
    assert (img.width, img.height, img.mode) == (2, 2, "RGB")
    # top-down RGB: (blue, white) then (red, green)
    assert img.pixels == bytes([0, 0, 255, 255, 255, 255, 255, 0, 0, 0, 255, 0])


def test_decode_image_rejects_unsupported_and_truncated():
    with pytest.raises(ValueError, match="unsupported image magic"):
        decode_image(b"\x89PNG...")
    with pytest.raises(ValueError, match="truncated"):
        decode_image(b"P6\n4 4\n255\n" + bytes(5))


def test_synth_ppm_decodes_to_derived_dims():
    from datalake2anomali_spark.llm.multimodal import synth_ppm_payload

    seed = b"hello world, this is a document"  # n=31 -> w=16, h=8
    img = decode_image(synth_ppm_payload(seed))
    assert (img.width, img.height) == (31 % 16 + 1, 31 % 12 + 1)
    need = 3 * img.width * img.height
    reps = (need + len(seed) - 1) // len(seed)
    assert img.pixels == (seed * reps)[:need]


def test_resize_image_nearest_neighbor_exact():
    from datalake2anomali_spark.llm.multimodal import encode_ppm, resize_image

    # 4x2 source, distinct pixel values; downsample to 2x1 — floor mapping
    # picks src rows [0], cols [0, 2]
    pixels = bytes(range(24))
    resized = decode_image(resize_image(encode_ppm(4, 2, pixels), 2, 1))
    assert (resized.width, resized.height) == (2, 1)
    assert resized.pixels == pixels[0:3] + pixels[6:9]
    # upsample back to 4x2 duplicates the two pixels
    up = decode_image(resize_image(resize_image(encode_ppm(4, 2, pixels), 2, 1), 4, 2))
    assert up.pixels == (pixels[0:3] * 2 + pixels[6:9] * 2) * 2


def test_resize_image_grayscale_pgm():
    from datalake2anomali_spark.llm.multimodal import resize_image

    src = b"P5\n4 4\n255\n" + bytes(range(16))
    out = decode_image(resize_image(src, 2, 2))
    assert (out.width, out.height, out.mode) == (2, 2, "L")
    assert out.pixels == bytes([0, 2, 8, 10])


def test_wav_roundtrip_real_container():
    import io
    import wave

    from datalake2anomali_spark.llm.multimodal import synth_wav_payload

    seed = b"abc"
    payload = synth_wav_payload(seed)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    with wave.open(io.BytesIO(payload), "rb") as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (1, 2, 16000)
        assert w.getnframes() == 3
        import numpy as np

        x = np.frombuffer(w.readframes(3), dtype="<i2")
        assert list(x) == [(b - 128) * 256 for b in seed]


def test_decode_wav_stats_exact_sums(spark):
    from datalake2anomali_spark.llm.multimodal import (
        decode_wav_stats,
        synthesize_wav_audio,
        with_binary_payload,
    )

    docs = with_binary_payload(
        spark.createDataFrame([(1, "ab"), (2, "xyz")], "doc_id long, text string")
    )
    rows = {
        r["doc_id"]: r
        for r in decode_wav_stats(synthesize_wav_audio(docs)).collect()
    }
    for doc_id, text in [(1, "ab"), (2, "xyz")]:
        samples = [(b - 128) * 256 for b in text.encode()]
        r = rows[doc_id]
        assert r["n_samples"] == len(samples)
        assert (r["framerate"], r["n_channels"]) == (16000, 1)
        assert r["amp_sum"] == sum(samples)
        assert r["amp_sqsum"] == sum(s * s for s in samples)


def test_decode_features_end_to_end(spark, sf_dir):
    from datalake2anomali_spark.llm.multimodal import (
        decode_features,
        synthesize_ppm_images,
        with_binary_payload,
    )

    docs = load_table(spark, sf_dir, "documents").limit(30)
    out = decode_features(synthesize_ppm_images(with_binary_payload(docs))).collect()
    n_bytes = {r.doc_id: r.n_bytes for r in extract_features(with_binary_payload(docs)).collect()}
    assert len(out) == 30
    for r in out:
        n = n_bytes[r.doc_id]
        assert (r.width, r.height) == (n % 16 + 1, n % 12 + 1)
        assert r.n_pixels == r.width * r.height
        assert len(r.pixel_checksum) == 32


def test_ann_ivf_recall_vs_exact(spark, sf_dir):
    from datalake2anomali_spark.llm.similarity import ann_ivf_topk

    emb = load_table(spark, sf_dir, "embeddings").cache()
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=5).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_topk(emb, queries, k=5, n_cells=16, nprobe=6).collect()
    }
    # probing 6/16 cells scans ~37% of the corpus; true top-5 neighbors
    # concentrate in the query's nearest cells, so recall must beat that rate
    # (these fixture embeddings are random, the hardest case for IVF)
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, f"ivf recall {recall}"
    # every returned neighbor must carry its exact similarity (no approx sims)
    got = {r.rank for r in ann_ivf_topk(emb, queries, k=5, n_cells=16, nprobe=6).collect()}
    assert got == {1, 2, 3, 4, 5}


def test_multimodal_resize_bounds_payload(spark, sf_dir):
    from datalake2anomali_spark.llm.multimodal import resize_images, with_binary_payload

    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = resize_images(with_binary_payload(docs), width=16, height=8).collect()
    assert len(out) == 20
    assert all(len(r.payload) == 16 * 8 for r in out)  # every row exactly w*h bytes
    assert all(r.n_bytes == 128 and r.fake_width == 16 and r.fake_height == 8 for r in out)


def test_codec_stub_unreachable_from_registered_queries():
    """``resize_image_stub`` is the labeled compressed-codec seam (swap
    for Pillow where it exists); every REGISTERED query must route
    through the real decoder-backed ``resize_decoded_images`` instead.
    Pin that no module under ``plans/`` (the entire registered-query
    surface — ``__spark_entry__`` builds the registry from it alone) can
    reach the stub or its ``resize_images`` plumbing wrapper, so the
    certified surface contains zero stub code paths."""
    import pathlib

    import datalake2anomali_spark.plans as plans_pkg

    plans_dir = pathlib.Path(plans_pkg.__file__).parent
    hits = [
        f"{p.name}:{i}:{line.strip()}"
        for p in sorted(plans_dir.glob("*.py"))
        for i, line in enumerate(p.read_text().splitlines(), 1)
        if "resize_image_stub" in line or "resize_images" in line
    ]
    assert not hits, f"stub path reachable from registered queries: {hits}"
    # and the real path IS the one the registered multimodal query uses
    llm_q = (plans_dir / "llm_queries.py").read_text()
    assert "resize_decoded_images" in llm_q


def test_multimodal_frame_sampling_shape(spark, sf_dir):
    from datalake2anomali_spark.llm.multimodal import sample_frames, with_binary_payload

    docs = load_table(spark, sf_dir, "documents").limit(10)
    src = {r.doc_id: r.text for r in docs.collect()}
    frames = sample_frames(with_binary_payload(docs), frame_bytes=64, every=2).collect()
    for r in frames:
        assert r.frame_idx % 2 == 0
        expected = src[r.doc_id].encode()[r.frame_idx * 64 : (r.frame_idx + 1) * 64]
        assert bytes(r.frame) == expected
    # every doc contributes ceil(n_frames / 2) sampled frames
    import math

    per_doc = {}
    for r in frames:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1
    for doc_id, text in src.items():
        n_frames = math.ceil(len(text.encode()) / 64)
        assert per_doc[doc_id] == math.ceil(n_frames / 2)


def test_multimodal_audio_stats_pcm(spark):
    import numpy as np
    from datalake2anomali_spark.llm.multimodal import audio_stats

    samples = np.array([0, 1000, -1000, 500], dtype="<i2")
    df = spark.createDataFrame([(1, bytearray(samples.tobytes()))], "doc_id long, payload binary")
    row = audio_stats(df).collect()[0]
    assert row.n_samples == 4
    assert row.mean_amp == 125.0
    assert abs(row.rms - float(np.sqrt((samples.astype(float) ** 2).mean()))) < 1e-9


def test_dedup_against_flags_exact_near_and_clean(spark):
    """Incremental dedup flags each new doc against the existing side only."""
    w = " ".join(f"w{i}" for i in range(12))            # 9 distinct 4-gram shingles
    near = " ".join(f"w{i}" for i in range(11)) + " zz" # shares 8 of 9 → J = 8/10
    new = spark.createDataFrame(
        [(1, w), (2, near), (3, "completely different tokens in this row here")],
        ["doc_id", "text"],
    )
    existing = spark.createDataFrame(
        [(10, w), (11, "another unrelated existing document with words")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in dedup_against(new, existing, threshold=0.8).collect()}
    assert out[1].dup_exact and out[1].dup_near          # identical text
    assert not out[2].dup_exact and out[2].dup_near      # near-dup only
    assert not out[3].dup_exact and not out[3].dup_near  # clean
    # new docs are never compared against each other
    assert len(out) == 3


# -- exact substring dedup (llm/substrings.py) --------------------------------


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_dedup_substrings_finds_and_merges_spans(spark):
    from datalake2anomali_spark.llm.substrings import dedup_substrings

    boiler = " ".join(f"b{i}" for i in range(6))  # 6-token shared block
    docs = _mkdocs(
        spark,
        [
            f"u0 u1 {boiler} u2 u3",          # doc0: one shared span mid-doc
            f"{boiler} v0 v1 v2 v3 v4 v5",    # doc1: shared span at start
            "w0 w1 w2 w3 w4 w5 w6 w7",        # doc2: fully unique
        ],
    )
    out = {r.doc_id: r for r in dedup_substrings(docs, k=4, min_repeats=2).collect()}
    assert len(out) == 3
    # doc2 untouched
    assert out[2].n_dup_windows == 0 and out[2].n_spans == 0
    assert out[2].n_tokens_removed == 0 and out[2].removed_ratio == 0.0
    # docs 0 and 1 share exactly the 6-token block -> three 4-windows inside
    # it repeat; the windows overlap, so they must merge into ONE span of 6
    for d in (0, 1):
        assert out[d].n_dup_windows == 3, d
        assert out[d].n_spans == 1, d
        assert out[d].n_tokens_removed == 6, d
    assert out[0].removed_ratio == pytest.approx(6 / 10)


def test_dedup_substrings_separate_spans_not_merged(spark):
    from datalake2anomali_spark.llm.substrings import dedup_substrings

    a = "a0 a1 a2 a3"
    b = "b0 b1 b2 b3"
    gap = " ".join(f"g{i}" for i in range(6))  # > k tokens between repeats
    docs = _mkdocs(spark, [f"{a} {gap} {b}", f"{a} x0 x1 x2 x3 x4 x5 {b}"])
    out = {r.doc_id: r for r in dedup_substrings(docs, k=4, min_repeats=2).collect()}
    # two disjoint 4-token spans per doc, separated by > k -> NOT merged
    for d in (0, 1):
        assert out[d].n_spans == 2, d
        assert out[d].n_tokens_removed == 8, d


def test_dedup_substrings_within_document_repeat(spark):
    from datalake2anomali_spark.llm.substrings import dedup_substrings

    blk = "r0 r1 r2 r3"
    docs = _mkdocs(spark, [f"{blk} m0 m1 m2 m3 m4 {blk}", "z0 z1 z2 z3 z4"])
    out = {r.doc_id: r for r in dedup_substrings(docs, k=4, min_repeats=2).collect()}
    # the repeat is entirely inside doc0: global occurrence count still >= 2
    assert out[0].n_spans == 2 and out[0].n_tokens_removed == 8
    assert out[1].n_dup_windows == 0


def test_pq_codes_shape_determinism_and_recall(spark, sf_dir):
    """Product quantization: codes are m tinyints regardless of
    partitioning (bit-identical across repartitions — codebook training
    is a seeded hash-order draw), and the reconstructed-vector top-k
    recalls well above chance against the exact float path."""
    from datalake2anomali_spark.llm.similarity import (
        cosine_topk_pq,
        pq_encode,
        pq_train_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings").cache()
    books = pq_train_codebooks(emb, m=8, k=16)
    dim = len(emb.select("embedding").first()[0])
    assert books.shape == (8, 16, dim // 8)

    c1 = {r.vec_id: list(r.pq_codes) for r in pq_encode(emb, books).collect()}
    c2 = {
        r.vec_id: list(r.pq_codes)
        for r in pq_encode(emb.repartition(7), books).collect()
    }
    assert c1 == c2
    assert all(len(v) == 8 for v in c1.values())

    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=5).collect()}
    # isotropic random embeddings are PQ's worst case (no correlation to
    # exploit), so the quality gate uses the finer geometry: 16 subspaces
    # of 4 dims x 64 centroids (measured 0.60; m=32/k=64 reaches 0.84,
    # chance is ~1%)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_pq(emb, queries, m=16, k_codes=64, k=5).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, f"pq recall {recall}"

    with pytest.raises(ValueError, match="not divisible"):
        pq_train_codebooks(emb, m=7)


def test_ivfpq_adc_recall_and_determinism(spark, sf_dir):
    """IVF-PQ with ADC: recall well above chance against the exact float
    path (bounded by the nprobe ceiling the flat IVF shares), and the
    result is identical across input partitionings — training, encoding
    and the LUT sums are all deterministic."""
    from datalake2anomali_spark.llm.similarity import ann_ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings").cache()
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=5).collect()}
    got1 = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.sim)
        for r in ann_ivfpq_topk(
            emb, queries, k=5, n_cells=16, nprobe=6, m=32, k_codes=64
        ).collect()
    )
    approx = {(q, n) for q, _rk, n, _s in got1}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.4, f"ivfpq recall {recall}"  # chance ~1%

    got2 = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.sim)
        for r in ann_ivfpq_topk(
            emb.repartition(9), queries, k=5, n_cells=16, nprobe=6, m=32, k_codes=64
        ).collect()
    )
    assert got1 == got2
