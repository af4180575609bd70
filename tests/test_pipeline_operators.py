"""Property tests for the §2.12 pipeline operators.

The oracle-parity gate (test_relational_oracle.py auto-picks up every
registered query) checks value equality; these tests check the
*algorithmic* properties the oracle can't see: LSH recall vs the exact
answer, signature shapes, stub behavior, and scale-shape invariants
(no cross product, candidate counts bounded).
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from iceberg_geo_poc_spark.operators import dedup, multimodal, similarity, text
from iceberg_geo_poc_spark.session import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_shingles_short_doc_guard(spark):
    df = spark.createDataFrame(
        [(1, "one two"), (2, "a b c d")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r["shingles"]
        for r in dedup.with_shingles(dedup.with_words(df)).collect()
    }
    assert out[1] == []
    assert out[2] == ["a b c", "b c d"]


def test_minhash_lsh_recall_equals_exact(docs):
    """LSH candidates must contain every exact-jaccard pair >= 0.5."""
    exact = {
        (r["ia"], r["ib"])
        for r in dedup.ngram_jaccard_pairs(docs, 0.5).collect()
    }
    lsh = {
        (r["ia"], r["ib"]) for r in dedup.minhash_lsh_pairs(docs, 0.5).collect()
    }
    assert exact, "testdata should contain near-dup pairs"
    assert lsh == exact


def test_ngram_prefix_filter_matches_bruteforce(spark):
    """Prefix filtering (round-13 hot-bucket fix) is EXACT: on a corpus
    where one shingle is shared by EVERY doc (the classic hot bucket),
    the output equals the brute-force all-pairs jaccard answer."""
    import itertools

    base = (
        "the quick brown fox jumps over the lazy dog near the old river "
        "bank today".split()
    )
    rows = []
    for i in range(12):
        words = list(base)
        for j in range(i % 5):
            words[-(j + 1)] = f"w{i}x{j}"
        rows.append((i, " ".join(words)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def sset(text):
        w = text.split()
        return {" ".join(w[k : k + 3]) for k in range(len(w) - 2)}

    sets = {i: sset(t) for i, t in rows}
    expect = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter, uni = len(sets[a] & sets[b]), len(sets[a] | sets[b])
        if uni and round(inter / uni, 6) >= 0.5:
            expect.add((a, b))
    got = {
        (r["ia"], r["ib"])
        for r in dedup.ngram_jaccard_pairs(df, 0.5).collect()
    }
    assert expect and got == expect


def test_ngram_prefix_index_smaller_than_full(docs):
    """The prefix index must carry ~(1-t) of the full inverted index —
    the scale lever that bounds hot-bucket pair expansion."""
    sh = dedup._doc_shingles(docs)
    full = sh.select(F.explode("shingles")).count()
    t = 0.5
    pref = sh.select(
        F.explode(
            F.expr(
                "slice(array_sort(transform(shingles, s -> xxhash64(s))),"
                f" 1, CAST(floor((1.0 - {t}) * size(shingles)) AS INT) + 1)"
            )
        )
    ).count()
    assert pref <= full * (1 - t) + sh.count()


def test_lsh_candidates_far_below_cross_product(docs):
    n = docs.count()
    sigs = dedup.minhash_signatures(dedup._doc_shingles(docs))
    cands = dedup.lsh_candidate_pairs(sigs).count()
    assert cands < n * (n - 1) / 8, "LSH must prune most of the cross product"


def test_minhash_signature_shape(docs):
    sigs = dedup.minhash_signatures(dedup._doc_shingles(docs))
    row = sigs.select(F.size("sig").alias("k")).distinct().collect()
    assert [r["k"] for r in row] == [dedup.NUM_PERM]


def test_simhash_is_32_bit(docs):
    mx = dedup.simhash_docs(docs).agg(F.max("simhash"), F.min("simhash")).first()
    assert 0 <= mx[1] and mx[0] < 2**32


def test_knn_rank_contract(emb):
    out = similarity.knn_cosine_topk(emb, n_probes=3, k=5).collect()
    by_probe: dict = {}
    for r in out:
        by_probe.setdefault(r["ia"], []).append(r)
    assert set(by_probe) == {0, 1, 2}
    for rows in by_probe.values():
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        cosines = [r["cosine"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["ib"] != r["ia"] for r in rows)


def test_lsh_knn_subset_of_bucket(emb):
    """Every LSH-kNN hit shares the probe's hyperplane bucket."""
    bucketed = emb.withColumn(
        "bucket", F.expr(similarity.lsh_bucket_expr("embedding"))
    ).select("vec_id", "bucket")
    buckets = {r["vec_id"]: r["bucket"] for r in bucketed.collect()}
    for r in similarity.lsh_knn_topk(emb, n_probes=10, k=3).collect():
        assert buckets[r["ia"]] == buckets[r["ib"]]


def test_ivf_knn_recall_vs_brute(emb):
    """IVF top-k with nprobe=2 recovers most of the brute-force top-k
    (recall bound), and every candidate comes from a probed cluster."""
    brute = similarity.knn_cosine_topk(emb, n_probes=5, k=5).collect()
    ivf = similarity.ivf_knn_topk(emb, n_probes=5, k=5, nprobe=2).collect()
    truth = {(r["ia"], r["ib"]) for r in brute}
    got = {(r["ia"], r["ib"]) for r in ivf}
    assert len(got & truth) / len(truth) >= 0.5
    # rank contract identical to brute force
    by_probe: dict = {}
    for r in ivf:
        by_probe.setdefault(r["ia"], []).append(r["rank"])
    for ranks in by_probe.values():
        assert ranks == list(range(1, len(ranks) + 1))


def test_language_id_full_coverage(docs):
    out = text.language_id(docs)
    assert out.count() == docs.count()
    preds = {r["pred_lang"] for r in out.select("pred_lang").distinct().collect()}
    assert preds <= set(text.LANG_MARKERS) | {"und"}


def test_quality_scores_bounded(docs):
    q = text.quality_scores(docs).agg(F.min("quality"), F.max("quality")).first()
    assert 0.0 <= q[0] and q[1] <= 1.0


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha")], ["doc_id", "text"]
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in text.fingerprints(df).collect()}
    assert fps[1] != fps[2]


def test_multimodal_decode_compressed_formats_stubbed():
    """Codec-bound formats still need a library; the dependency-free
    formats (ppm/bmp/png/jpeg/wav) decode for real (tests below +
    tests/test_jpeg_codec.py)."""
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"RIFF0000WEBP", "webp")
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"ID3", "mp3")
    with pytest.raises(ValueError):  # PNG is real now: bad sig is data error
        multimodal.decode_image(b"\x89PNG", "png")
    with pytest.raises(ValueError):  # JPEG is real now: bad sig is data error
        multimodal.decode_image(b"\x00\x00\xff", "jpeg")


def test_png_roundtrip_filters_and_rgba():
    """Real PNG: encode->decode round-trips arbitrary pixels; the
    unfilter path handles all five filter types; RGBA drops alpha."""
    import struct
    import zlib as _zlib

    import numpy as np

    rng = np.random.default_rng(7)
    for w, h in ((7, 5), (1, 1), (16, 3)):
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (multimodal._decode_png(multimodal.encode_png(arr)) == arr).all()

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", _zlib.crc32(t + d)
        )

    # hand-encode one row per filter type (Sub/Up/Average/Paeth)
    h, w, ch = 4, 5, 3
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    flat = img.reshape(h, w * ch).astype(int)
    rows, prev = [], np.zeros(w * ch, int)
    for y, ft in enumerate([1, 2, 3, 4]):
        cur, enc = flat[y], np.zeros(w * ch, int)
        for x in range(w * ch):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) & 0xFF
        rows.append(bytes([ft]) + bytes(enc.astype(np.uint8)))
        prev = cur
    png = (
        multimodal._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )
    assert (multimodal._decode_png(png) == img).all()
    # RGBA (color type 6): alpha channel dropped
    arr4 = rng.integers(0, 256, size=(6, 7, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + arr4[y].tobytes() for y in range(6))
    png4 = (
        multimodal._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 6, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (multimodal._decode_png(png4) == arr4[:, :, :3]).all()


def test_chunk_documents_fanout_and_overlap(spark):
    """Chunking: exact window starts/sizes, overlap stitching, and the
    n<=size single-chunk case."""
    rows = [
        (1, " ".join(f"w{i}" for i in range(10))),  # 10 tokens
        (2, " ".join(f"w{i}" for i in range(4))),  # short doc
        (3, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = text.chunk_documents(df, size=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: stride 3 -> starts 0,3,6 -> [0:4],[3:7],[6:10]: 3 chunks
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.chunk_text for r in c1] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9",
    ]
    assert all(r.n_chunk_tokens == 4 for r in c1)
    assert [r.chunk_text for r in by_doc[2]] == ["w0 w1 w2 w3"]
    assert [r.chunk_text for r in by_doc[3]] == ["solo"]
    with pytest.raises(ValueError):
        text.chunk_documents(df, size=4, overlap=4)


def test_tfidf_top_terms_ranks_distinctive_words(spark):
    """TF-IDF ranks a document's distinctive term above corpus-wide
    stopwords; a term in every doc scores ln(1) = 0."""
    rows = [
        (1, "the the the apple apple banana"),
        (2, "the banana banana cherry"),
        (3, "the cherry date date date"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = text.tfidf_top_terms(df, k=2).collect()
    top = {r.doc_id: r.term for r in out if r.rnk == 1}
    assert top == {1: "apple", 2: "banana", 3: "date"}
    the_rows = [r for r in out if r.term == "the"]
    assert all(r.tfidf == 0.0 for r in the_rows)


def test_ppm_bmp_roundtrip_and_gradient_resize():
    """Real pixels: encode->decode round-trips exactly for PPM and BMP
    (including BMP row padding), and NN resize picks the expected source
    pixels on a non-constant gradient image."""
    import numpy as np

    rng = np.random.default_rng(5)
    for w, h in ((7, 5), (8, 6), (1, 1), (13, 2)):
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (multimodal._decode_ppm(multimodal.encode_ppm(arr)) == arr).all()
        assert (multimodal._decode_bmp(multimodal.encode_bmp(arr)) == arr).all()
    # PPM comments + whitespace per spec
    arr = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    ppm = b"P6\n# a comment\n2 2\n255\n" + arr.tobytes()
    assert (multimodal._decode_ppm(ppm) == arr).all()
    # gradient NN resize: exact floor-index mapping
    grad = np.zeros((4, 4, 3), dtype=np.uint8)
    grad[:, :, 0] = np.arange(4)[:, None] * 10
    grad[:, :, 1] = np.arange(4)[None, :] * 10
    out = multimodal.resize_nn(grad, 2, 2)
    assert out.shape == (2, 2, 3)
    assert (out[:, :, 0] == [[0, 0], [20, 20]]).all()
    assert (out[:, :, 1] == [[0, 20], [0, 20]]).all()
    # identity resize is a no-op
    assert (multimodal.resize_nn(grad, 4, 4) == grad).all()


def test_wav_roundtrip_and_frame_slices():
    """Real samples: WAV encode->decode round-trips int16 PCM exactly
    (arbitrary waveform, not just constant), and frame sampling hashes
    the true sample slices."""
    import hashlib

    import numpy as np

    sig = (np.sin(np.arange(1000) / 7.0) * 20000).astype(np.int16)
    samples, rate = multimodal.decode_audio(multimodal.encode_wav(sig, 8000), "wav")
    assert rate == 8000 and (samples == sig).all()
    # frame 0's md5 equals the hash of the true first 256 samples
    want0 = hashlib.md5(sig[:256].astype("<i2").tobytes()).hexdigest()
    frame0 = samples[:256]
    assert hashlib.md5(np.asarray(frame0, "<i2").tobytes()).hexdigest() == want0


def test_multimodal_schema_and_determinism(docs):
    def shape(schema):
        return [(f.name, f.dataType) for f in schema.fields]

    media = multimodal.synthesize_media(docs)
    assert shape(media.schema) == shape(multimodal.MEDIA_SCHEMA)
    feats = multimodal.extract_features(media)
    assert shape(feats.schema) == shape(multimodal.FEATURE_SCHEMA)
    a = {r["doc_id"]: r["content_md5"] for r in feats.collect()}
    b = {r["doc_id"]: r["content_md5"] for r in feats.collect()}
    assert a == b and len(a) == docs.count()


def test_cluster_representatives_chain(spark):
    """Label propagation converges across multi-hop chains: 20-21-22-23
    needs >1 round to agree on rep=20."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "ia BIGINT, ib BIGINT",
    )
    out = {
        (r.doc_id, r.rep)
        for r in dedup.duplicate_cluster_representatives(pairs).collect()
    }
    assert out == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20),
    }


def test_redact_pii_tokens(spark):
    df = spark.createDataFrame(
        [(1, "mail bob@example.com  or\tcall 12345678 x"), (2, "clean")],
        "doc_id BIGINT, text STRING",
    )
    rows = {r.doc_id: r for r in text.redact_pii(df).collect()}
    assert rows[1].clean_text == "mail <EMAIL> or call <NUM> x"
    assert rows[1].n_emails == 1 and rows[1].n_longnums == 1
    assert rows[2].clean_text == "clean"
    assert rows[2].n_emails == 0 and rows[2].n_longnums == 0


def test_frame_sample_fanout(spark):
    """2304-sample WAV -> 9 frames of 256 -> sampled 0,4,8 (in-batch row
    explosion), hashes matching the real sample slices; and a real
    gradient image resizes through the Spark operator."""
    import hashlib

    import numpy as np

    sig = (np.cos(np.arange(2304) / 11.0) * 12345).astype(np.int16)
    media = spark.createDataFrame(
        [(1, bytearray(multimodal.encode_wav(sig)), "u", "wav", None, None)],
        multimodal.MEDIA_SCHEMA,
    )
    rows = multimodal.sample_media_frames(media, frame_size=256, every_n=4).collect()
    assert [r.frame_idx for r in rows] == [0, 4, 8]
    want = [
        hashlib.md5(sig[i * 256 : (i + 1) * 256].astype("<i2").tobytes()).hexdigest()
        for i in (0, 4, 8)
    ]
    assert [r.frame_md5 for r in rows] == want
    grad = np.zeros((8, 8, 3), dtype=np.uint8)
    grad[:, :, 2] = np.arange(8)[None, :] * 30
    img = spark.createDataFrame(
        [(1, bytearray(multimodal.encode_bmp(grad)), "u", "bmp", 8, 8)],
        multimodal.MEDIA_SCHEMA,
    )
    resized = multimodal.resize_images(img, 4, 2).collect()[0]
    assert (resized.new_width, resized.new_height) == (4, 2)
    assert (resized.width, resized.height) == (8, 8)
    want_md5 = hashlib.md5(
        multimodal.encode_ppm(multimodal.resize_nn(grad, 4, 2))
    ).hexdigest()
    assert resized.resized_md5 == want_md5


def test_salted_join_equals_plain_join(spark):
    """Salted join output == plain join, on a skewed key distribution
    (90% of big-side rows share one key)."""
    from iceberg_geo_poc_spark.operators.skew import salted_join, two_phase_count

    big = spark.createDataFrame(
        [(1 if i % 10 else i, i) for i in range(2000)], "k BIGINT, v BIGINT"
    )
    small = spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, 2000, 7)] + [(1, "hot")],
        "k BIGINT, name STRING",
    )
    got = salted_join(big, small, ["k"], salt=8).groupBy("k").count()
    want = big.join(small, ["k"]).groupBy("k").count()
    assert {(r.k, r["count"]) for r in got.collect()} == {
        (r.k, r["count"]) for r in want.collect()
    }
    # left join keeps unmatched big rows exactly once
    got_l = salted_join(big, small, ["k"], salt=8, how="left").count()
    assert got_l == big.join(small, ["k"], "left").count()
    counts = {r.k: r.n for r in two_phase_count(big, "k", salt=8).collect()}
    assert counts[1] == 1800  # the hot key: every i with i % 10 != 0
    assert counts == {
        r.k: r["count"] for r in big.groupBy("k").count().collect()
    }


def test_kmeans_centroids_quality(spark):
    """Lloyd-refined centroids on a cluster-ordered corpus: max-cell
    fraction reaches the uniform optimum and out-of-seed-cluster probes
    keep full recall at nprobe=2 — while staying deterministic."""
    import numpy as np

    from iceberg_geo_poc_spark.operators import similarity as S

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(16, 64)) * 3.0
    corpus = np.array([centers[i // 40] + rng.normal(size=64) * 0.4 for i in range(640)])
    emb = spark.createDataFrame(
        [(i, corpus[i].tolist()) for i in range(640)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    km = S.kmeans_centroids(emb, 16, 3)
    km_arr = np.array([r["cemb"] for r in km.orderBy("cid").collect()])
    assert km_arr.shape == (16, 64)
    # deterministic: a second run yields identical centroids
    km2 = np.array(
        [r["cemb"] for r in S.kmeans_centroids(emb, 16, 3).orderBy("cid").collect()]
    )
    assert np.allclose(km_arr, km2)

    def norm(a):
        return a / np.linalg.norm(a, axis=-1, keepdims=True)

    cn = norm(corpus)

    def quality(cents, nprobe=2, k=5):
        c = norm(cents)
        assign = (cn @ c.T).argmax(1)
        max_frac = np.bincount(assign, minlength=len(c)).max() / len(corpus)
        recalls = []
        for p in [40 * j + 7 for j in range(6, 16)]:  # outside the seed cluster
            sims = cn @ cn[p]
            sims[p] = -2
            true_top = set(np.argsort(-sims)[:k])
            pc = np.argsort(-(c @ cn[p]))[:nprobe]
            cand = np.nonzero(np.isin(assign, pc))[0]
            cand = cand[cand != p]
            got = set(cand[np.argsort(-sims[cand])[:k]])
            recalls.append(len(got & true_top) / k)
        return float(np.mean(recalls)), float(max_frac)

    rec_first, bal_first = quality(corpus[:16])
    rec_km, bal_km = quality(km_arr)
    # refined quantizer: perfectly balanced cells at the uniform optimum
    # and full recall; never worse than raw first-N sampling
    assert bal_km <= 0.126, bal_km
    assert rec_km >= 0.99, rec_km
    assert bal_km <= bal_first + 1e-9
    assert rec_km >= rec_first - 1e-9


def test_pq_adc_recall_and_codebook_shape(spark, sf_dir):
    """PQ codebooks cover every (subspace, code) slot and ADC search
    clears the recall floor the driver contract pins."""
    import pyspark.sql.functions as F

    from iceberg_geo_poc_spark.operators import similarity
    from iceberg_geo_poc_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    codes = similarity.pq_codebooks(emb, m=8, n_codes=16, iters=2)
    shape = codes.groupBy("sub_id").count().collect()
    assert len(shape) == 8 and all(r["count"] == 16 for r in shape)
    subdim = codes.select(F.size("codevec").alias("d")).distinct().collect()
    assert [r.d for r in subdim] == [8]  # 64-dim embeddings / 8 subspaces

    exact = similarity.knn_cosine_topk(emb, n_probes=5, k=5)
    approx = similarity.pq_adc_topk(emb, m=16, n_codes=32, k=5, n_probes=5, iters=3)
    a = approx.groupBy("ia").agg(F.collect_set("ib").alias("got"))
    e = exact.groupBy("ia").agg(F.collect_set("ib").alias("want"))
    rec = (
        a.join(e, "ia")
        .select((F.size(F.array_intersect("got", "want")) / F.size("want")).alias("r"))
        .agg(F.avg("r"))
        .collect()[0][0]
    )
    assert rec >= 0.4


def test_lm_perplexity_hand_computed_and_ordering(spark):
    import math

    from iceberg_geo_poc_spark.operators.lm import perplexity_scores

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # only common bigrams
            (2, "a b c"),         # one common, one rare bigram
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: r for r in perplexity_scores(docs, k=0.1).collect()}
    # corpus counts: unigrams a:4 b:4 c:1 (V=3); bigrams ab:4 ba:2 bc:1
    V, k = 3, 0.1
    p_ab = (4 + k) / (4 + k * V)
    p_ba = (2 + k) / (4 + k * V)
    p_bc = (1 + k) / (4 + k * V)
    exp1 = -(3 * math.log(p_ab) + 2 * math.log(p_ba)) / 5
    exp2 = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert out[1]["n_bigrams"] == 5 and out[2]["n_bigrams"] == 2
    assert abs(out[1]["nll"] - exp1) < 1e-12
    assert abs(out[2]["nll"] - exp2) < 1e-12
    # the common-phrase document is more "typical" than the rare one
    assert out[1]["nll"] < out[2]["nll"]


def test_mixture_sample_rates_and_drop(spark):
    from iceberg_geo_poc_spark.operators.sampling import mixture_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 7, "big")
        .when(F.col("id") % 10 < 9, "mid")
        .otherwise("tiny")
        .alias("dom"),
    )
    out = mixture_sample(df, "doc_id", "dom", {"big": 0.5, "tiny": 0.5})
    got = {r[0]: r[1] for r in out.groupBy("dom").count().collect()}
    assert "mid" not in got                       # unlisted domain dropped
    assert got["tiny"] == 100                     # limiting domain kept whole
    # big downsampled toward parity with tiny (hash gate ~10% of 700)
    assert abs(got["big"] - 100) <= 30
    # deterministic: second run keeps the identical set
    again = mixture_sample(df, "doc_id", "dom", {"big": 0.5, "tiny": 0.5})
    assert out.orderBy("doc_id").collect() == again.orderBy("doc_id").collect()


def test_ivf_index_build_search_prunes_partitions(spark, sf_dir, tmp_path):
    from iceberg_geo_poc_spark.operators.ann_index import (
        build_ivf_index,
        ivf_index_search,
        plan_probe_scan,
    )
    from iceberg_geo_poc_spark.operators.similarity import knn_cosine_topk
    from iceberg_geo_poc_spark.session import load_table
    from iceberg_geo_poc_spark.table import Catalog

    cat = Catalog(str(tmp_path / "wh"), spark)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = build_ivf_index(cat, "ivf_idx", emb, n_centroids=8, iters=2)
    probes = emb.filter("vec_id < 5")
    # partition pruning: the probe scan reads only the probed clusters
    scan, _pc = plan_probe_scan(idx, probes, nprobe=2)
    assert 0 < len(scan.files()) < scan.total_data_files()
    res = ivf_index_search(idx, probes, k=5, nprobe=2)
    rows = res.collect()
    assert rows == ivf_index_search(idx, probes, k=5, nprobe=2).collect()
    # recall floor vs brute force
    exact = knn_cosine_topk(emb, n_probes=5, k=5)
    got = {(r["ia"], r["ib"]) for r in rows}
    want = {(r["ia"], r["ib"]) for r in exact.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.5, recall
    # index survives reload (centroids in table metadata)
    idx2 = cat.load_table("ivf_idx")
    assert ivf_index_search(idx2, probes, k=5, nprobe=2).collect() == rows


def test_phash_brightness_invariance_and_sensitivity(spark):
    import numpy as np

    from iceberg_geo_poc_spark.operators.multimodal import (
        decode_image,
        encode_ppm,
        perceptual_hash,
    )
    import pandas as pd

    rs = np.random.RandomState(99)
    base = rs.randint(0, 199, (16, 16, 3)).astype(np.uint8)
    bright = (base + np.uint8(40)).astype(np.uint8)
    other = rs.randint(0, 199, (16, 16, 3)).astype(np.uint8)
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "payload": [encode_ppm(a) for a in (base, bright, other)],
                "uri": ["u1", "u2", "u3"],
                "format": ["ppm"] * 3,
                "width": pd.array([16] * 3, dtype="int32"),
                "height": pd.array([16] * 3, dtype="int32"),
            }
        )
    )
    out = {r["doc_id"]: r["phash"] for r in perceptual_hash(media).collect()}
    assert out[1] == out[2]          # brightness-shift invariant
    assert out[1] != out[3]          # different texture, different hash


def test_ivf_index_incremental_insert(spark, sf_dir, tmp_path):
    from iceberg_geo_poc_spark.operators.ann_index import (
        build_ivf_index,
        ivf_index_insert,
        ivf_index_search,
        plan_probe_scan,
    )
    from iceberg_geo_poc_spark.session import load_table
    from iceberg_geo_poc_spark.table import Catalog

    cat = Catalog(str(tmp_path / "wh"), spark)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    first = emb.filter("vec_id < 400")
    rest = emb.filter("vec_id >= 400")
    idx = build_ivf_index(cat, "ivf_inc", first, n_centroids=8, iters=2)
    n_manifests_before = len(idx.current_snapshot().manifest_list())
    ivf_index_insert(idx, rest)
    # fast append: one delta manifest added, index row count complete
    assert len(idx.current_snapshot().manifest_list()) == n_manifests_before + 1
    assert idx.to_df().count() == emb.count()
    # probes still prune and can now retrieve inserted vectors
    probes = emb.filter("vec_id < 3")
    scan, _pc = plan_probe_scan(idx, probes, nprobe=2)
    assert 0 < len(scan.files()) < scan.total_data_files()
    res = ivf_index_search(idx, probes, k=50, nprobe=8)
    assert any(r["ib"] >= 400 for r in res.collect())


def test_semantic_dedup_planted_duplicates(spark):
    """Planted structure: 0//1//2 are near-identical (pairwise cosine
    ~1), 3 is orthogonal — the min-id representative (0) survives, both
    later copies name it (or a smaller dropped copy) as dup_of, and the
    orthogonal vector is untouched."""
    rows = [
        (0, [1.0, 0.0, 0.02, 0.01] + [0.0] * 60),
        (1, [1.0, 0.01, 0.0, 0.02] + [0.0] * 60),
        (2, [0.99, 0.02, 0.01, 0.0] + [0.0] * 60),
        (3, [0.0, 0.0, 0.0, 1.0] + [0.0] * 60),
    ]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    for scope in ("lsh", "kmeans"):
        out = {
            r["vec_id"]: r
            for r in dedup.semantic_dedup(
                emb, threshold=0.9, scope=scope, n_centroids=2, iters=2
            ).collect()
        }
        assert out[0]["kept"] and out[0]["dup_of"] is None
        assert out[3]["kept"], scope
        assert not out[1]["kept"] and out[1]["dup_of"] == 0
        assert not out[2]["kept"] and out[2]["dup_of"] in (0, 1)
        assert out[1]["cosine"] >= 0.9


def test_semantic_dedup_kept_set_is_independent(emb):
    """Within any cluster the kept set is a theta-independent set: no
    kept pair in the same LSH bucket may be >= theta-similar (the
    greedy min-id rule guarantees it; this pins the implementation)."""
    theta = 0.3
    res = dedup.semantic_dedup(emb, threshold=theta, scope="lsh")
    kept = res.filter(F.col("kept")).select("vec_id")
    base = similarity.with_norm(emb).withColumn(
        "bucket", F.expr(similarity.lsh_bucket_expr("embedding"))
    )
    k = base.join(kept, "vec_id")
    a = k.select(
        F.col("vec_id").alias("ia"), F.col("embedding").alias("va"),
        F.col("nrm").alias("na"), "bucket",
    )
    b = k.select(
        F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"), "bucket",
    )
    bad = (
        a.join(b, "bucket")
        .filter(F.col("ia") < F.col("ib"))
        .withColumn(
            "cosine",
            F.round(
                F.expr(similarity.dot_expr("va", "vb"))
                / (F.col("na") * F.col("nb")),
                6,
            ),
        )
        .filter(F.col("cosine") >= theta)
        .count()
    )
    assert bad == 0


def test_resize_box_hand_computed_and_invariants():
    import numpy as np

    from iceberg_geo_poc_spark.operators.multimodal import (
        resize_box,
        resize_nn,
    )

    # hand-computed 4x4 -> 2x2: each output = round-half-up mean of its
    # 2x2 block
    g = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = resize_box(g[..., None], 2, 2)[..., 0]
    # blocks: [[0,1,4,5],[2,3,6,7],[8,9,12,13],[10,11,14,15]]
    assert out.tolist() == [[3, 5], [11, 13]]
    # constant image stays constant at any size
    c = np.full((10, 7, 3), 117, np.uint8)
    assert (resize_box(c, 3, 4) == 117).all()
    # mean preservation within rounding for uniform gradients
    grad = np.tile(np.arange(64, dtype=np.uint8), (64, 1))[..., None]
    small = resize_box(grad, 8, 8)
    assert abs(float(small.mean()) - float(grad.mean())) < 1.0
    # box beats nearest on aliasing: a 1px-period checkerboard averages
    # to mid-gray under box, but nearest picks one phase
    cb = np.indices((32, 32)).sum(axis=0) % 2 * 255
    bb = resize_box(cb.astype(np.uint8)[..., None], 16, 16)
    nn = resize_nn(cb.astype(np.uint8)[..., None], 16, 16)
    assert 120 <= float(bb.mean()) <= 135
    assert float(nn.mean()) in (0.0, 255.0)
    # upsampling falls back to nearest
    up = resize_box(np.full((2, 2, 3), 9, np.uint8), 4, 4)
    assert up.shape == (4, 4, 3) and (up == 9).all()


def test_connected_components_long_chain_log_rounds(spark):
    """A 600-node path graph has diameter 599: plain label propagation
    would need ~600 rounds, pointer jumping must resolve it within the
    default 25 (O(log d)).  Also: two disjoint chains + an isolated
    pair keep distinct components."""
    from iceberg_geo_poc_spark.operators.dedup import connected_components

    edges = [(i, i + 1) for i in range(599)]           # chain 0..599
    edges += [(1000 + i, 1001 + i) for i in range(99)] # chain 1000..1099
    edges += [(5000, 5001)]
    df = spark.createDataFrame(edges, "a LONG, b LONG")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert all(got[i] == 0 for i in range(600))
    assert all(got[1000 + i] == 1000 for i in range(100))
    assert got[5000] == 5000 and got[5001] == 5000
    assert len(got) == 702


def test_connected_components_star_and_selfloop(spark):
    from iceberg_geo_poc_spark.operators.dedup import connected_components

    edges = [(7, 3), (7, 9), (7, 11), (2, 2)]
    got = {r.id: r.component for r in connected_components(
        spark.createDataFrame(edges, "a LONG, b LONG")).collect()}
    assert got == {3: 3, 7: 3, 9: 3, 11: 3, 2: 2}


def test_span_corruption_structure(spark):
    """Corrupted + target reconstruct the original token multiset;
    sentinels number 0..n_spans-1 in order in BOTH outputs."""
    import re

    from iceberg_geo_poc_spark.operators.text import span_corruption

    docs = spark.createDataFrame(
        [(7, " ".join(f"w{i}" for i in range(40)))], "doc_id LONG, text STRING"
    )
    r = span_corruption(docs).collect()[0]
    sent_c = re.findall(r"<extra_id_(\d+)>", r.corrupted)
    sent_t = re.findall(r"<extra_id_(\d+)>", r.target)
    assert sent_c == sent_t == [str(i) for i in range(r.n_spans)]
    orig = set(f"w{i}" for i in range(40))
    kept = [w for w in r.corrupted.split() if not w.startswith("<extra")]
    masked = [w for w in r.target.split() if not w.startswith("<extra")]
    assert set(kept) | set(masked) == orig
    assert not (set(kept) & set(masked))


def test_kcenter_coreset_maximin(spark):
    """On a line of points, greedy k-center from the min id must pick
    the far end second, then the midpoint."""
    from iceberg_geo_poc_spark.operators.sampling import kcenter_coreset

    pts = [(i, [float(i), 0.0]) for i in range(9)]  # 0..8 on a line
    emb = spark.createDataFrame(pts, "vec_id LONG, embedding ARRAY<FLOAT>")
    got = [r.vec_id for r in kcenter_coreset(emb, k=3).collect()]
    assert got == [0, 8, 4]


def test_splade_ranks_matching_docs_first(spark):
    from iceberg_geo_poc_spark.operators.retrieval import splade_sparse_scores

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "dog cat"),
        ],
        "doc_id LONG, text STRING",
    )
    got = splade_sparse_scores(docs, [(1, "apple")], k=5).collect()
    assert [r.doc_id for r in got] == [1]  # only doc 1 contains 'apple'
    got2 = splade_sparse_scores(docs, [(2, "banana cherry")], k=5).collect()
    assert [r.doc_id for r in got2] == [2, 1]  # 2 matches both terms


def test_connected_components_property_vs_unionfind(spark):
    """Property: the distributed pointer-jumping result must equal a
    plain union-find over the same random edge sets."""
    import random

    from iceberg_geo_poc_spark.operators.dedup import connected_components

    rng = random.Random(8)
    for trial in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(100 + trial * 40)
        ]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {}
        for v in set(v for e in edges for v in e):
            r = find(v)
            want[v] = min(
                u for u in set(x for e in edges for x in e) if find(u) == r
            )
        df = spark.createDataFrame(edges, "a LONG, b LONG")
        got = {r.id: r.component for r in connected_components(df).collect()}
        assert got == want, f"trial {trial}"


def test_span_corruption_rate_and_determinism(spark):
    """Property: masking rate tracks rate_num/rate_den over a large
    corpus, and reruns are bit-identical."""
    import pyspark.sql.functions as F

    from iceberg_geo_poc_spark.operators.text import span_corruption

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(60))) for i in range(200)],
        "doc_id LONG, text STRING",
    )
    out1 = span_corruption(docs).orderBy("doc_id").collect()
    out2 = span_corruption(docs).orderBy("doc_id").collect()
    assert out1 == out2
    masked = sum(len(r.target.split()) - r.n_spans for r in out1)
    total = 200 * 60
    rate = masked / total
    assert 0.15 < rate < 0.26  # 20/97 ~ 0.206


def test_connected_components_raises_on_round_budget(spark):
    """An exhausted round budget with labels still moving must raise,
    not silently return non-minimum labels (a quietly-wrong dedup
    keyspace is worse than a failure)."""
    from iceberg_geo_poc_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(chain, "a LONG, b LONG")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=2)


def test_hard_negative_mining_edge_inputs(spark):
    """No lexical match for any query -> empty typed frame (not
    IndexError); a positive without an embedding row -> that query is
    skipped (not KeyError)."""
    from iceberg_geo_poc_spark.operators.retrieval import hard_negative_mining

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id LONG, text STRING",
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.5, 0.5])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    out = hard_negative_mining(docs, emb, [(10, "nomatch wordsoup")])
    assert out.count() == 0
    assert out.columns == [
        "query_id", "positive_id", "negative_id", "cosine", "neg_rank"
    ]
    # positive (doc 1) has no embedding: drop vec 1 from emb
    out2 = hard_negative_mining(
        docs, emb.filter("vec_id != 1"), [(11, "alpha beta")]
    )
    assert out2.count() == 0


def test_span_corruption_long_agrees_with_array_form(spark):
    """The O(len) posexplode+window variant must agree byte-for-byte
    with the array-algebra form — including on a 50k-token document,
    where the array form's O(len^2) prefix slice-fold is the reason the
    long variant exists."""
    from iceberg_geo_poc_spark.operators.text import (
        span_corruption,
        span_corruption_long,
    )

    long_doc = " ".join(f"w{i % 997}" for i in range(50_000))
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "single"),
        (3, "a b"),
        (7, long_doc),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    a = {r.doc_id: (r.corrupted, r.target, r.n_spans)
         for r in span_corruption(df).collect()}
    b = {r.doc_id: (r.corrupted, r.target, r.n_spans)
         for r in span_corruption_long(df).collect()}
    assert set(a) == set(b) == {1, 2, 3, 7}
    for k in a:
        assert a[k] == b[k], f"doc {k} diverged"
    assert a[7][2] > 100  # the long doc actually has many spans


def test_fim_transform_partition_and_edges(spark):
    """FIM splice must reconstruct the document exactly (prefix ++
    middle ++ suffix = tokens, counts sum to len) and short docs pass
    through unchanged."""
    from iceberg_geo_poc_spark.operators.text import fim_transform

    rows = [
        (5, "alpha beta gamma delta epsilon zeta"),
        (11, "one two three four"),
        (2, "tiny doc"),   # < 3 tokens: pass-through
        (3, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r.doc_id: r for r in fim_transform(df).collect()}
    for doc_id, text in rows:
        r = out[doc_id]
        n = len(text.split(" "))
        assert r.n_prefix + r.n_middle + r.n_suffix == n
        if n < 3:
            assert r.fim_text == text
        else:
            assert r.fim_text.startswith("<PRE> ")
            body = r.fim_text
            pre, rest = body[6:].split(" <SUF> ", 1)
            suf, mid = rest.split(" <MID> ", 1)
            toks = [t for t in (pre.split(" ") + mid.split(" ") + suf.split(" ")) if t]
            assert toks == text.split(" ")


def test_top_n_per_group_exact_and_pushed_down(spark):
    """top_n_per_group equals the reference single-window semantics on
    skewed input (one dominant group, one group smaller than N), and —
    the scale property — Spark's WindowGroupLimit rewrites the
    rank-limit window with a PARTIAL map-side top-N before the shuffle,
    so the hot domain never funnels its full row set through one task.
    The Partial operator's presence is asserted so an optimizer
    regression or a pushdown-defeating plan change fails loudly."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from iceberg_geo_poc_spark.operators.sampling import top_n_per_group

    rows = [("big", i, float((i * 37) % 101)) for i in range(500)]
    rows += [("small", i, float(i)) for i in range(3)]  # fewer than N rows
    df = spark.createDataFrame(rows, "g STRING, id LONG, score DOUBLE")
    got = {
        (r.g, r.id, r.rank)
        for r in top_n_per_group(df, "g", "score", "id", n=7).collect()
    }
    w = Window.partitionBy("g").orderBy(F.desc("score"), F.asc("id"))
    want = {
        (r.g, r.id, r.rank)
        for r in df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter("rank <= 7")
        .collect()
    }
    assert got == want
    plan = (
        top_n_per_group(df, "g", "score", "id", n=7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    partials = [
        l for l in plan.splitlines()
        if "WindowGroupLimit" in l and "Partial" in l
    ]
    assert partials, "map-side Partial WindowGroupLimit missing from plan"


def test_chunk_dedup_first_occurrence_and_reassembly(spark):
    """Hand-computed CCNet chunk dedup: corpus-wide first occurrence by
    (doc_id, pos); later repeats of a chunk drop; reassembly preserves
    position order and a fully-duplicated doc reassembles to ''."""
    from iceberg_geo_poc_spark.operators.dedup import chunk_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # chunks: 'a b', 'c d'
            (2, "a b x y c d"),      # 'a b' dup, 'x y' new, 'c d' dup
            (3, "a b"),              # fully duplicated
            (4, "c d e"),            # 'c d' dup, trailing short chunk 'e'
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.kept_text)
        for r in chunk_dedup(docs, chunk_words=2).collect()
    }
    assert got == {
        1: (2, 2, "a b c d"),
        2: (3, 1, "x y"),
        3: (1, 0, ""),
        4: (2, 1, "e"),
    }
    # the election window must ride the map-side Partial WindowGroupLimit
    # shape? (rank window, no filter<=k, so no: just assert no cartesian)
    plan = (
        chunk_dedup(docs, chunk_words=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_remove_duplicate_spans_hand_computed(spark):
    """ExactSubstr span removal (Lee et al. 2022): first occurrence
    corpus-wide survives; later occurrences (across AND within docs)
    excise; overlapping/adjacent windows merge into maximal spans;
    short docs pass through; both gram-key paths (xxhash64 / raw text)
    elect identical spans."""
    from iceberg_geo_poc_spark.operators.dedup import remove_duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),             # owns a..h (pos 0)
            (2, "x x a b c d e f g h tail words"),  # dup window at pos 2
            (3, "short doc"),                       # < k tokens: unchanged
            # both halves duplicate doc 1's opening 8-gram; the two
            # windows [0,7] and [8,15] are adjacent -> ONE merged span
            (4, "a b c d e f g h a b c d e f g h"),
        ],
        "doc_id BIGINT, text STRING",
    )
    expect = {
        1: (0, 0, "a b c d e f g h i j"),
        2: (1, 8, "x x tail words"),
        3: (0, 0, "short doc"),
        4: (1, 16, ""),
    }
    for hash_grams in (True, False):
        got = {
            r.doc_id: (r.n_dup_spans, r.n_dropped_tokens, r.clean_text)
            for r in remove_duplicate_spans(
                docs, k=8, hash_grams=hash_grams
            ).collect()
        }
        assert got == expect, f"hash_grams={hash_grams}"
    # scale posture: no cartesian product; the election is a groupBy
    plan = (
        remove_duplicate_spans(docs, k=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_remove_duplicate_spans_overlapping_windows_merge(spark):
    """A long repeated run produces many overlapping dup windows — they
    must merge into one span covering exactly the repeat."""
    from iceberg_geo_poc_spark.operators.dedup import remove_duplicate_spans

    run = " ".join(f"w{i}" for i in range(12))  # 12-token run
    docs = spark.createDataFrame(
        [(1, run + " unique tail one"), (2, "lead in " + run)],
        "doc_id BIGINT, text STRING",
    )
    got = {
        r.doc_id: (r.n_dup_spans, r.n_dropped_tokens, r.clean_text)
        for r in remove_duplicate_spans(docs, k=8).collect()
    }
    # doc 2's copy of the run = 5 overlapping 8-windows (starts 2..6)
    # merging to [2, 13]: exactly the 12 repeated tokens drop
    assert got[1] == (0, 0, run + " unique tail one")
    assert got[2] == (1, 12, "lead in")


def test_gopher_rules_signals_and_keep(spark):
    """Each Gopher signal hand-checked on crafted docs, plus the keep
    conjunction and threshold parameters."""
    from iceberg_geo_poc_spark.operators.text import gopher_rules

    docs = spark.createDataFrame(
        [
            # 6 words, all alpha, stopwords the+and, no symbols
            (1, "the cat and dog ran far"),
            # too short
            (2, "the end"),
            # symbol-heavy: 2 '#' in 4 words = 0.5 > 0.1
            (3, "the # price # and"),
            # numeric words: alpha frac 2/4 = 0.5 < 0.8
            (4, "the 123 456 and"),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {
        r.doc_id: r
        for r in gopher_rules(
            docs, min_words=4, min_mean_word_len=1.0,
            required_stopwords=["the", "and"], min_stopword_hits=2,
        ).collect()
    }
    assert out[1].n_words == 6 and out[1].keep
    assert out[1].stopword_hits == 2
    assert abs(out[1].mean_word_len - (3+3+3+3+3+3) / 6) < 1e-9
    assert not out[2].keep            # word count
    assert not out[3].keep            # symbol ratio
    assert out[3].symbol_word_ratio == 0.4  # 2 symbols / 5 words
    assert not out[4].keep            # alpha fraction
    assert out[4].alpha_word_frac == 0.5


def test_fixed_block_spans_straddle_arithmetic(spark):
    """Spans partition the global token stream exactly: per-block token
    sums equal the block size (except the tail), per-doc spans cover the
    doc contiguously, and straddling docs split at block boundaries."""
    from iceberg_geo_poc_spark.operators.sampling import fixed_block_spans

    docs = spark.createDataFrame(
        [(0, 3), (1, 10), (2, 4), (3, 0), (4, 7)],
        "doc_id BIGINT, n_tok BIGINT",
    )
    # stream: doc0 [0,3) doc1 [3,13) doc2 [13,17) doc3 empty doc4 [17,24)
    # blocks of 8: b0=[0,8) b1=[8,16) b2=[16,24)
    rows = fixed_block_spans(
        docs, "doc_id", "n_tok", block=8, chunk=2
    ).collect()
    got = {(r.block_id, r.doc_id): (r.start_tok, r.n_toks) for r in rows}
    assert got == {
        (0, 0): (0, 3),
        (0, 1): (0, 5),
        (1, 1): (5, 5),
        (1, 2): (0, 3),
        (2, 2): (3, 1),
        (2, 4): (0, 7),
    }
    # empty docs emit no span; coverage per doc is exact
    import collections

    per_doc = collections.defaultdict(int)
    for (b, d), (s, n) in got.items():
        per_doc[d] += n
    assert per_doc == {0: 3, 1: 10, 2: 4, 4: 7}


def test_margin_bitext_mining_hand_computed(spark):
    """Tiny 2D hand-check: an isolated translation pair clears the
    margin while a source inside a dense cluster does not — the margin
    criterion (ratio form) rejects high-cosine-but-unexceptional pairs."""
    import math

    from iceberg_geo_poc_spark.operators.retrieval import margin_bitext_mining

    def v(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    # src 0 at 0deg has a near-exact target (1deg) far from the cluster;
    # src 2/4 sit inside a dense 90deg cluster where all targets are
    # equally close (margin ~1)
    src = spark.createDataFrame(
        [(0, v(0.0)), (2, v(90.0)), (4, v(91.0))],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    tgt = spark.createDataFrame(
        [(1, v(1.0)), (3, v(89.0)), (5, v(90.5)), (7, v(89.5))],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    got = {
        r.src_id: (r.tgt_id, r.margin)
        for r in margin_bitext_mining(src, tgt, k=3, threshold=1.5).collect()
    }
    # the isolated pair towers over both neighborhoods (margin ~2.9);
    # cluster members' best candidates are unexceptional (~1.2) and
    # fall below the mining threshold
    assert got.keys() == {0}
    assert got[0][0] == 1
    assert got[0][1] > 2.5
    lo = {
        r.src_id: r.margin
        for r in margin_bitext_mining(src, tgt, k=3, threshold=1.0).collect()
    }
    assert 1.0 <= lo[2] < 1.3 and 1.0 <= lo[4] < 1.3


def _nested_loop_nodes(df):
    """All CartesianProduct/BroadcastNestedLoopJoin nodes in the
    executed plan, via the JVM tree (the string form hides outputs)."""
    found = []

    def walk(node):
        name = node.nodeName()
        if "NestedLoop" in name or "Cartesian" in name:
            found.append(node)
        # AQE and caching hide producers behind leaf-ish wrapper nodes;
        # recurse through each wrapper's real child accessor
        if "AdaptiveSparkPlan" in name:
            walk(node.executedPlan())
        elif "QueryStage" in name:
            walk(node.plan())
        elif "InMemoryTableScan" in name:
            walk(node.relation().cachedPlan())
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return found


def test_margin_bitext_bucketed_recall_and_plan(spark, emb):
    """The bucketed miner's contract: >= 0.9 of the brute miner's
    accepted pairs reproduced, and every all-pairs join in the plan
    carries only fixed-width long columns (ids + sign signatures) —
    the wide embedding arrays never meet in a cross join."""
    from iceberg_geo_poc_spark.operators.retrieval import (
        margin_bitext_mining,
        margin_bitext_mining_bucketed,
    )

    src = emb.filter("vec_id % 2 = 0").select("vec_id", "embedding")
    tgt = emb.filter("vec_id % 2 = 1").select("vec_id", "embedding")
    brute = {
        r.src_id: r.tgt_id
        for r in margin_bitext_mining(src, tgt, k=4, threshold=1.02).collect()
    }
    approx_df = margin_bitext_mining_bucketed(
        src, tgt, k=4, threshold=1.02, shortlist=80
    )
    approx = {r.src_id: r.tgt_id for r in approx_df.collect()}
    hits = sum(1 for s, t in brute.items() if approx.get(s) == t)
    assert brute, "brute miner found nothing — testdata changed?"
    recall = hits / len(brute)
    assert recall >= 0.9, f"bucketed recall {recall:.3f} < 0.9 contract"
    # plan shape: all-pairs joins are signature-only (every output
    # attribute is a LongType — no array-typed column crosses).
    # Asserted on the inspection form: the public entry's eager
    # checkpoint (cache-release hygiene) truncates the observable plan.
    plan_df = margin_bitext_mining_bucketed(
        src, tgt, k=4, threshold=1.02, shortlist=80, _materialize=False
    )
    nodes = _nested_loop_nodes(plan_df)
    assert nodes, "expected the signature stage to be an all-pairs join"
    for node in nodes:
        out = node.output()
        for i in range(out.size()):
            attr = out.apply(i)
            tname = attr.dataType().typeName()
            assert tname in ("long", "integer"), (
                f"non-fixed-width column {attr.name()}:{tname} in the "
                "all-pairs join — wide arrays must not cross-join"
            )


def test_margin_bitext_banded_no_all_pairs_join(spark):
    """The band_bits form (CCMatrix-scale regime): at translation-pair
    similarity (cosine >= 0.9 here) banded signature equi-joins recover
    >= 0.9 of the brute miner's pairs with NO all-pairs join of any
    kind in the plan — candidates come only from exact band matches."""
    import numpy as np

    from iceberg_geo_poc_spark.operators.retrieval import (
        margin_bitext_mining,
        margin_bitext_mining_bucketed,
    )

    rng = np.random.default_rng(5)
    base = rng.standard_normal((60, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # targets = noisy copies of sources (true translation pairs, cosine
    # ~0.93 — the similarity regime real bitext pairs occupy) plus
    # unrelated distractors
    noisy = base + 0.05 * rng.standard_normal((60, 64))
    distract = rng.standard_normal((60, 64))
    src = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(60)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    tgt_rows = [
        (1000 + i, [float(x) for x in noisy[i]]) for i in range(60)
    ] + [(2000 + i, [float(x) for x in distract[i]]) for i in range(60)]
    tgt = spark.createDataFrame(
        tgt_rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    brute = {
        r.src_id: r.tgt_id
        for r in margin_bitext_mining(src, tgt, k=4, threshold=1.05).collect()
    }
    assert len(brute) >= 30, f"expected many true pairs, got {len(brute)}"
    banded_df = margin_bitext_mining_bucketed(
        src, tgt, k=4, threshold=1.05, shortlist=40, band_bits=8
    )
    banded = {r.src_id: r.tgt_id for r in banded_df.collect()}
    hits = sum(1 for a, b in brute.items() if banded.get(a) == b)
    recall = hits / len(brute)
    assert recall >= 0.9, f"banded recall {recall:.3f} < 0.9"
    # plan assertion on the inspection form: the public entry's eager
    # checkpoint (cache-release hygiene) truncates the observable plan
    banded_plan_df = margin_bitext_mining_bucketed(
        src, tgt, k=4, threshold=1.05, shortlist=40, band_bits=8,
        _materialize=False,
    )
    assert not _nested_loop_nodes(banded_plan_df), (
        "banded form must contain NO all-pairs join"
    )


def test_preference_pairs_hand_computed(spark):
    """Best-vs-worst pairing with deterministic tie-breaks and the
    margin gate; single-candidate groups drop (chosen == rejected)."""
    from iceberg_geo_poc_spark.operators.sampling import preference_pairs

    df = spark.createDataFrame(
        [
            ("p1", 1, 0.9), ("p1", 2, 0.3), ("p1", 3, 0.9),  # tie on max
            ("p2", 4, 0.5), ("p2", 5, 0.48),                 # thin margin
            ("p3", 6, 0.7),                                  # singleton
        ],
        "g STRING, id BIGINT, score DOUBLE",
    )
    got = {
        r.g: (r.chosen_id, r.rejected_id, r.margin)
        for r in preference_pairs(df, "g", "score", "id", min_margin=0.1).collect()
    }
    # p1: chosen = smallest id among maxima (1), rejected = argmin (2)
    assert got == {"p1": (1, 2, 0.6)}
    loose = {
        r.g
        for r in preference_pairs(df, "g", "score", "id", min_margin=0.0).collect()
    }
    assert loose == {"p1", "p2"}  # singleton p3 still dropped


def test_hyperplane_signs_are_diverse():
    """Deterministic-random infrastructure needs a SPREAD assertion,
    not just value parity: through round 10 every LSH plane was the
    identical +-1 vector (an LCG's lowest bit alternates with period
    2), collapsing all 2^P buckets to {0, 2^P-1} — and both engines
    happily agreed on the broken buckets.  Planes must be pairwise
    near-orthogonal and buckets must actually spread."""
    import numpy as np

    from iceberg_geo_poc_spark.operators.hashing import hyperplane_signs

    P = np.array(hyperplane_signs(8, 64))
    corr = P @ P.T / 64.0
    off = np.abs(corr[np.triu_indices(8, 1)])
    assert off.max() < 0.5, f"correlated planes: max |corr| {off.max():.2f}"
    # sign buckets over deterministic pseudo-random vectors spread far
    # beyond the 2 buckets the broken generator produced
    rng = np.random.default_rng(11)
    v = rng.standard_normal((500, 64))
    buckets = ((v @ P.T) >= 0).astype(int) @ (1 << np.arange(8))
    assert len(set(buckets.tolist())) > 100, len(set(buckets.tolist()))
