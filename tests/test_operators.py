"""Operator-level tests beyond the oracle gate: ANN recall quality,
multimodal mapInPandas plumbing, and dedup block behavior."""

import pytest
from pyspark.sql import functions as F

from etl_spark.operators.multimodal import decode_stub, docs_as_media, extract_features
from etl_spark.operators.similarity import cosine_topk, lsh_cosine_topk
from etl_spark.operators.textdedup import minhash_lsh_pairs

SF_DIR = "/root/testdata/sf0.001"


def test_lsh_topk_recall_vs_brute(spark):
    """LSH is approximate; on clustered embeddings the same-bucket
    neighbors must still recover a solid fraction of the true top-5."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    probes = e.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    brute = cosine_topk(e, probes, k=5).select("query_id", "neighbor_id").collect()
    approx = lsh_cosine_topk(e, probes, k=5).select("query_id", "neighbor_id").collect()
    truth = {(r.query_id, r.neighbor_id) for r in brute}
    got = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.3, f"LSH recall collapsed: {recall}"


def test_ivf_topk_recall_vs_brute(spark):
    """IVF probes only n_probe cells, so it's approximate — but an exact
    clone of a query vector lands in the query's own best cell (identical
    centroid cosines), so planted clones must always be found at rank 1,
    and overall recall vs brute force must be solid on real embeddings."""
    from etl_spark.operators.similarity import ivf_cosine_topk

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    probes = e.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    brute = cosine_topk(e, probes, k=5).select("query_id", "neighbor_id").collect()
    approx = ivf_cosine_topk(e, probes, k=5).select("query_id", "neighbor_id").collect()
    truth = {(r.query_id, r.neighbor_id) for r in brute}
    got = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"IVF recall collapsed: {recall}"

    # planted clone: vec_id+10000 duplicates each probe vector exactly
    clones = probes.select(
        (F.col("query_id") + 10000).alias("vec_id"), F.col("qv").alias("embedding")
    )
    top1 = (
        ivf_cosine_topk(e.select("vec_id", "embedding").unionByName(clones), probes, k=1)
        .select("query_id", "neighbor_id")
        .collect()
    )
    for r in top1:
        assert r.neighbor_id == r.query_id + 10000, (
            f"clone of {r.query_id} not recalled at rank 1: got {r.neighbor_id}"
        )


def test_multimodal_batching_and_stub(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(7)
    media = docs_as_media(docs)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == docs.count()
    r0 = {r.media_id: r for r in rows}[0]
    assert r0.n_bytes > 0 and 16 <= r0.width < 656 and 16 <= r0.height < 496
    # bmp/png/jpeg/mp4 all decode for real now; an actually-absent codec
    # must still fail loudly, and junk under a real mime is a ValueError
    with pytest.raises(NotImplementedError):
        decode_stub(b"II*\x00", "image/tiff")
    with pytest.raises(ValueError):
        decode_stub(b"\xff\xd8\xff\xe0", "image/jpeg")  # truncated header


def test_minhash_lsh_finds_exact_dups(spark):
    """Two identical texts must always collide in every band and verify
    at jaccard=1.0."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "totally different words entirely here now")],
        ["doc_id", "text"],
    )
    pairs = minhash_lsh_pairs(df).collect()
    assert {(r.doc_a, r.doc_b, r.jaccard) for r in pairs} == {(1, 2, 1.0)}


def test_skewed_block_routes_through_lsh(spark):
    """The VERDICT scale-killer scenario: ONE hot block (single label /
    single source+length bucket) that the blocked-quadratic forms must
    refuse (guard drops it → no output) while the LSH-composed forms
    process in near-linear time and still find the planted near-dups.

    N=20k here stands in for the 10^7-row production block: quadratic
    would be 2·10^8 pair comparisons, the LSH path touches only
    bucket-colliding candidates.
    """
    import time

    from pyspark.sql import functions as F
    from etl_spark.operators.similarity import (
        embedding_near_dups,
        embedding_near_dups_lsh,
    )
    from etl_spark.operators.textdedup import ngram_jaccard_lsh, ngram_jaccard_pairs

    n = 20_000
    dups = 40  # planted pairs: vec i and i+n share identical bits
    # deterministic pseudo-random vectors from md5 bits (no RNG in tests)
    ids = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.lit("hot").alias("label"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda d: (
                F.conv(
                    F.substring(F.md5(F.concat((F.col("id") % n).cast("string"),
                                               F.lit("|"), d.cast("string"))), 1, 4),
                    16, 10,
                ).cast("double") / 65535.0 - 0.5
            ),
        ).alias("embedding"),
    )
    clones = spark.range(dups).select(
        (F.col("id") + n).alias("vec_id"),
        F.lit("hot").alias("label"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda d: (
                F.conv(
                    F.substring(F.md5(F.concat((F.col("id") % n).cast("string"),
                                               F.lit("|"), d.cast("string"))), 1, 4),
                    16, 10,
                ).cast("double") / 65535.0 - 0.5
            ),
        ).alias("embedding"),
    )
    vecs = ids.unionAll(clones)

    # quadratic form: the single hot block exceeds max_block → dropped
    assert embedding_near_dups(vecs, max_block=n - 1).count() == 0

    t0 = time.time()
    got = embedding_near_dups_lsh(
        vecs, threshold=0.9999, num_tables=4, planes_per_table=16, max_bucket=50
    ).collect()
    lsh_wall = time.time() - t0
    planted = {(float(i), float(i + n)) for i in range(dups)}
    found = {(float(r.id_a), float(r.id_b)) for r in got}
    assert planted <= found  # exact clones collide in every table
    assert lsh_wall < 120, f"LSH near-dup took {lsh_wall:.0f}s on one hot block"

    # text twin: one source, one length bucket → quadratic refuses
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("s").alias("source"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(11)),
                lambda w: F.substring(
                    F.md5(F.concat((F.col("id") % n).cast("string"),
                                   F.lit("w"), w.cast("string"))), 1, 8),
            ),
        ).alias("text"),
    )
    doc_clones = spark.range(dups).select(
        (F.col("id") + n).alias("doc_id"),
        F.lit("s").alias("source"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(11)),
                lambda w: F.substring(
                    F.md5(F.concat((F.col("id") % n).cast("string"),
                                   F.lit("w"), w.cast("string"))), 1, 8),
            ),
        ).alias("text"),
    )
    corpus = docs.unionAll(doc_clones)
    assert ngram_jaccard_pairs(corpus, max_block=n - 1).count() == 0

    t0 = time.time()
    tgot = ngram_jaccard_lsh(corpus, threshold=0.99).collect()
    t_wall = time.time() - t0
    tfound = {(r.doc_a, r.doc_b) for r in tgot}
    assert {(i, i + n) for i in range(dups)} <= tfound
    assert t_wall < 180, f"LSH ngram dedup took {t_wall:.0f}s on one hot block"


def test_pack_sequences_greedy_invariants(spark):
    """Every pack obeys the budget unless a single document exceeds it,
    packs are contiguous per shard, and membership is deterministic."""
    from etl_spark.operators.mlprep import pack_sequences

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = pack_sequences(docs, budget=64, n_shards=4).toPandas()
    assert len(out) == docs.count()
    for (_, pack), grp in out.groupby(["shard", "pack_id"]):
        total = grp.n_tokens.sum()
        assert total <= 64 or len(grp) == 1, (pack, total, len(grp))
    # pack ids contiguous from 0 per shard
    for shard, grp in out.groupby("shard"):
        ids = sorted(grp.pack_id.unique())
        assert ids == list(range(len(ids)))
    # deterministic across reruns
    again = pack_sequences(docs, budget=64, n_shards=4).toPandas()
    assert out.sort_values("doc_id", ignore_index=True).equals(
        again.sort_values("doc_id", ignore_index=True)
    )


def test_near_dup_clusters_consistency(spark):
    """Both endpoints of every LSH pair land in the same cluster and the
    cluster id is the smallest member id."""
    from etl_spark.operators.mlprep import near_dup_clusters
    from etl_spark.operators.textdedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    clusters = near_dup_clusters(docs).toPandas()
    label = dict(zip(clusters.doc_id, clusters.cluster_id))
    pairs = minhash_lsh_pairs(docs).toPandas()
    for a, b in zip(pairs.doc_a, pairs.doc_b):
        assert label[a] == label[b], (a, b)
    for cid, grp in clusters.groupby("cluster_id"):
        assert cid == grp.doc_id.min()


def test_dataset_split_stability(spark):
    """Split assignment depends only on (salt, id): subsetting the corpus
    never moves a surviving document between splits."""
    from etl_spark.operators.mlprep import dataset_split

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    full = dataset_split(docs).toPandas()
    frac = full.split.value_counts(normalize=True)
    assert 0.8 < frac.get("train", 0) < 0.98
    sub = dataset_split(docs.where(F.col("doc_id") % 2 == 0)).toPandas()
    merged = sub.merge(full, on="doc_id", suffixes=("_sub", "_full"))
    assert (merged.split_sub == merged.split_full).all()


def test_pack_sequences_string_doc_ids(spark):
    """pack_sequences keeps the corpus's own id type: a string-id corpus
    packs without the bigint-only output-schema failure."""
    from etl_spark.operators.mlprep import pack_sequences

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .withColumn("doc_id", F.concat(F.lit("doc-"), F.col("doc_id")))
        .limit(500)
    )
    out = pack_sequences(docs, budget=64, n_shards=2).toPandas()
    assert len(out) == 500
    assert out.doc_id.map(lambda s: isinstance(s, str)).all()


def test_stratified_sample_skewed_stratum_no_serial_sort(spark):
    """A single hot stratum (10^5 rows, all one lang) must not serialize
    into one sort task: the histogram-threshold plan's only row_number
    window partitions by (stratum, hash-bin), never by the stratum alone,
    and the output still equals the naive full-sort selection."""
    from pyspark.sql import Window

    from etl_spark.operators.mlprep import stratified_sample, uniform_hash

    docs = spark.range(100_000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    out = stratified_sample(docs, 0.03)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the row_number sort is keyed by the hash bin → max sort partition
    # ≈ n/8192, regardless of stratum skew
    assert "_bin" in plan and "row_number" in plan
    # no Window partitioned by lang without _bin (prefix-sum windows over
    # the 8192-row histogram are fine; they are bounded by bin count)
    got = out.toPandas().sort_values("doc_id", ignore_index=True)
    w = Window.partitionBy("lang").orderBy(uniform_hash(F.col("doc_id"), "sample-v1"), F.col("doc_id"))
    wn = Window.partitionBy("lang")
    naive = (
        docs.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .where(F.col("_rk") <= F.ceil(F.col("_n") * F.lit(0.03)))
        .select("doc_id", "lang")
        .toPandas().sort_values("doc_id", ignore_index=True)
    )
    assert len(got) == 3000
    assert got.equals(naive)


def test_bmp_codec_roundtrip():
    """Pure-NumPy BMP encode/decode: every stride-padding case (w%4 in
    0..3), bottom-up row order recovered, padding excluded from stats."""
    import numpy as np

    from etl_spark.operators.multimodal import decode_bmp, encode_bmp

    for w in (4, 5, 6, 7, 640):
        h = 5
        px = np.arange(h * w * 3, dtype=np.int64).reshape(h, w, 3) % 256
        px = px.astype(np.uint8)
        d = decode_bmp(encode_bmp(px))
        assert (d["width"], d["height"]) == (w, h)
        assert abs(d["mean_px"] - float(px.mean())) < 1e-9
        assert abs(d["top_row_mean"] - float(px[0].mean())) < 1e-9


def _dib(w, h, bpp, comp, pixdata, pal=b"", clr_used=0):
    """Hand-build a BMP file around a raw pixel stream (BITMAPINFOHEADER)."""
    import struct

    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp, len(pixdata),
                       2835, 2835, clr_used, 0)
    off = 14 + 40 + len(pal)
    head = struct.pack("<2sIHHI", b"BM", off + len(pixdata), 0, 0, off)
    return head + info + pal + pixdata


def test_bmp_all_variants():
    """Full DIB surface: 1/4/8-bit palette, 16-bit 555 and 565
    bitfields, 32-bit BGRX and RGBX bitfields, top-down row order —
    stats match a closed-form NumPy oracle exactly."""
    import struct

    import numpy as np

    from etl_spark.operators.multimodal import decode_bmp

    rng = np.random.default_rng(13)
    w, h = 6, 4
    palrgb = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palrgb)

    # 8-bit palette, bottom-up
    idx = rng.integers(0, 16, (h, w), dtype=np.uint8)
    stride = (w + 3) // 4 * 4
    pix = b"".join(idx[y].tobytes() + b"\x00" * (stride - w)
                   for y in range(h - 1, -1, -1))
    d = decode_bmp(_dib(w, h, 8, 0, pix, pal, 16))
    exp = palrgb[idx]
    assert abs(d["mean_px"] - exp.mean()) < 1e-9
    assert abs(d["top_row_mean"] - exp[0].mean()) < 1e-9

    # 4-bit palette (two pixels per byte, high nibble first)
    idx4 = rng.integers(0, 16, (h, w), dtype=np.uint8)
    stride4 = (w * 4 + 31) // 32 * 4
    pix4 = b"".join(
        (np.packbits(np.unpackbits(idx4[y].reshape(-1, 1), axis=1,
                                   count=8)[:, 4:]).tobytes()
         + b"\x00" * 8)[:stride4]
        for y in range(h - 1, -1, -1))
    d = decode_bmp(_dib(w, h, 4, 0, pix4, pal, 16))
    assert abs(d["mean_px"] - palrgb[idx4].mean()) < 1e-9

    # 1-bit, width not a multiple of 8
    idx1 = rng.integers(0, 2, (h, 10), dtype=np.uint8)
    pal2rgb = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    stride1 = (10 + 31) // 32 * 4
    pix1 = b"".join((np.packbits(idx1[y]).tobytes() + b"\x00" * 4)[:stride1]
                    for y in range(h - 1, -1, -1))
    d = decode_bmp(_dib(10, h, 1, 0, pix1,
                        b"\x00\x00\x00\x00\xff\xff\xff\x00", 2))
    assert abs(d["mean_px"] - pal2rgb[idx1].mean()) < 1e-9

    # 16-bit: default 555, then 565 via BI_BITFIELDS masks
    r5, g5, b5 = (rng.integers(0, 32, (h, w), dtype=np.uint16) for _ in range(3))
    stride16 = (w * 16 + 31) // 32 * 4
    px555 = (r5 << 10) | (g5 << 5) | b5
    pix16 = b"".join((px555[y].astype("<u2").tobytes() + b"\x00" * 4)[:stride16]
                     for y in range(h - 1, -1, -1))
    d = decode_bmp(_dib(w, h, 16, 0, pix16))
    exp555 = np.stack([(c.astype(np.uint32) * 255) // 31
                       for c in (r5, g5, b5)], axis=2)
    assert abs(d["mean_px"] - exp555.mean()) < 1e-9
    masks = struct.pack("<III", 0xF800, 0x7E0, 0x1F)
    px565 = (r5 << 11) | ((g5 * 2) << 5) | b5
    pix565 = b"".join((px565[y].astype("<u2").tobytes() + b"\x00" * 4)[:stride16]
                      for y in range(h - 1, -1, -1))
    d = decode_bmp(_dib(w, h, 16, 3, pix565, masks))
    exp565 = np.stack([(r5.astype(np.uint32) * 255) // 31,
                       ((g5 * 2).astype(np.uint32) * 255) // 63,
                       (b5.astype(np.uint32) * 255) // 31], axis=2)
    assert abs(d["mean_px"] - exp565.mean()) < 1e-9

    # 32-bit BGRX, TOP-DOWN (negative height => no flip)
    img32 = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    rows = b"".join(bytes([img32[y, x, 2], img32[y, x, 1], img32[y, x, 0], 0])
                    for y in range(h) for x in range(w))
    d = decode_bmp(_dib(w, -h, 32, 0, rows))
    assert abs(d["mean_px"] - img32.mean()) < 1e-9
    assert abs(d["top_row_mean"] - img32[0].mean()) < 1e-9

    # 32-bit BI_BITFIELDS with an RGBX (red-low) layout
    masks32 = struct.pack("<III", 0xFF, 0xFF00, 0xFF0000)
    rows2 = b"".join(bytes([img32[y, x, 0], img32[y, x, 1], img32[y, x, 2], 0])
                     for y in range(h - 1, -1, -1) for x in range(w))
    d = decode_bmp(_dib(w, h, 32, 3, rows2, masks32))
    assert abs(d["top_row_mean"] - img32[0].mean()) < 1e-9


def test_bmp_rle_decode():
    """RLE8/RLE4 (comp 1/2): encoded runs (RLE4 alternates the value
    byte's nibbles), absolute mode with word padding, end-of-line,
    delta jumps, and end-of-bitmap all reconstruct the planted index
    grid; RLE with a mismatched bit depth is malformed."""
    import numpy as np
    import pytest

    from etl_spark.operators.multimodal import decode_bmp

    rng = np.random.default_rng(17)
    palrgb = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palrgb)

    stream8 = bytes([4, 5, 2, 1, 0, 0,       # run 4×5, run 2×1, EOL
                     0, 3, 2, 3, 4, 0,       # absolute [2,3,4] + pad
                     3, 0, 0, 0,             # run 3×0, EOL
                     0, 2, 2, 0,             # delta: +2 x
                     4, 7, 0, 1])            # run 4×7, EOF
    stored8 = np.array([[5, 5, 5, 5, 1, 1],
                        [2, 3, 4, 0, 0, 0],
                        [0, 0, 7, 7, 7, 7]])
    d = decode_bmp(_dib(6, 3, 8, 1, stream8, pal, 8))
    exp = palrgb[stored8][::-1]  # stored bottom-up -> visual flip
    assert abs(d["mean_px"] - exp.mean()) < 1e-9
    assert abs(d["top_row_mean"] - exp[0].mean()) < 1e-9

    stream4 = bytes([5, 0x12, 0, 0,              # run 5 alternating 1,2
                     0, 3, 0x34, 0x50, 2, 0x66,  # absolute [3,4,5], run 2×6
                     0, 1])
    stored4 = np.array([[1, 2, 1, 2, 1], [3, 4, 5, 6, 6]])
    d = decode_bmp(_dib(5, 2, 4, 2, stream4, pal, 8))
    exp4 = palrgb[stored4][::-1]
    assert abs(d["mean_px"] - exp4.mean()) < 1e-9

    with pytest.raises(ValueError):
        decode_bmp(_dib(5, 2, 8, 2, stream4, pal, 8))  # RLE4 needs bpp=4


def test_png_codec_roundtrip():
    """Pure NumPy+zlib PNG encode/decode (W3C spec): dimensions and
    pixel stats recovered exactly."""
    import numpy as np

    from etl_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    d = decode_png(encode_png(px))
    assert (d["width"], d["height"]) == (21, 13)
    assert abs(d["mean_px"] - float(px.mean())) < 1e-9
    assert abs(d["top_row_mean"] - float(px[0].mean())) < 1e-9


def test_png_decoder_all_filters_and_rgba():
    """Adversarial decode: scanlines filtered per-spec with every filter
    type (None/Sub/Up/Average/Paeth, cycling by row) by an independent
    forward-filter implementation, plus an RGBA (color type 6) image —
    the decoder must reconstruct both exactly, not just its own
    encoder's filter-0 output."""
    import struct
    import zlib

    import numpy as np

    from etl_spark.operators.multimodal import _PNG_SIG, decode_png

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    def forward_filter(pixels):
        h, w, bpp = pixels.shape
        flat = pixels.reshape(h, w * bpp).astype(np.int32)
        lines = []
        for y in range(h):
            f, cur = y % 5, flat[y]
            prior = flat[y - 1] if y else np.zeros(w * bpp, dtype=np.int32)
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, dtype=np.int32), prior[:-bpp]])
            if f == 0:
                filt = cur
            elif f == 1:
                filt = cur - left
            elif f == 2:
                filt = cur - prior
            elif f == 3:
                filt = cur - ((left + prior) // 2)
            else:
                p = left + prior - ul
                pa, pb, pc = abs(p - left), abs(p - prior), abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left,
                    np.where(pb <= pc, prior, ul),
                )
                filt = cur - pred
            lines.append(bytes([f]) + (filt % 256).astype(np.uint8).tobytes())
        return b"".join(lines)

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (11, 17, 3), dtype=np.uint8)
    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 17, 11, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(forward_filter(px)))
        + chunk(b"IEND", b"")
    )
    d = decode_png(png)
    assert (d["width"], d["height"]) == (17, 11)
    assert abs(d["mean_px"] - float(px.mean())) < 1e-9

    px4 = rng.integers(0, 256, (5, 6, 4), dtype=np.uint8)
    raw4 = np.zeros((5, 1 + 6 * 4), dtype=np.uint8)
    raw4[:, 1:] = px4.reshape(5, 24)
    png4 = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw4.tobytes()))
        + chunk(b"IEND", b"")
    )
    d4 = decode_png(png4)
    # stats are over RGB; alpha is ignored
    assert abs(d4["mean_px"] - float(px4[:, :, :3].mean())) < 1e-9


def test_png_decoder_palette_gray_interlace():
    """Exotic PNG variants built by independent test-side construction:
    8-bit and 4-bit palette (bit packing), 8-bit and 1-bit grayscale,
    and an Adam7-interlaced truecolor image whose seven passes the test
    splits itself per spec — the decoder must reassemble the original."""
    import struct
    import zlib

    import numpy as np

    from etl_spark.operators.multimodal import _PNG_SIG, decode_png

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    def png(w, h, depth, color, interlace, raws, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
        return (
            _PNG_SIG + chunk(b"IHDR", ihdr) + extra
            + chunk(b"IDAT", zlib.compress(raws)) + chunk(b"IEND", b"")
        )

    rng = np.random.default_rng(11)

    # 8-bit palette: indices -> PLTE rows
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (5, 7), dtype=np.uint8)
    raw = np.hstack([np.zeros((5, 1), np.uint8), idx]).tobytes()
    d = decode_png(png(7, 5, 8, 3, 0, raw, chunk(b"PLTE", plte.tobytes())))
    want = plte[idx]
    assert (d["width"], d["height"]) == (7, 5)
    assert abs(d["mean_px"] - want.mean()) < 1e-9
    assert abs(d["top_row_mean"] - want[0].mean()) < 1e-9

    # 4-bit palette: two indices per byte, MSB first, padded row tail
    idx4 = rng.integers(0, 16, (3, 5), dtype=np.uint8)
    packed = np.zeros((3, 3), dtype=np.uint8)  # ceil(5*4/8) = 3 bytes/row
    for y in range(3):
        for x in range(5):
            byte, shift = divmod(x, 2)
            packed[y, byte] |= idx4[y, x] << (4 if shift == 0 else 0)
    raw = np.hstack([np.zeros((3, 1), np.uint8), packed]).tobytes()
    d = decode_png(png(5, 3, 4, 3, 0, raw, chunk(b"PLTE", plte.tobytes())))
    want = plte[idx4]
    assert abs(d["mean_px"] - want.mean()) < 1e-9

    # 8-bit grayscale with Sub filter (exercises fbpp=1 path)
    g = rng.integers(0, 256, (4, 9), dtype=np.uint8)
    rows = []
    for y in range(4):
        diff = np.diff(g[y].astype(np.int16), prepend=np.int16(0)) % 256
        rows.append(b"\x01" + diff.astype(np.uint8).tobytes())
    d = decode_png(png(9, 4, 8, 0, 0, b"".join(rows)))
    assert abs(d["mean_px"] - g.mean()) < 1e-9

    # 1-bit grayscale: bits scale to 0/255
    bw = (rng.integers(0, 2, (6, 10), dtype=np.uint8))
    packedb = np.packbits(bw, axis=1)  # pads row tail with zero bits
    raw = np.hstack([np.zeros((6, 1), np.uint8), packedb]).tobytes()
    d = decode_png(png(10, 6, 1, 0, 0, raw))
    assert abs(d["mean_px"] - (bw * 255).mean()) < 1e-9

    # Adam7 truecolor: split passes per spec in the test, filter 0
    img = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raws = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            raws += b"\x00" + sub[y].tobytes()
    d = decode_png(png(13, 11, 8, 2, 1, bytes(raws)))
    assert (d["width"], d["height"]) == (13, 11)
    assert abs(d["mean_px"] - img.mean()) < 1e-9
    assert abs(d["top_row_mean"] - img[0].mean()) < 1e-9

    # 16-bit grayscale: big-endian samples, stats from the high byte
    g16 = rng.integers(0, 65536, (3, 4), dtype=np.uint16)
    raw = b"".join(
        b"\x00" + g16[y].astype(">u2").tobytes() for y in range(3)
    )
    d = decode_png(png(4, 3, 16, 0, 0, raw))
    assert abs(d["mean_px"] - (g16 >> 8).mean()) < 1e-9

    # 16-bit RGB roundtrip of dimensions + high-byte stats
    rgb16 = rng.integers(0, 65536, (2, 5, 3), dtype=np.uint16)
    raw = b"".join(
        b"\x00" + rgb16[y].astype(">u2").tobytes() for y in range(2)
    )
    d = decode_png(png(5, 2, 16, 2, 0, raw))
    assert (d["width"], d["height"]) == (5, 2)
    assert abs(d["mean_px"] - (rgb16 >> 8).mean()) < 1e-9

    # spec-invalid depth/color combinations are malformed input
    import pytest

    with pytest.raises(ValueError):
        decode_png(png(2, 2, 16, 3, 0, b"\x00" * 10))  # 16-bit palette
    with pytest.raises(ValueError):
        decode_png(png(2, 2, 4, 2, 0, b"\x00" * 10))  # 4-bit truecolor


def _jpeg_segments(buf: bytes):
    """Split a JPEG into (marker, raw_segment_bytes) pairs; the entropy-
    coded scan rides inside the SOS pair (through EOI). Test-local parser
    so splice tests don't reuse the decoder's own walk."""
    assert buf[:2] == b"\xff\xd8"
    segs, pos = [("SOI", buf[:2])], 2
    while pos < len(buf):
        marker = buf[pos + 1]
        if marker == 0xD9:
            segs.append(("EOI", buf[pos:]))
            break
        size = 2 + int.from_bytes(buf[pos + 2 : pos + 4], "big")
        if marker == 0xDA:  # SOS: runs to EOI in our single-scan streams
            segs.append(("SOS", buf[pos:-2]))
            pos = len(buf) - 2
            continue
        segs.append((f"{marker:02x}", buf[pos : pos + size]))
        pos += size
    return segs


def test_jpeg_codec_roundtrip():
    """Pure-NumPy baseline JPEG (ITU-T T.81): orthonormal DCT, constant
    image near-exact, smooth gradient within quantization error at q95,
    non-multiple-of-8 dimensions recovered exactly, byte stuffing
    exercised (seed chosen so the scan contains a stuffed 0xFF 0x00)."""
    import numpy as np

    from etl_spark.operators.multimodal import (
        _jpeg_dct_mat,
        decode_jpeg,
        decode_jpeg_pixels,
        encode_jpeg,
    )

    m = _jpeg_dct_mat()
    assert np.allclose(m @ m.T, np.eye(8), atol=1e-12)

    const = np.full((13, 21, 3), 137, dtype=np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(const, quality=90))
    assert out.shape == (13, 21, 3)
    assert int(np.abs(out.astype(int) - 137).max()) == 0

    yy, xx = np.mgrid[0:24, 0:40]
    grad = np.stack(
        [(yy * 3 + 20) % 256, (xx * 2 + 60) % 256, ((yy + xx) * 2 + 90) % 256],
        axis=-1,
    ).astype(np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(grad, quality=95))
    assert int(np.abs(out.astype(int) - grad.astype(int)).max()) <= 2

    d = decode_jpeg(encode_jpeg(grad, quality=95))
    assert (d["width"], d["height"]) == (40, 24)
    assert abs(d["mean_px"] - float(grad.mean())) < 1.0

    # seed 0 at q50 produces a stuffed 0xFF 0x00 in the entropy scan
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    buf = encode_jpeg(noise, quality=50)
    scan = dict(_jpeg_segments(buf))["SOS"]
    assert b"\xff\x00" in scan
    out = decode_jpeg_pixels(buf)
    assert out.shape == (16, 16, 3)


def test_jpeg_canonical_codes_handcheck():
    """The Annex-C canonical code construction against the well-known
    hand-derivable DC-luminance codes (independent of the builder): with
    BITS = [0,1,5,1,1,1,1,1,1,0,...], symbol 0 gets the single 2-bit code
    00, symbols 1-5 the 3-bit codes 010..110, and each longer symbol
    appends a zero to an all-ones prefix."""
    from etl_spark.operators.multimodal import _JPEG_HUFF, _jpeg_canonical_codes

    codes = _jpeg_canonical_codes(*_JPEG_HUFF[("dc", 0)])
    expect = {
        0: (2, 0b00),
        1: (3, 0b010), 2: (3, 0b011), 3: (3, 0b100),
        4: (3, 0b101), 5: (3, 0b110),
        6: (4, 0b1110), 7: (5, 0b11110), 8: (6, 0b111110),
        9: (7, 0b1111110), 10: (8, 0b11111110), 11: (9, 0b111111110),
    }
    assert codes == expect


def test_jpeg_decoder_marker_robustness():
    """Decoder vs re-arranged (still spec-valid) streams: COM/APPn
    segments spliced in, the two-table DQT split into two segments, the
    four-table DHT split and reordered — pixels must be identical to the
    original stream's. Unsupported variants (progressive SOF2, restart
    intervals, truncated payloads) fail loudly."""
    import struct

    import numpy as np
    import pytest

    from etl_spark.operators.multimodal import decode_jpeg_pixels, encode_jpeg

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (11, 19, 3), dtype=np.uint8)
    buf = encode_jpeg(px, quality=80)
    base = decode_jpeg_pixels(buf)
    segs = _jpeg_segments(buf)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def rebuild(parts):
        return b"".join(parts)

    # 1) splice COM + APP1 after APP0
    by_tag = {t: s for t, s in segs}
    spliced = rebuild([
        by_tag["SOI"], by_tag["e0"],
        seg(0xFE, b"comment: spliced by test"),
        seg(0xE1, b"Exif\x00\x00junk"),
        by_tag["db"], by_tag["c0"], by_tag["c4"], by_tag["SOS"], by_tag["EOI"],
    ])
    assert np.array_equal(decode_jpeg_pixels(spliced), base)

    # 2) split DQT (two tables in one segment) into two DQT segments
    dqt_body = by_tag["db"][4:]
    assert len(dqt_body) == 130
    dqt_a, dqt_b = seg(0xDB, dqt_body[:65]), seg(0xDB, dqt_body[65:])
    # 3) split DHT into one segment per table and emit them reversed
    dht_body, dhts, i = by_tag["c4"][4:], [], 0
    while i < len(dht_body):
        n = sum(dht_body[i + 1 : i + 17])
        dhts.append(seg(0xC4, dht_body[i : i + 17 + n]))
        i += 17 + n
    assert len(dhts) == 4
    rearranged = rebuild([
        by_tag["SOI"], by_tag["e0"], dqt_b, dqt_a, by_tag["c0"],
        *reversed(dhts), by_tag["SOS"], by_tag["EOI"],
    ])
    assert np.array_equal(decode_jpeg_pixels(rearranged), base)

    # a baseline stream RELABELED as progressive is malformed: its single
    # interleaved scan spans Ss=0..Se=63, and a progressive scan must not
    # mix DC and AC coefficients (real SOF2 support is tested in
    # test_jpeg_progressive_*)
    sof2 = by_tag["c0"].replace(b"\xff\xc0", b"\xff\xc2", 1)
    progressive = rebuild(
        [by_tag["SOI"], by_tag["e0"], by_tag["db"], sof2,
         by_tag["c4"], by_tag["SOS"], by_tag["EOI"]]
    )
    with pytest.raises(ValueError):
        decode_jpeg_pixels(progressive)
    # still-unsupported SOF types fail loudly
    sof1 = by_tag["c0"].replace(b"\xff\xc0", b"\xff\xc1", 1)
    extended = rebuild(
        [by_tag["SOI"], by_tag["e0"], by_tag["db"], sof1,
         by_tag["c4"], by_tag["SOS"], by_tag["EOI"]]
    )
    with pytest.raises(NotImplementedError):
        decode_jpeg_pixels(extended)
    # a DRI spliced onto a scan with no RST markers is malformed
    with_dri = rebuild(
        [by_tag["SOI"], by_tag["e0"], by_tag["db"], by_tag["c0"],
         seg(0xDD, struct.pack(">H", 4)),
         by_tag["c4"], by_tag["SOS"], by_tag["EOI"]]
    )
    with pytest.raises(ValueError):
        decode_jpeg_pixels(with_dri)
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"not a jpeg")
    with pytest.raises(ValueError):
        # truncated mid-scan: bits exhaust before the last MCU decodes
        decode_jpeg_pixels(buf[: buf.find(b"\xff\xda") + 30])


def test_jpeg_restart_intervals():
    """DRI/RSTn support: a stream encoded with restart markers decodes
    to exactly the same pixels as the same image without them — the DC
    predictors reset per interval and segments realign on byte
    boundaries. RST markers without a DRI segment are malformed."""
    import numpy as np
    import pytest

    from etl_spark.operators.multimodal import decode_jpeg_pixels, encode_jpeg

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (24, 33, 3), dtype=np.uint8)  # 3x5 = 15 MCUs
    plain = decode_jpeg_pixels(encode_jpeg(px, quality=85))
    for interval in (1, 2, 7):
        with_rst = encode_jpeg(px, quality=85, restart_interval=interval)
        assert any(
            bytes([0xFF, 0xD0 + m]) in with_rst for m in range(8)
        )
        assert np.array_equal(decode_jpeg_pixels(with_rst), plain)

    # strip the DRI segment but keep the RSTn-laden scan: malformed
    buf = encode_jpeg(px, quality=85, restart_interval=2)
    i = buf.find(b"\xff\xdd")
    no_dri = buf[:i] + buf[i + 6 :]
    with pytest.raises(ValueError):
        decode_jpeg_pixels(no_dri)


def test_jpeg_progressive_exact_vs_sequential():
    """Progressive (SOF2) decode: a progressive stream re-orders the SAME
    quantized coefficients across scans, so at equal quality/subsampling
    it must decode to pixels EXACTLY equal to its sequential sibling —
    the strongest possible oracle, no tolerance. Default scan script:
    DC first pass (Al=1) + DC refinement, two spectral AC bands per
    component at Al=1 + their refinements — every progressive decode path
    (spectral selection, successive approximation, EOBn runs, per-scan
    optimized DHT) in one stream."""
    import numpy as np

    from etl_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    for shape in ((24, 24), (17, 31)):  # aligned + MCU-padded dims
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        for sub in ("4:4:4", "4:2:2", "4:2:0"):
            for q in (50, 95):
                buf = encode_jpeg_progressive(img, quality=q, subsampling=sub)
                assert b"\xff\xc2" in buf and b"\xff\xc0" not in buf[:200]
                base = decode_jpeg_pixels(
                    encode_jpeg(img, quality=q, subsampling=sub))
                assert np.array_equal(decode_jpeg_pixels(buf), base), (shape, sub, q)


def test_jpeg_progressive_scan_scripts():
    """Scan-script generality: multi-level successive approximation
    (Al=2 → 1 → 0 refinement chains), spectral-selection-only scripts,
    and three-band splits all reproduce the sequential decode exactly —
    on noise (dense refinement traffic), a constant image (one giant
    EOB run / single-symbol Huffman tables), and block art (long zero
    runs inside blocks: ZRL + correction-bit interleaving)."""
    import numpy as np

    from etl_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(13)
    deep = (
        [{"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 0, "al": 2},
         {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 2, "al": 1},
         {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 1, "al": 0}]
        + [{"comps": [c], "ss": 1, "se": 63, "ah": a, "al": al}
           for a, al in ((0, 2), (2, 1), (1, 0)) for c in range(3)]
    )
    spectral_only = (
        [{"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 0, "al": 0}]
        + [{"comps": [c], "ss": lo, "se": hi, "ah": 0, "al": 0}
           for c in range(3) for lo, hi in ((1, 2), (3, 9), (10, 35), (36, 63))]
    )
    three_band = (
        [{"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 0, "al": 1},
         {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 1, "al": 0}]
        + [{"comps": [c], "ss": lo, "se": hi, "ah": a, "al": al}
           for a, al in ((0, 2), (2, 1), (1, 0)) for c in range(3)
           for lo, hi in ((1, 1), (2, 20), (21, 63))]
    )
    imgs = {
        "noise": rng.integers(0, 256, (40, 40, 3)).astype(np.uint8),
        "constant": np.full((40, 40, 3), 137, np.uint8),
        "blocks": np.kron(rng.integers(0, 256, (5, 5, 3)),
                          np.ones((8, 8, 1))).astype(np.uint8),
    }
    for name, img in imgs.items():
        for sub in ("4:4:4", "4:2:0"):
            base = decode_jpeg_pixels(encode_jpeg(img, quality=75,
                                                  subsampling=sub))
            for sname, script in (("deep", deep), ("spectral", spectral_only),
                                  ("3band", three_band)):
                out = decode_jpeg_pixels(encode_jpeg_progressive(
                    img, quality=75, subsampling=sub, scans=script))
                assert np.array_equal(out, base), (name, sub, sname)


def test_jpeg_chroma_subsampling():
    """4:2:2 and 4:2:0 scans (what cameras/web emit) encode and decode:
    MCU-interleaved per-component block rasters, box-average chroma
    downsample, nearest-neighbor upsample. Luma stays within baseline
    quantization error; chroma error is bounded by the decimation; a
    constant image roundtrips exactly; restart markers compose with
    subsampling (identical pixels with and without)."""
    import numpy as np

    from etl_spark.operators.multimodal import decode_jpeg_pixels, encode_jpeg

    h, w = 37, 50  # not multiples of 16: exercises MCU padding + crop
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = np.stack([(yy * 3 + xx * 2) % 256, (xx * 4) % 256,
                       (yy * 5) % 256], axis=2).astype(np.uint8)
    for sub, tol in (("4:4:4", 2), ("4:2:2", 8), ("4:2:0", 12)):
        buf = encode_jpeg(smooth, quality=95, subsampling=sub)
        dec = decode_jpeg_pixels(buf)
        assert dec.shape == (h, w, 3)
        err = np.abs(dec.astype(int) - smooth.astype(int))
        assert err.max() <= tol, (sub, err.max())
        # luma must stay near-exact: chroma decimation can't leak into Y
        ymat = np.array([0.299, 0.587, 0.114])
        yerr = np.abs((dec * ymat).sum(2) - (smooth * ymat).sum(2))
        assert yerr.max() < 4.0, (sub, yerr.max())
    # subsampled streams are smaller: that's the point of 4:2:0
    sizes = {sub: len(encode_jpeg(smooth, quality=95, subsampling=sub))
             for sub in ("4:4:4", "4:2:2", "4:2:0")}
    assert sizes["4:2:0"] < sizes["4:2:2"] < sizes["4:4:4"]

    const = np.full((24, 40, 3), 77, dtype=np.uint8)
    for sub in ("4:2:2", "4:2:0"):
        d = decode_jpeg_pixels(encode_jpeg(const, quality=95, subsampling=sub))
        assert (d == 77).all(), sub

    b1 = encode_jpeg(smooth, quality=85, subsampling="4:2:0")
    b2 = encode_jpeg(smooth, quality=85, subsampling="4:2:0",
                     restart_interval=2)
    assert np.array_equal(decode_jpeg_pixels(b1), decode_jpeg_pixels(b2))


def test_mp4_container_metadata():
    """ISO-BMFF box walk: dimensions/duration/sample-count recovered from
    the planted container; robust to interleaved free boxes, a 64-bit
    largesize mdat, and a version-1 (64-bit times) mvhd; loud ValueError
    on junk and NotImplementedError for frame decode."""
    import struct

    import pytest

    from etl_spark.operators.multimodal import (
        _mp4_box,
        decode_mp4_frames,
        decode_mp4_meta,
        encode_mp4_stub,
    )

    buf = encode_mp4_stub(640, 360, 12_345, 300)
    want = {"width": 640, "height": 360, "duration_s": 12.345, "n_samples": 300}
    assert decode_mp4_meta(buf) == want

    fsz = struct.unpack_from(">I", buf, 0)[0]
    ftyp, rest = buf[:fsz], buf[fsz:]
    msz = struct.unpack_from(">I", rest, 0)[0]
    moov = rest[:msz]
    free = _mp4_box(b"free", b"x" * 17)
    large_mdat = _mp4_box(b"mdat", b"\x00" * 64, largesize=True)
    assert decode_mp4_meta(ftyp + free + moov + free + large_mdat) == want

    # version-1 mvhd (64-bit creation/modification/duration)
    mvhd_v1 = _mp4_box(
        b"mvhd", struct.pack(">B3xQQIQ", 1, 0, 0, 1000, 12_345) + b"\x00" * 80
    )
    mbody = moov[8:]
    trak = mbody[struct.unpack_from(">I", mbody, 0)[0]:]
    assert decode_mp4_meta(ftyp + _mp4_box(b"moov", mvhd_v1 + trak)) == want

    with pytest.raises(ValueError):
        decode_mp4_meta(b"\x00\x00\x00\x08junk")  # valid box walk, no ftyp
    with pytest.raises(ValueError):
        decode_mp4_meta(ftyp)  # no moov
    with pytest.raises(NotImplementedError):
        decode_mp4_frames(buf)


def test_h264_sps_roundtrip_sweep():
    """SPS encode→parse is exact across profiles (baseline/main/high),
    chroma formats, interlace, all three poc layouts, and crop-requiring
    (non-mod-16) dimensions — ITU-T H.264 §7.3.2.1.1 both directions."""
    import itertools

    from etl_spark.operators.multimodal import encode_h264_sps, parse_h264_sps

    checked = 0
    for w, h, prof, chroma, fmo, poc in itertools.product(
        [16, 642, 1920, 1282, 4096], [16, 482, 1080, 18],
        [66, 77, 100], [1, 2, 3], [True, False], [0, 1, 2],
    ):
        if chroma != 1 and prof != 100:
            continue  # non-4:2:0 needs a high profile
        ux = 2 if chroma in (1, 2) else 1
        uy = (2 if chroma == 1 else 1) * (2 - int(fmo))
        if w % ux or h % uy:
            continue  # not representable at this chroma sampling (real rule)
        sps = encode_h264_sps(
            w, h, prof, level_idc=41, chroma_format_idc=chroma,
            frame_mbs_only=fmo, pic_order_cnt_type=poc,
        )
        m = parse_h264_sps(sps)
        assert (
            m["width"], m["height"], m["profile_idc"], m["level_idc"],
            m["chroma_format_idc"], m["frame_mbs_only"],
        ) == (w, h, prof, 41, chroma, fmo)
        checked += 1
    assert checked > 200


def test_h264_rbsp_emulation_prevention():
    """EPB escape/unescape roundtrips adversarial payloads, and escaped
    NAL bodies never contain a start-code prefix (§7.4.1.1)."""
    from etl_spark.operators.multimodal import _rbsp_escape, _rbsp_unescape

    cases = [
        b"\x00\x00\x00", b"\x00\x00\x01", b"\x00\x00\x02", b"\x00\x00\x03",
        b"\x00\x00\x00\x00\x00\x01", b"\x00" * 9, b"\xff\x00\x00\x01\x00\x00",
        bytes(range(256)) + b"\x00\x00\x01" + bytes(range(256))[::-1],
    ]
    for raw in cases:
        esc = _rbsp_escape(raw)
        assert _rbsp_unescape(esc) == raw
        assert b"\x00\x00\x01" not in esc and b"\x00\x00\x00" not in esc


def test_h264_annexb_and_avcc():
    """NAL transport both ways a real pipeline meets them: Annex-B
    streams (3- and 4-byte start codes, trailing zeros) and the ISO-BMFF
    avcC record; decode_h264_meta reads SPS+PPS through either."""
    import pytest

    from etl_spark.operators.multimodal import (
        build_avcc,
        decode_h264_meta,
        encode_annexb,
        encode_h264_pps,
        encode_h264_sps,
        encode_mp4_stub,
        parse_avcc,
        parse_h264_pps,
        split_annexb,
    )

    sps = encode_h264_sps(1920, 1080, 100, 42)
    pps = encode_h264_pps(entropy_cabac=True)
    assert parse_h264_pps(pps) == {
        "pps_id": 0, "sps_id": 0, "entropy_cabac": True}

    rec = parse_avcc(build_avcc(sps, [pps]))
    assert rec == {"nalu_length_size": 4, "sps": [sps], "pps": [pps]}

    buf = encode_mp4_stub(1920, 1080, 5000, 120, avcc=build_avcc(sps, [pps]))
    m = decode_h264_meta(buf)
    assert (m["width"], m["height"], m["profile_idc"], m["level_idc"],
            m["entropy_cabac"], m["source"]) == (1920, 1080, 100, 42, True,
                                                 "avcc")

    # the same SPS/PPS as a raw Annex-B stream, mixed start-code widths
    stream = b"\x00\x00\x01" + sps + b"\x00\x00\x00\x01" + pps + b"\x00\x00"
    assert split_annexb(stream) == [sps, pps]
    m2 = decode_h264_meta(encode_annexb([sps, pps]))
    assert m2["source"] == "annexb" and m2["width"] == 1920

    with pytest.raises(ValueError):
        decode_h264_meta(encode_mp4_stub(640, 360, 1000, 10))  # no avcC
    with pytest.raises(ValueError):
        split_annexb(b"\xff" * 16)  # no start code


def test_wav_codec_roundtrip():
    import numpy as np

    from etl_spark.operators.multimodal import decode_wav, encode_wav

    t = np.arange(16_000, dtype=np.float64)
    samples = (10_000 * np.sin(2 * np.pi * 440 * t / 16_000)).astype(np.int16)
    d = decode_wav(encode_wav(samples, 16_000))
    assert d["sample_rate"] == 16_000 and d["channels"] == 1
    assert d["n_samples"] == 16_000 and abs(d["duration_s"] - 1.0) < 1e-9
    # RMS of a 10k-amplitude sine ≈ 10000/sqrt(2)
    assert abs(d["rms"] - 10_000 / np.sqrt(2)) < 50


def test_wav_all_formats():
    """Every WAV container format decodes to the same int16-domain RMS:
    PCM 8/16/24/32-bit, IEEE float 32/64, G.711 A-law/µ-law, and a
    WAVE_FORMAT_EXTENSIBLE wrapper. Exact formats match the int16 RMS
    to float precision; lossy ones within their quantization error."""
    import numpy as np
    import pytest

    from etl_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(11)
    s = rng.integers(-20_000, 20_000, 48_000, dtype=np.int16)
    ref = float(np.sqrt(np.mean(s.astype(np.float64) ** 2)))
    exact = [(1, 16), (1, 24), (1, 32), (3, 32), (3, 64)]
    for fmt, bits in exact:
        d = decode_wav(encode_wav(s, 16_000, audio_fmt=fmt, bits=bits))
        assert d["n_samples"] == 48_000
        assert abs(d["rms"] - ref) < 1e-6, (fmt, bits)
    for fmt, bits, tol in [(1, 8, 0.02), (6, 8, 0.005), (7, 8, 0.005)]:
        d = decode_wav(encode_wav(s, 16_000, audio_fmt=fmt, bits=bits))
        assert abs(d["rms"] - ref) / ref < tol, (fmt, bits, d["rms"], ref)
    d = decode_wav(encode_wav(s, 16_000, audio_fmt=3, bits=32, extensible=True))
    assert abs(d["rms"] - ref) < 1e-6
    with pytest.raises(NotImplementedError):
        decode_wav(encode_wav(s, 16_000)[:20]
                   + b"\x02\x00" + encode_wav(s, 16_000)[22:])  # fmt 2 = ADPCM


def test_g711_tables_canonical():
    """The A-law/µ-law compand tables match ITU-T G.711: every A-law
    code is a fixed point of expand→compress (µ-law: 255 of 256 — the
    spec's ±0 degeneracy), and roundtrip error stays within the top
    segment's step size over the full int16 range."""
    import numpy as np

    from etl_spark.operators.multimodal import (_alaw_decode, _alaw_encode,
                                                _mulaw_decode, _mulaw_encode)

    codes = np.arange(256, dtype=np.uint8)
    assert (_alaw_encode(_alaw_decode(codes)) == codes).all()
    assert int((_mulaw_encode(_mulaw_decode(codes)) == codes).sum()) == 255
    x = np.arange(-32768, 32768, dtype=np.int16)
    assert np.abs(_alaw_decode(_alaw_encode(x)).astype(np.int32)
                  - x.astype(np.int32)).max() <= 512
    assert np.abs(_mulaw_decode(_mulaw_encode(x)).astype(np.int32)
                  - x.astype(np.int32)).max() <= 1024
    # spec spot values: silence encodes to 0xD5 (A-law) / 0xFF (µ-law)
    zero = np.zeros(1, dtype=np.int16)
    assert _alaw_encode(zero)[0] == 0xD5 and _mulaw_encode(zero)[0] == 0xFF


def test_extract_features_handles_wav_rows(spark):
    """decode_stub routes audio/wav through the real RIFF parser in the
    generic feature path (it used to fall through to NotImplementedError,
    killing the whole stage for any corpus containing audio)."""
    import numpy as np

    from etl_spark.operators.multimodal import encode_wav

    wav = encode_wav((np.sin(np.arange(1600) / 10) * 3000).astype(np.int16))
    media = spark.createDataFrame(
        [(0, "audio/wav", bytearray(wav)), (1, "fake/raw", bytearray(b"xyz"))],
        ["media_id", "mime", "payload"],
    )
    rows = {r.media_id: r for r in extract_features(media).collect()}
    assert rows[0].width is None and rows[0].height is None
    assert rows[0].n_bytes == len(wav)
    assert rows[1].width is not None  # the fake path still decodes


def test_quantile_profile_null_tolerant(spark):
    """The rank base must count only non-NULL values: percentile_approx
    and the rank sums all skip NULLs, so a NULL-inclusive count misflags
    correct sketches on NULL-heavy groups (and can mask bad ones)."""
    from etl_spark.operators.sketches import quantile_profile

    rows = [("g", float(i)) for i in range(500)] + [("g", None)] * 500
    df = spark.createDataFrame(rows, ["k", "v"])
    r = quantile_profile(df, "k", "v").first()
    assert r.p50_ok and r.p95_ok
    assert abs(r.p50_exact - 249.5) < 1e-6


def test_cosine_topk_numpy_string_ids_and_empty_queries(spark):
    """The NumPy top-k must follow the input id types (string doc ids are
    the operators/ convention) and return an empty frame for an empty
    query set instead of crashing on a 0-d matrix."""
    from etl_spark.operators.similarity import cosine_topk_numpy

    vecs = spark.createDataFrame(
        [(f"d{i}", [float(i == j) for j in range(4)]) for i in range(4)],
        ["vec_id", "embedding"],
    )
    qs = spark.createDataFrame(
        [("q0", [1.0, 0.0, 0.0, 0.1])], ["query_id", "qv"]
    )
    rows = cosine_topk_numpy(vecs, qs, k=2).collect()
    assert rows and rows[0].query_id == "q0" and rows[0].neighbor_id == "d0"
    empty = cosine_topk_numpy(vecs, qs.limit(0), k=2)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "neighbor_id", "cos_r", "rk"]


def test_bucket_pairs_null_keys_dropped(spark):
    """NULL bucket keys cannot name a real LSH bucket (SQL NULL != NULL)
    and, uncapped, a degenerate NULL bucket bypasses the hot anti-join —
    they must be dropped before any per-bucket list materializes."""
    from etl_spark.operators import bucket_pairs

    rows = [(i, None) for i in range(50)] + [(100, "b"), (101, "b")]
    df = spark.createDataFrame(rows, ["id", "bucket"])
    got = bucket_pairs(df, ["bucket"], "id", max_bucket=10).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(100, 101)]


def test_lsh_band_params_must_divide(spark):
    """num_hashes not divisible by num_bands silently shifted the LSH
    operating point; it must raise instead."""
    from etl_spark.operators.textdedup import minhash_lsh_pairs

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="not divisible"):
        minhash_lsh_pairs(df, num_hashes=18, num_bands=4).collect()

def test_jpeg_constant_gray_exact_all_levels():
    """The media gate's oracle-computed lossy entry rests on this exact
    property: a constant-gray image survives quality-95 JPEG bit-exactly
    for EVERY gray level (the q95 DC quantizer is 2, dividing any
    8*(c-128); AC coefficients are zero), under both entropy coders and
    non-mod-8 dimensions. If a codec change breaks this, fix the codec
    or re-derive media_decode_jpeg_const's oracle — the gate entry is
    only as strong as this invariant."""
    import numpy as np

    from etl_spark.operators.multimodal import (
        _constant_pixels,
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    for c in range(256):  # every gray level, dims sweep all mod-8 phases
        px = np.full((3 + c % 13, 4 + c % 29, 3), c, dtype=np.uint8)
        for enc in (encode_jpeg, encode_jpeg_progressive):
            d = decode_jpeg(enc(px, 95))
            assert (d["mean_px"], d["top_row_mean"]) == (float(c), float(c)), (
                c, enc.__name__, d)
    # and the planted fixture formula agrees with the oracle's closed form
    for L in (0, 1, 28, 29, 255, 256, 511, 1000):
        p = _constant_pixels(L)
        assert p.shape == (3 + L % 13, 4 + L % 29, 3)
        assert int(p[0, 0, 0]) == L % 256
