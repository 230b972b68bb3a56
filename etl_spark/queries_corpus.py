"""Training-data pipeline queries: dedup family, similarity search,
text analysis, multimodal plumbing — each Spark implementation paired
with a value-level DuckDB oracle (all hashing is md5-hex, identical in
both engines).

Registered into the same registry as etl_spark.queries (the driver's
queries()/oracle_sql() contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.multimodal import docs_as_media, extract_features
from .operators.similarity import (
    cosine_topk_numpy,
    cosine_topk,
    embedding_near_dups,
    embedding_near_dups_lsh,
    ivf_cosine_topk,
    lsh_cosine_topk,
)
from .operators.textdedup import (
    minhash_lsh_pairs,
    ngram_jaccard_lsh,
    ngram_jaccard_pairs,
    simhash_groups,
)
from .operators.textstats import doc_profile
from .queries import _t, register

# --------------------------------------------------------------------------
# MinHash + LSH near-dup (shingle → signature → band buckets → verify)

_MINHASH_ORACLE = r"""
WITH toks AS (
  SELECT doc_id AS id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
), base AS (
  SELECT id, list_distinct(
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                                    i -> array_to_string(t[i:i+2], ' '))
                ELSE [array_to_string(t, ' ')] END) AS sh
  FROM toks
), sigs AS (
  SELECT id, sh,
         list_transform(range(0, 16),
           h -> list_min(list_transform(sh,
                s -> md5(CAST(h AS VARCHAR) || '|' || s)))) AS sig
  FROM base
), bands AS (
  SELECT id, sh,
         list_transform(range(0, 4),
           b -> struct_pack(band := b,
                bucket := md5(sig[b*4+1] || '|' || sig[b*4+2] || '|'
                           || sig[b*4+3] || '|' || sig[b*4+4]))) AS bl
  FROM sigs
), banded AS (
  SELECT id, sh, u.band AS band, u.bucket AS bucket
  FROM (SELECT id, sh, UNNEST(bl) AS u FROM bands)
), big AS (
  SELECT band, bucket FROM banded GROUP BY band, bucket HAVING count(*) > 50
), kept AS (
  SELECT banded.* FROM banded
  ANTI JOIN big ON banded.band = big.band AND banded.bucket = big.bucket
), cand AS (
  SELECT DISTINCT a.id AS doc_a, b.id AS doc_b, a.sh AS sh_a, b.sh AS sh_b
  FROM kept a JOIN kept b USING (band, bucket)
  WHERE a.id < b.id
), pairs AS (
  SELECT DISTINCT ON (doc_a, doc_b) doc_a, doc_b,
         CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
           / len(list_distinct(list_concat(sh_a, sh_b))) AS j
  FROM cand
)
SELECT doc_a, doc_b, round(j, 4) AS jaccard
FROM pairs WHERE j >= 0.5
"""


@register("dedup_minhash_lsh", _MINHASH_ORACLE)
def dedup_minhash_lsh(spark, sf_dir):
    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# SimHash dup groups

_SIMHASH_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
  FROM documents
), sigs AS (
  SELECT doc_id,
         array_to_string(list_transform(range(0, 16), j ->
           CASE WHEN list_sum(list_transform(t, tk ->
                  CASE WHEN strpos('0123456789abcdef',
                                   substr(md5(tk), j + 1, 1)) >= 9
                       THEN 1 ELSE -1 END)) > 0
                THEN '1' ELSE '0' END), '') AS simhash
  FROM toks
)
SELECT simhash, count(*) AS n_docs, min(doc_id) AS min_doc_id
FROM sigs GROUP BY simhash HAVING count(*) > 1
"""


@register("dedup_simhash", _SIMHASH_ORACLE)
def dedup_simhash(spark, sf_dir):
    return simhash_groups(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Character n-gram Jaccard near-dup within a blocking key

_NGRAM_ORACLE = r"""
WITH base AS (
  SELECT source || '#' || CAST(CAST(floor(length(trim(text)) / 200) AS BIGINT)
                               AS VARCHAR) AS blk,
         doc_id AS id,
         list_distinct(
           CASE WHEN length(lower(trim(text))) >= 5
                THEN list_transform(range(1, length(lower(trim(text))) - 3),
                                    i -> substr(lower(trim(text)), i, 5))
                ELSE [lower(trim(text))] END) AS sh
  FROM documents
), big AS (
  SELECT blk FROM base GROUP BY blk HAVING count(*) > 10000
), base_kept AS (
  SELECT base.* FROM base ANTI JOIN big ON base.blk = big.blk
)
SELECT a.id AS doc_a, b.id AS doc_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
FROM base_kept a JOIN base_kept b ON a.blk = b.blk AND a.id < b.id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
"""


@register("dedup_ngram_jaccard", _NGRAM_ORACLE)
def dedup_ngram_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Character n-gram Jaccard with MinHash-LSH candidate generation: the
# scale-safe composition — same verify as dedup_ngram_jaccard, but the
# quadratic stage runs only inside capped minhash band buckets over the
# char-shingle sets (no coarse block to skew).

_NGRAM_LSH_ORACLE = r"""
WITH base AS (
  SELECT doc_id AS id,
         list_distinct(
           CASE WHEN length(lower(trim(text))) >= 5
                THEN list_transform(range(1, length(lower(trim(text))) - 3),
                                    i -> substr(lower(trim(text)), i, 5))
                ELSE [lower(trim(text))] END) AS sh
  FROM documents
), sigs AS (
  SELECT id, sh,
         list_transform(range(0, 16),
           h -> list_min(list_transform(sh,
                s -> md5(CAST(h AS VARCHAR) || '|' || s)))) AS sig
  FROM base
), bands AS (
  SELECT id, sh,
         list_transform(range(0, 4),
           b -> struct_pack(band := b,
                bucket := md5(sig[b*4+1] || '|' || sig[b*4+2] || '|'
                           || sig[b*4+3] || '|' || sig[b*4+4]))) AS bl
  FROM sigs
), banded AS (
  SELECT id, sh, u.band AS band, u.bucket AS bucket
  FROM (SELECT id, sh, UNNEST(bl) AS u FROM bands)
), big AS (
  SELECT band, bucket FROM banded GROUP BY band, bucket HAVING count(*) > 50
), kept AS (
  SELECT banded.* FROM banded
  ANTI JOIN big ON banded.band = big.band AND banded.bucket = big.bucket
), cand AS (
  SELECT DISTINCT a.id AS doc_a, b.id AS doc_b, a.sh AS sh_a, b.sh AS sh_b
  FROM kept a JOIN kept b USING (band, bucket)
  WHERE a.id < b.id
), pairs AS (
  SELECT DISTINCT ON (doc_a, doc_b) doc_a, doc_b,
         CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
           / len(list_distinct(list_concat(sh_a, sh_b))) AS j
  FROM cand
)
SELECT doc_a, doc_b, round(j, 4) AS jaccard
FROM pairs WHERE j >= 0.5
"""


@register("dedup_ngram_lsh", _NGRAM_LSH_ORACLE)
def dedup_ngram_lsh(spark, sf_dir):
    return ngram_jaccard_lsh(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Embedding-cosine near-dup (semantic dedup), blocked by label

_EMB_DUP_ORACLE = """
WITH v AS (
  SELECT label AS blk, vec_id AS id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings
), vbig AS (
  SELECT blk FROM v GROUP BY blk HAVING count(*) > 10000
), v_kept AS (
  SELECT v.* FROM v ANTI JOIN vbig ON v.blk = vbig.blk
)
SELECT a.id AS id_a, b.id AS id_b,
       round(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e))
              * sqrt(list_dot_product(b.e, b.e))), 4) AS cos_r
FROM v_kept a JOIN v_kept b ON a.blk = b.blk AND a.id < b.id
WHERE list_dot_product(a.e, b.e)
      / (sqrt(list_dot_product(a.e, a.e))
       * sqrt(list_dot_product(b.e, b.e))) >= 0.30
"""


@register("sim_embedding_near_dup", _EMB_DUP_ORACLE)
def sim_embedding_near_dup(spark, sf_dir):
    return embedding_near_dups(_t(spark, sf_dir, "embeddings"))


# --------------------------------------------------------------------------
# Embedding near-dup with hyperplane-LSH candidate generation: the
# scale-safe composition — candidates are pairs sharing a (table, sig)
# bucket in any of 6 hash tables (capped), exact cosine verifies. Same
# signature machinery (and oracle CTEs) as sim_lsh_topk.

_EMB_LSH_DUP_ORACLE = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), sigl AS (
  SELECT vec_id, e,
         list_transform(range(0, 6), t -> struct_pack(
           tbl := t,
           sig := array_to_string(list_transform(range(0, 4), p ->
             CASE WHEN list_sum(list_transform(range(0, len(e)), d ->
                    e[d+1] * (CAST(strpos('0123456789abcdef',
                         substr(md5('p' || CAST(t*4 + p AS VARCHAR) || '|'
                                    || CAST(d AS VARCHAR)), 1, 1)) - 1
                         AS DOUBLE) - 7.5))) > 0
                  THEN '1' ELSE '0' END), ''))) AS tl
  FROM v
), sig AS (
  SELECT vec_id, tbl, s FROM (
    SELECT vec_id, u.tbl AS tbl, u.sig AS s
    FROM (SELECT vec_id, UNNEST(tl) AS u FROM sigl))
), big AS (
  SELECT tbl, s FROM sig GROUP BY tbl, s HAVING count(*) > 200
), kept AS (
  SELECT sig.* FROM sig ANTI JOIN big ON sig.tbl = big.tbl AND sig.s = big.s
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM kept a JOIN kept b ON a.tbl = b.tbl AND a.s = b.s
  WHERE a.vec_id < b.vec_id
), scored AS (
  SELECT id_a, id_b,
         list_dot_product(va.e, vb.e)
           / (sqrt(list_dot_product(va.e, va.e))
            * sqrt(list_dot_product(vb.e, vb.e))) AS cos
  FROM cand JOIN v va ON cand.id_a = va.vec_id
            JOIN v vb ON cand.id_b = vb.vec_id
)
SELECT id_a, id_b, round(cos, 4) AS cos_r
FROM scored WHERE cos >= 0.30
"""


@register("sim_near_dup_lsh", _EMB_LSH_DUP_ORACLE)
def sim_near_dup_lsh(spark, sf_dir):
    return embedding_near_dups_lsh(_t(spark, sf_dir, "embeddings"))


# --------------------------------------------------------------------------
# LSH-bucketed approximate top-k (the ANN scale path; exact baseline is
# sim_cosine_topk in etl_spark.queries)

_LSH_TOPK_ORACLE = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), sigl AS (
  SELECT vec_id, e,
         list_transform(range(0, 6), t -> struct_pack(
           tbl := t,
           sig := array_to_string(list_transform(range(0, 4), p ->
             CASE WHEN list_sum(list_transform(range(0, len(e)), d ->
                    e[d+1] * (CAST(strpos('0123456789abcdef',
                         substr(md5('p' || CAST(t*4 + p AS VARCHAR) || '|'
                                    || CAST(d AS VARCHAR)), 1, 1)) - 1
                         AS DOUBLE) - 7.5))) > 0
                  THEN '1' ELSE '0' END), ''))) AS tl
  FROM v
), sig AS (
  SELECT vec_id, e, u.tbl AS tbl, u.sig AS s
  FROM (SELECT vec_id, e, UNNEST(tl) AS u FROM sigl)
), probes AS (
  SELECT vec_id AS query_id, e AS qe, tbl, s FROM sig WHERE vec_id < 10
), cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id, p.qe, c.e
  FROM probes p JOIN sig c ON p.tbl = c.tbl AND p.s = c.s
  WHERE c.vec_id <> p.query_id
), scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qe, e)
           / (sqrt(list_dot_product(qe, qe))
            * sqrt(list_dot_product(e, e))) AS cos
  FROM cand
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, round(cos, 4) AS cos_r, rk
FROM ranked WHERE rk <= 5
"""


@register("sim_lsh_topk", _LSH_TOPK_ORACLE)
def sim_lsh_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return lsh_cosine_topk(e, probes)


# --------------------------------------------------------------------------
# IVF-partitioned approximate top-k: the cell-partitioned ANN scale path.
# Coarse quantizer = the 16 lowest-id vectors L2-normalized (deterministic
# k-means stand-in), corpus assigned map-side by argmax cell, queries
# probe their 4 best cells. Same result columns as the other top-k entries.

_IVF_TOPK_ORACLE = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), seeds AS (
  SELECT e, row_number() OVER (ORDER BY vec_id) - 1 AS cell
  FROM v ORDER BY vec_id LIMIT 16
), cn AS (
  SELECT cell, list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS ce
  FROM seeds
), assign AS (
  SELECT vec_id, e, cell FROM (
    SELECT v.vec_id, v.e, cn.cell,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY list_dot_product(v.e, cn.ce) DESC, cn.cell ASC) AS rn
    FROM v CROSS JOIN cn) WHERE rn = 1
), probes AS (
  SELECT query_id, qe, cell FROM (
    SELECT v.vec_id AS query_id, v.e AS qe, cn.cell,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY list_dot_product(v.e, cn.ce) DESC, cn.cell ASC) AS rn
    FROM v CROSS JOIN cn WHERE v.vec_id < 10) WHERE rn <= 4
), scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         list_dot_product(p.qe, a.e)
           / (sqrt(list_dot_product(p.qe, p.qe))
            * sqrt(list_dot_product(a.e, a.e))) AS cos
  FROM probes p JOIN assign a USING (cell)
  WHERE a.vec_id <> p.query_id
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, round(cos, 4) AS cos_r, rk
FROM ranked WHERE rk <= 5
"""


@register("sim_ivf_topk", _IVF_TOPK_ORACLE)
def sim_ivf_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return ivf_cosine_topk(e, probes)


# Same logical query as sim_cosine_topk with (n_probes=500, k=3): the
# oracle is that SQL template with the two parameters substituted.
from .queries import ORACLES as _CORE_ORACLES  # noqa: E402

_BRUTE_LARGE_ORACLE = (
    _CORE_ORACLES["sim_cosine_topk"]
    .replace("vec_id < 10", "vec_id < 500")
    .replace("rk <= 5", "rk <= 3")
)


@register("sim_brute_topk_large", _BRUTE_LARGE_ORACLE)
def sim_brute_topk_large(spark, sf_dir):
    """Scale probe: brute-force top-k over a 500-query probe set
    (the quadratic baseline the LSH variant avoids)."""
    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 500).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return cosine_topk(e, probes, k=3)


# Same oracle as sim_cosine_topk in etl_spark.queries: identical logical
# result, different physical path (Arrow-batched NumPy matmul instead of
# per-pair higher-order aggregates).
@register("sim_numpy_topk", _CORE_ORACLES["sim_cosine_topk"])
def sim_numpy_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return cosine_topk_numpy(e, probes, k=5)


# --------------------------------------------------------------------------
# Text analysis: language-ID + quality + token count profile

_PROFILE_ORACLE = r"""
WITH t AS (
  SELECT doc_id, trim(text) AS s,
         regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), scored AS (
  SELECT doc_id, s, toks,
         CAST(len(list_filter(toks, x -> list_contains(
           ['the','a','of','and','to','in','is','it','on','for'], x))) AS DOUBLE)
           / len(toks) AS r_en,
         CAST(len(list_filter(toks, x -> list_contains(
           ['el','la','de','y','que','en','un','es','se','por'], x))) AS DOUBLE)
           / len(toks) AS r_es,
         CAST(len(list_filter(toks, x -> list_contains(
           ['der','die','das','und','zu','in','den','von','ist','mit'], x))) AS DOUBLE)
           / len(toks) AS r_de,
         CAST(len(list_filter(toks, x -> list_contains(
           ['le','la','de','et','un','en','est','que','pour','dans'], x))) AS DOUBLE)
           / len(toks) AS r_fr,
         length(regexp_replace(lower(s), '[^a-z]', '', 'g')) AS alpha,
         length(s) AS nch, len(toks) AS n_toks
  FROM t
)
SELECT doc_id,
       CASE WHEN r_en >= r_es AND r_en >= r_de AND r_en >= r_fr AND r_en > 0 THEN 'en'
            WHEN r_es >= r_de AND r_es >= r_fr AND r_es > 0 THEN 'es'
            WHEN r_de >= r_fr AND r_de > 0 THEN 'de'
            WHEN r_fr > 0 THEN 'fr'
            ELSE 'und' END AS pred_lang,
       round((least(nch / 500.0, 1.0)
            + CAST(alpha AS DOUBLE) / nch
            + least(r_en * 3.0, 1.0)
            + greatest(0.0, 1.0 - abs(CAST(alpha AS DOUBLE) / n_toks - 6.0) / 6.0)
             ) / 4.0, 4) AS quality,
       len(regexp_extract_all(lower(text),
           '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens
FROM scored JOIN documents USING (doc_id)
"""


@register("text_profile", _PROFILE_ORACLE)
def text_profile(spark, sf_dir):
    return doc_profile(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Multimodal plumbing: binary payload + mapInPandas feature extraction.
# The decode is a deterministic stub (no codecs in this image), so even
# this path gets a value-level oracle.

_MEDIA_ORACLE = """
SELECT doc_id AS media_id,
       'fake/raw' AS mime,
       octet_length(encode(text)) AS n_bytes,
       16 + octet_length(encode(text)) % 640 AS width,
       16 + (octet_length(encode(text)) * 31) % 480 AS height,
       md5(text) AS checksum
FROM documents
"""


@register("media_features", _MEDIA_ORACLE)
def media_features(spark, sf_dir):
    media = docs_as_media(_t(spark, sf_dir, "documents"))
    return extract_features(media)


# Real-codec roundtrip: every document becomes a spec-compliant 24-bit BMP
# (bottom-up rows, stride padding) whose stats are analytic in the text's
# byte length, so DuckDB verifies the pure-NumPy DECODER without a codec:
# a decoder that misreads the header, forgets the bottom-up flip, or
# includes padding bytes diverges from the closed-form oracle.
_MEDIA_DECODE_ORACLE = """
WITH d AS (SELECT doc_id, strlen(text) AS L FROM documents)
SELECT doc_id AS media_id,
       CAST(4 + L % 29 AS INTEGER) AS width,
       CAST(3 + L % 13 AS INTEGER) AS height,
       round(list_sum(list_transform(range(0, 3 + L % 13),
                                     r -> (r * 13 + L) % 256))
             / CAST(3 + L % 13 AS DOUBLE), 4) AS mean_px,
       CAST(L % 256 AS DOUBLE) AS top_row_mean
FROM d
"""


@register("media_decode", _MEDIA_DECODE_ORACLE)
def media_decode(spark, sf_dir):
    from .operators.multimodal import bmp_from_docs, decode_bmp_features

    return decode_bmp_features(bmp_from_docs(_t(spark, sf_dir, "documents")))


# Same planted-pixel formula through the PNG codec (stdlib zlib deflate +
# full scanline unfiltering): the identical closed-form oracle now checks
# the inflate/unfilter path instead of the DIB one.
@register("media_decode_png", _MEDIA_DECODE_ORACLE)
def media_decode_png(spark, sf_dir):
    from .operators.multimodal import decode_png_features, png_from_docs

    return decode_png_features(png_from_docs(_t(spark, sf_dir, "documents")))


# Planted pixels through the real baseline JPEG codec (pure-NumPy DCT +
# Annex-K Huffman). JPEG is lossy, so the exact-hash gate checks decoded
# DIMENSIONS against the closed form and the pixel stats as tolerance
# booleans: the Spark side compares the DECODED mean/top-row against the
# analytic values (|err| < 1.0 — measured worst case 0.33 over 3000
# lengths at quality 95) and must output literal true to match the oracle.
_MEDIA_DECODE_JPEG_ORACLE = """
WITH d AS (SELECT doc_id, octet_length(encode(text)) AS L FROM documents)
SELECT doc_id AS media_id,
       CAST(4 + L % 29 AS INTEGER) AS width,
       CAST(3 + L % 13 AS INTEGER) AS height,
       TRUE AS mean_within_1,
       TRUE AS top_within_1
FROM d
"""


# ISO-BMFF (MP4) container metadata: box-walk parser over a planted
# minimal container — tkhd dimensions, mvhd duration, stsz sample count
# are all lossless container fields, closed-form in L, checked exactly.
# Frame decode (H.264) genuinely needs ffmpeg and stays NotImplementedError.
_MEDIA_DECODE_MP4_ORACLE = """
WITH d AS (SELECT doc_id, octet_length(encode(text)) AS L FROM documents)
SELECT doc_id AS media_id,
       CAST(4 + L % 29 AS INTEGER) AS width,
       CAST(3 + L % 13 AS INTEGER) AS height,
       round((1000 + L % 7919) / 1000.0, 4) AS duration_s,
       CAST(1 + L % 240 AS INTEGER) AS n_samples
FROM d
"""


@register("media_decode_mp4", _MEDIA_DECODE_MP4_ORACLE)
def media_decode_mp4(spark, sf_dir):
    from .operators.multimodal import decode_mp4_features, mp4_from_docs

    return decode_mp4_features(mp4_from_docs(_t(spark, sf_dir, "documents")))


# Codec-level H.264 metadata (ITU-T H.264 §7.3.2.1.1): the planted MP4's
# stsd carries a real avc1/avcC sample entry holding a real Exp-Golomb
# SPS/PPS; the Spark side must walk container → avcC → SPS bitstream and
# recover dimensions (incl. frame cropping for non-mod-16 sizes), profile,
# level, and the PPS entropy mode — every field closed-form in L, checked
# exactly. Only frame PIXEL decode remains env-gated (needs ffmpeg).
_MEDIA_DECODE_H264_ORACLE = """
WITH d AS (SELECT doc_id, octet_length(encode(text)) AS L FROM documents)
SELECT doc_id AS media_id,
       CAST(2 * (2 + L % 320) AS INTEGER) AS width,
       CAST(2 * (2 + L % 180) AS INTEGER) AS height,
       CAST(CASE WHEN L % 2 = 0 THEN 66 ELSE 100 END AS INTEGER) AS profile_idc,
       CAST(10 + 10 * (L % 5)
            + CASE WHEN L % 5 = 4 THEN 1 ELSE 0 END AS INTEGER) AS level_idc,
       (L % 3 = 0) AS entropy_cabac
FROM d
"""


@register("media_decode_h264", _MEDIA_DECODE_H264_ORACLE)
def media_decode_h264(spark, sf_dir):
    from .operators.multimodal import decode_h264_features, h264_mp4_from_docs

    return decode_h264_features(
        h264_mp4_from_docs(_t(spark, sf_dir, "documents")))


# Progressive (SOF2) JPEG through the same planted fixture. The scan
# re-ordering is lossless over the SAME quantized coefficients, so the
# progressive stream must decode to pixels EXACTLY equal to its
# sequential sibling — the Spark side decodes BOTH streams and outputs a
# literal-equality boolean; dimensions stay closed-form-checked.
_MEDIA_DECODE_JPEG_PROG_ORACLE = """
WITH d AS (SELECT doc_id, octet_length(encode(text)) AS L FROM documents)
SELECT doc_id AS media_id,
       CAST(4 + L % 29 AS INTEGER) AS width,
       CAST(3 + L % 13 AS INTEGER) AS height,
       TRUE AS prog_equals_seq
FROM d
"""


@register("media_decode_jpeg_prog", _MEDIA_DECODE_JPEG_PROG_ORACLE)
def media_decode_jpeg_prog(spark, sf_dir):
    from .operators.multimodal import decode_jpeg_features, jpeg_from_docs

    docs = _t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    prog = decode_jpeg_features(
        jpeg_from_docs(docs, min_partitions=par, progressive=True))
    seq = decode_jpeg_features(jpeg_from_docs(docs, min_partitions=par))
    s = seq.select(
        F.col("media_id"),
        F.col("width").alias("s_w"), F.col("height").alias("s_h"),
        F.col("mean_px").alias("s_mean"),
        F.col("top_row_mean").alias("s_top"),
    )
    return prog.join(s, "media_id").select(
        "media_id", "width", "height",
        (
            (F.col("width") == F.col("s_w"))
            & (F.col("height") == F.col("s_h"))
            & (F.col("mean_px") == F.col("s_mean"))
            & (F.col("top_row_mean") == F.col("s_top"))
        ).alias("prog_equals_seq"),
    )


# Lossy codec with EXACT oracle-computed values (round-5 verdict item 7):
# the planted image is constant gray c = L % 256 — a constant 8x8 block
# carries only a DC coefficient, and the q95 DC quantizer (2, luma and
# chroma alike) divides 8*(c-128) exactly, so the decode reproduces c to
# the last bit through the full lossy pipeline (DCT → quantize → Huffman
# → decode). The DuckDB side computes the decoded VALUES itself; no
# Spark-computed tolerance booleans anywhere in this entry.
_MEDIA_DECODE_JPEG_CONST_ORACLE = """
WITH d AS (SELECT doc_id, octet_length(encode(text)) AS L FROM documents)
SELECT doc_id AS media_id,
       CAST(4 + L % 29 AS INTEGER) AS width,
       CAST(3 + L % 13 AS INTEGER) AS height,
       CAST(L % 256 AS DOUBLE) AS mean_px,
       CAST(L % 256 AS DOUBLE) AS top_row_mean
FROM d
"""


@register("media_decode_jpeg_const", _MEDIA_DECODE_JPEG_CONST_ORACLE)
def media_decode_jpeg_const(spark, sf_dir):
    from .operators.multimodal import decode_jpeg_features, jpeg_const_from_docs

    return decode_jpeg_features(jpeg_const_from_docs(
        _t(spark, sf_dir, "documents"),
        min_partitions=spark.sparkContext.defaultParallelism))


@register("media_decode_jpeg", _MEDIA_DECODE_JPEG_ORACLE)
def media_decode_jpeg(spark, sf_dir):
    from .operators.multimodal import decode_jpeg_features, jpeg_from_docs

    docs = _t(spark, sf_dir, "documents")
    feats = decode_jpeg_features(
        jpeg_from_docs(docs, min_partitions=spark.sparkContext.defaultParallelism)
    )
    expected = docs.select(
        F.col("doc_id").alias("media_id"),
        F.octet_length("text").cast("long").alias("L"),
    )
    L = F.col("L")
    h = (F.lit(3) + L % 13).cast("int")
    exp_mean = F.aggregate(
        F.sequence(F.lit(0).cast("long"), (L % 13 + 2)),
        F.lit(0.0),
        lambda acc, r: acc + ((r * 13 + L) % 256).cast("double"),
    ) / h.cast("double")
    exp_top = (L % 256).cast("double")
    return feats.join(expected, "media_id").select(
        "media_id",
        "width",
        "height",
        (F.abs(F.col("mean_px") - exp_mean) < 1.0).alias("mean_within_1"),
        (F.abs(F.col("top_row_mean") - exp_top) < 1.0).alias("top_within_1"),
    )


# --------------------------------------------------------------------------
# Dataset-preparation family (operators/mlprep.py): deterministic split,
# stratified sampling, PII redaction, greedy sequence packing, near-dup
# connected components, boilerplate n-grams. All randomness is md5 so the
# oracles reproduce every assignment bit-for-bit.

from .operators.mlprep import (  # noqa: E402
    chunk_documents,
    chunk_documents_oracle,
    decontaminate,
    decontaminate_oracle,
    boilerplate_ngrams,
    boilerplate_ngrams_oracle,
    dataset_split,
    dataset_split_oracle,
    near_dup_clusters,
    near_dup_clusters_oracle,
    pack_sequences,
    pack_sequences_oracle,
    pii_redact,
    pii_redact_oracle,
    stratified_sample,
    stratified_sample_oracle,
)


@register("prep_dataset_split", dataset_split_oracle())
def prep_dataset_split(spark, sf_dir):
    return dataset_split(_t(spark, sf_dir, "documents"))


@register("prep_stratified_sample", stratified_sample_oracle(0.2))
def prep_stratified_sample(spark, sf_dir):
    return stratified_sample(_t(spark, sf_dir, "documents"), 0.2)


# Decontamination: train split vs the held-out test split of the SAME
# hash split that prep_dataset_split assigns — the synthetic corpus's
# planted exact/near duplicates that straddle the split boundary are the
# leaked documents the operator must flag.
_SPLIT_U = (
    "(CAST(('0x' || substring(md5('split-v1' || '|' || CAST(doc_id AS VARCHAR)),"
    " 1, 15)) AS BIGINT) / CAST(pow(2, 60) AS DOUBLE))"
)
_TRAIN_SQL = f"SELECT * FROM documents WHERE {_SPLIT_U} < 0.9"
_EVAL_SQL = f"SELECT * FROM documents WHERE {_SPLIT_U} >= 0.95"


@register("prep_chunk_documents", chunk_documents_oracle(32, 8))
def prep_chunk_documents(spark, sf_dir):
    return chunk_documents(_t(spark, sf_dir, "documents"), 32, 8)


@register(
    "prep_decontaminate", decontaminate_oracle(_TRAIN_SQL, _EVAL_SQL, n=8)
)
def prep_decontaminate(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    split = dataset_split(docs)  # train 0.9 / val 0.05 / test 0.05
    labeled = docs.join(split, "doc_id")
    return decontaminate(
        labeled.where(F.col("split") == "train").drop("split"),
        labeled.where(F.col("split") == "test").drop("split"),
        n=8,
    )


# The synthetic corpus contains no PII, which would make a redaction
# oracle vacuously green — so the query deterministically plants spans
# derived from doc_id (identically on both engines) before redacting.
_PII_PLANTED_SQL = """
SELECT doc_id,
       text
       || CASE WHEN doc_id % 3 = 0
               THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com'
               ELSE '' END
       || CASE WHEN doc_id % 5 = 0
               THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
                    || CAST(doc_id % 200 + 1 AS VARCHAR)
               ELSE '' END
       || CASE WHEN doc_id % 7 = 0
               THEN ' call +44 207 946 0' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
               ELSE '' END AS text
FROM documents
"""


@register("prep_pii_redact", pii_redact_oracle(table=f"({_PII_PLANTED_SQL})"))
def prep_pii_redact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(did % 3 == 0,
                   F.concat(F.lit(" mail user"), did.cast("string"),
                            F.lit("@example.com"))).otherwise(""),
            F.when(did % 5 == 0,
                   F.concat(F.lit(" from 10.0."), (did % 256).cast("string"),
                            F.lit("."), (did % 200 + 1).cast("string"))
                   ).otherwise(""),
            F.when(did % 7 == 0,
                   F.concat(F.lit(" call +44 207 946 0"),
                            F.lpad((did % 1000).cast("string"), 3, "0"))
                   ).otherwise(""),
        ).alias("text"),
    )
    return pii_redact(planted)


@register("prep_pack_sequences", pack_sequences_oracle())
def prep_pack_sequences(spark, sf_dir):
    return pack_sequences(_t(spark, sf_dir, "documents"))


@register("prep_near_dup_clusters", near_dup_clusters_oracle(_MINHASH_ORACLE))
def prep_near_dup_clusters(spark, sf_dir):
    return near_dup_clusters(_t(spark, sf_dir, "documents"))


@register("prep_boilerplate_ngrams", boilerplate_ngrams_oracle())
def prep_boilerplate_ngrams(spark, sf_dir):
    return boilerplate_ngrams(_t(spark, sf_dir, "documents"))
