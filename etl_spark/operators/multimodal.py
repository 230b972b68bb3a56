"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a metadata struct and
runs decode / feature-extraction as Arrow-batched ``mapInPandas`` — the
north rule's "vectorized pandas/Arrow UDFs only" path. The actual codec
work is STUBBED (the sandbox has no image/audio libs): ``decode_stub``
raises ``NotImplementedError`` for real codecs and provides a
deterministic fake for ``fake/raw`` payloads, so the Spark-side contract
— schema, batch iteration, partition sizing — is real and tested while
the pixel math is a drop-in.

Scale notes:
  * binary payloads ride the same parquet scan as everything else;
    ``spark.sql.files.maxPartitionBytes`` bounds per-task batch memory,
    and mapInPandas streams record batches (never materializes a
    partition), so 100 MB media blobs don't OOM an executor;
  * metadata-only predicates (mime, width, duration) are plain columns —
    they push down to the scan without touching bytes.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("checksum", T.StringType(), True),
    ]
)


def decode_stub(payload: bytes, mime: str) -> dict[str, Any]:
    """Decode a media payload to (width, height).

    ``image/bmp`` and ``image/png`` are REAL pure-NumPy codecs
    (``decode_bmp``, ``decode_png`` — the latter stdlib-zlib based, all
    five scanline filters); ``audio/wav`` parses real RIFF/PCM
    (``decode_wav``, dimensions n/a). Codecs needing external libs
    (jpeg/mp4 — not in this environment) raise ``NotImplementedError``;
    a production build plugs Pillow/ffmpeg in here. ``fake/raw``
    payloads decode deterministically from the byte content so the
    generic pipeline stays testable.
    """
    if mime == "fake/raw":
        n = len(payload)
        return {"width": 16 + n % 640, "height": 16 + (n * 31) % 480}
    if mime == "image/bmp":
        d = decode_bmp(payload)
        return {"width": d["width"], "height": d["height"]}
    if mime == "image/png":
        d = decode_png(payload)
        return {"width": d["width"], "height": d["height"]}
    raise NotImplementedError(f"no codec for mime={mime!r} in this environment")


# -- real codecs (pure NumPy — no external media libs) -----------------------


def encode_bmp(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (visual top row first) as an
    uncompressed 24-bit BI_RGB BMP — rows stored bottom-up, BGR, each
    padded to a 4-byte stride, per the Windows DIB spec."""
    import struct

    import numpy as np

    h, w, _ = pixels.shape
    stride = (3 * w + 3) // 4 * 4
    buf = np.zeros((h, stride), dtype=np.uint8)
    buf[:, : 3 * w] = pixels[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up, BGR
    img = buf.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img),
                       2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
    return head + info + img


def decode_bmp(payload: bytes) -> dict[str, Any]:
    """Decode an uncompressed 24-bit BMP: dimensions + pixel statistics.

    Handles the spec's row order (positive height = bottom-up storage)
    and 4-byte row stride padding; ``top_row_mean`` is over the VISUAL
    top row, so a decoder that forgets the flip or reads padding bytes
    fails the planted-fixture oracle.
    """
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    _hsize, w, h = struct.unpack_from("<Iii", payload, 14)
    _planes, bpp = struct.unpack_from("<HH", payload, 26)
    (comp,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB BMP (got bpp={bpp}, comp={comp})")
    bottom_up, h = h > 0, abs(h)
    stride = (3 * w + 3) // 4 * 4
    data = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=off)
    rows = data.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1]
    if bottom_up:
        rows = rows[::-1]
    return {
        "width": int(w),
        "height": int(h),
        "mean_px": float(rows.mean()),
        "top_row_mean": float(rows[0].mean()),
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor PNG
    (W3C PNG spec / RFC 2083): IHDR + one zlib-compressed IDAT of
    filter-0 scanlines + IEND, each chunk CRC32-tagged. Pure
    stdlib-zlib + NumPy — no image libraries."""
    import struct
    import zlib

    import numpy as np

    h, w, _ = pixels.shape
    # filter byte 0 (None) prepended to every scanline
    raw = np.zeros((h, 1 + 3 * w), dtype=np.uint8)
    raw[:, 1:] = pixels.reshape(h, 3 * w)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, truecolor
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict[str, Any]:
    """Decode an 8-bit truecolor (RGB/RGBA) PNG: dimensions + pixel
    statistics, matching ``decode_bmp``'s output shape.

    Implements the spec's full scanline unfiltering: None and Up are
    vectorized row ops; Sub is a per-row ``cumsum`` (byte addition mod
    256 is associative, so the running sum IS the reconstruction);
    Average/Paeth carry a true left-pixel dependency and fall back to a
    per-pixel column walk vectorized over channels. Interlace
    (Adam7) and palette/grayscale color types are out of scope —
    ``NotImplementedError``, same policy as non-24-bit BMP."""
    import struct
    import zlib

    import numpy as np

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = len(_PNG_SIG), [], None
    while pos + 8 <= len(payload):
        size, tag = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + size  # len + tag + crc
    if meta is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color, _comp, _filt, interlace = meta
    if depth != 8 or color not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit truecolor non-interlaced PNG "
            f"(got depth={depth}, color={color}, interlace={interlace})"
        )
    bpp = 3 if color == 2 else 4
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    raw = raw.reshape(h, 1 + w * bpp)
    ftypes, lines = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, w * bpp), dtype=np.uint8)
    for y in range(h):
        f, line = int(ftypes[y]), lines[y]
        prior = out[y - 1] if y else np.zeros(w * bpp, dtype=np.uint8)
        if f == 0:  # None
            out[y] = line
        elif f == 1:  # Sub: cumsum along the row per byte lane
            out[y] = np.cumsum(
                line.reshape(w, bpp).astype(np.uint32), axis=0
            ).astype(np.uint8).reshape(-1)
        elif f == 2:  # Up
            out[y] = line + prior
        elif f in (3, 4):  # Average / Paeth: left dependency -> column walk
            row = out[y]
            pr = prior.reshape(w, bpp).astype(np.int32)
            ln = line.reshape(w, bpp).astype(np.int32)
            rw = row.reshape(w, bpp)
            left = np.zeros(bpp, dtype=np.int32)
            ul = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                b = pr[x]
                if f == 3:
                    val = ln[x] + ((left + b) >> 1)
                else:
                    p = left + b - ul
                    pa, pb, pc = np.abs(p - left), np.abs(p - b), np.abs(p - ul)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, b, ul)
                    )
                    val = ln[x] + pred
                rw[x] = val.astype(np.uint8)
                left = rw[x].astype(np.int32)
                ul = b
        else:
            raise ValueError(f"bad PNG filter type {f}")
    rows = out.reshape(h, w, bpp)[:, :, :3]  # stats over RGB, alpha ignored
    return {
        "width": int(w),
        "height": int(h),
        "mean_px": float(rows.mean()),
        "top_row_mean": float(rows[0].mean()),
    }


def encode_wav(samples, sample_rate: int = 16_000) -> bytes:
    """Encode an int16 NumPy array as mono 16-bit PCM WAV (RIFF)."""
    import struct

    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                sample_rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(payload: bytes) -> dict[str, Any]:
    """Parse RIFF/PCM WAV: walks the chunk list (fmt may not be first),
    returns rate/channels/sample count/duration and the RMS amplitude."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _bps, _align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError("only 16-bit PCM WAV")
    samples = np.frombuffer(data, dtype="<i2")
    n = len(samples) // channels
    return {
        "sample_rate": int(rate),
        "channels": int(channels),
        "n_samples": int(n),
        "duration_s": float(n / rate),
        "rms": float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) if n else 0.0,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over a media table.

    ``mapInPandas`` receives an iterator of record batches: constant
    memory per task regardless of partition size. All per-byte work
    happens vectorized in pandas/NumPy inside the batch loop.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            dims = [decode_stub(p, m) for p, m in zip(payloads, pdf["mime"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": payloads.str.len().astype("int64"),
                    "width": pd.Series([d["width"] for d in dims], dtype="int32"),
                    "height": pd.Series([d["height"] for d in dims], dtype="int32"),
                    "checksum": [hashlib.md5(p).hexdigest() for p in payloads],
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


BMP_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_px", T.DoubleType(), True),
        T.StructField("top_row_mean", T.DoubleType(), True),
    ]
)


def _planted_pixels(L: int):
    """The shared planted-image formula: width 4 + L%29 (hits every BMP
    4-byte stride-padding case), height 3 + L%13, visual row r filled
    with (r*13 + L) % 256 — stats analytic in the text byte length L."""
    import numpy as np

    w, h = 4 + L % 29, 3 + L % 13
    rows = (np.arange(h, dtype=np.int64) * 13 + L) % 256
    return np.repeat(rows.astype(np.uint8), w * 3).reshape(h, w, 3)


def _media_from_docs(docs: DataFrame, encoder, mime: str, id_col: str,
                     text_col: str) -> DataFrame:
    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encoder(_planted_pixels(len(str(text).encode("utf-8"))))
                for text in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "mime": mime,
                    "payload": payloads,
                }
            )

    return docs.select(
        F.col(id_col), F.col(text_col).alias("text")
    ).mapInPandas(_encode, MEDIA_SCHEMA)


def bmp_from_docs(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Planted BMP fixture: one REAL (spec-compliant, bottom-up, padded)
    24-bit BMP per document, pixels from ``_planted_pixels`` — the stats
    are analytically known from L, so a DuckDB oracle can verify the
    DECODER without having one."""
    return _media_from_docs(docs, encode_bmp, "image/bmp", id_col, text_col)


def png_from_docs(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Planted PNG fixture: same ``_planted_pixels`` formula, encoded as
    real zlib-deflate PNG — same analytic oracle verifies the inflate +
    unfilter path."""
    return _media_from_docs(docs, encode_png, "image/png", id_col, text_col)


def _decode_features(media: DataFrame, codec) -> DataFrame:
    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [codec(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.Series([d["width"] for d in decoded], dtype="int32"),
                    "height": pd.Series([d["height"] for d in decoded], dtype="int32"),
                    "mean_px": [round(d["mean_px"], 4) for d in decoded],
                    "top_row_mean": [d["top_row_mean"] for d in decoded],
                }
            )

    return media.mapInPandas(_decode, BMP_DECODE_SCHEMA)


def decode_bmp_features(media: DataFrame) -> DataFrame:
    """Arrow-batched real-codec decode: dimensions + pixel stats per BMP."""
    return _decode_features(media, decode_bmp)


def decode_png_features(media: DataFrame) -> DataFrame:
    """Arrow-batched real-codec decode: dimensions + pixel stats per PNG."""
    return _decode_features(media, decode_png)


def docs_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: synthesize a media table from the documents fixture —
    utf-8 bytes as the opaque payload, ``fake/raw`` mime."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("fake/raw").alias("mime"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )
