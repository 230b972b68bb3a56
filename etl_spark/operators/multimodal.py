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

    ``image/bmp`` is a REAL pure-NumPy codec (``decode_bmp``); ``audio/
    wav`` parses real RIFF/PCM (``decode_wav``, dimensions n/a). Codecs
    needing external libs (jpeg/png/mp4 — not in this environment) raise
    ``NotImplementedError``; a production build plugs Pillow/ffmpeg in
    here. ``fake/raw`` payloads decode deterministically from the byte
    content so the generic pipeline stays testable.
    """
    if mime == "fake/raw":
        n = len(payload)
        return {"width": 16 + n % 640, "height": 16 + (n * 31) % 480}
    if mime == "image/bmp":
        d = decode_bmp(payload)
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


def bmp_from_docs(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Planted BMP fixture: one REAL (spec-compliant, bottom-up, padded)
    24-bit BMP per document, dimensions and content derived from the
    text's utf-8 byte length L — width 4 + L%29 (hits every 4-byte
    stride-padding case), height 3 + L%13, visual row r filled with
    (r*13 + L) % 256. The stats are analytically known from L, so a
    DuckDB oracle can verify the DECODER without having one."""
    import numpy as np

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                L = len(str(text).encode("utf-8"))
                w, h = 4 + L % 29, 3 + L % 13
                rows = (np.arange(h, dtype=np.int64) * 13 + L) % 256
                px = np.repeat(rows.astype(np.uint8), w * 3).reshape(h, w, 3)
                payloads.append(encode_bmp(px))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "mime": "image/bmp",
                    "payload": payloads,
                }
            )

    return docs.select(
        F.col(id_col), F.col(text_col).alias("text")
    ).mapInPandas(_encode, MEDIA_SCHEMA)


def decode_bmp_features(media: DataFrame) -> DataFrame:
    """Arrow-batched real-codec decode: dimensions + pixel stats per BMP."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_bmp(p) for p in pdf["payload"]]
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


def docs_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: synthesize a media table from the documents fixture —
    utf-8 bytes as the opaque payload, ``fake/raw`` mime."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("fake/raw").alias("mime"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )
