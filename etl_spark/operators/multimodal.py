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

    Real codecs are not available in this environment — a production
    build plugs Pillow/ffmpeg in here. ``fake/raw`` payloads decode
    deterministically from the byte content so the pipeline is testable.
    """
    if mime == "fake/raw":
        n = len(payload)
        return {"width": 16 + n % 640, "height": 16 + (n * 31) % 480}
    raise NotImplementedError(f"no codec for mime={mime!r} in this environment")


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


def docs_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: synthesize a media table from the documents fixture —
    utf-8 bytes as the opaque payload, ``fake/raw`` mime."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("fake/raw").alias("mime"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )
