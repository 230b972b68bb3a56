"""Curated column-function library — the engine's reusable expression
surface (all JVM-side builtins; importing from here keeps call sites
independent of which operator module owns an implementation).

Families mirror SURVEY §2.8-2.9: hashing/pseudonymization, text
shingling/fingerprinting, vector math, ordering keys.
"""

from pyspark.sql import functions as F

from ..cdc.dedup import pack_order
from ..operators.similarity import cosine, dot, lsh_table_signatures
from ..operators.textdedup import (
    char_shingles,
    jaccard,
    lsh_bands,
    minhash_signature,
    simhash_bits,
    tokens,
    word_shingles,
)
from ..operators.textstats import language_id, quality_score, token_count


def pseudonymize(col, pepper: str = "pepper") -> "F.Column":
    """SHA-256 pseudonym of a value — the reference's pseudonymization
    primitive TO_BASE64(SHA256(CAST(x AS STRING))) (/root/reference/etl/
    dags/user_history/include/load/modules/mod_load_data_gdpr.sql:33),
    hex-encoded here (bit-stable across engines)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(F.concat(F.lit(f"{pepper}|"), c.cast("string")), 256)


__all__ = [
    "pack_order",
    "pseudonymize",
    "cosine",
    "dot",
    "lsh_table_signatures",
    "tokens",
    "word_shingles",
    "char_shingles",
    "minhash_signature",
    "lsh_bands",
    "simhash_bits",
    "jaccard",
    "language_id",
    "quality_score",
    "token_count",
]
