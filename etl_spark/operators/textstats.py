"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length / punct /
stopword / word-length signals), and BPE-ish token counting — all as
JVM-side column expressions over ``documents(doc_id, text, ...)``; no
UDFs, every operator has a value-level DuckDB oracle.

These are the per-document scoring passes that gate corpus construction
at 100 TB: embarrassingly parallel projections (zero shuffle), so the
only scale question is scan bandwidth — filters on their outputs push
down to the parquet scan when materialized as table columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language function-word lists (heuristic language ID).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "on", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es", "se", "por"],
    "de": ["der", "die", "das", "und", "zu", "in", "den", "von", "ist", "mit"],
    "fr": ["le", "la", "de", "et", "un", "en", "est", "que", "pour", "dans"],
}

# Word-ish token pattern (BPE-ish pre-tokenizer: letter runs, digit runs,
# single punctuation marks — the GPT-2 style coarse split).
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


# one tokenizer for the whole package: the dedup and scoring passes must
# never silently diverge on the same corpus
from .textdedup import tokens as _tokens


def lang_scores(col) -> list[tuple[str, "F.Column"]]:
    """Per-language stopword-hit ratio of a text column."""
    toks = _tokens(col)
    n = F.size(toks)

    def _hits(stop):
        # factory closure: a 2-arg lambda would make Spark pass the array
        # INDEX as the second argument (higher-order function protocol)
        return F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))

    out = []
    for lang, words in LANG_STOPWORDS.items():
        stop = F.array(*[F.lit(w) for w in words])
        out.append((lang, (_hits(stop) / n).cast("double")))
    return out


def language_id(col) -> "F.Column":
    """Predicted language: argmax stopword-hit ratio, ties broken by the
    fixed language order (deterministic); 'und' when nothing hits."""
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    # forward order + strict > ⇒ the FIRST language with the max score
    # wins ties (en > es > de > fr priority, matching the SQL oracle)
    for lang, score in scores:
        take = score > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, score).otherwise(best_score)
    return best_lang


def quality_score(col) -> "F.Column":
    """Composite quality in [0,1]: mean of four bounded signals —
    length (chars/500 capped), alpha ratio, en-stopword ratio ×3 capped,
    mean-word-length fit (penalize <3 or >10)."""
    s = F.trim(col)
    n_chars = F.length(s)
    toks = _tokens(col)
    n_toks = F.size(toks)
    alpha = F.length(F.regexp_replace(F.lower(s), r"[^a-z]", ""))
    stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    mean_wl = alpha / n_toks
    sig_len = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    sig_alpha = alpha / n_chars
    sig_stop = F.least(stop_hits / n_toks * 3.0, F.lit(1.0))
    sig_wl = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.abs(mean_wl - F.lit(6.0)) / F.lit(6.0)
    )
    return (sig_len + sig_alpha + sig_stop + sig_wl) / 4.0


def token_count(col) -> "F.Column":
    """BPE-ish token count: matches of TOKEN_PATTERN."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), 0))


def doc_profile(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per document: predicted language, quality, token count."""
    from . import ensure_parallelism

    t = F.col(text_col)
    return ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        language_id(t).alias("pred_lang"),
        F.round(quality_score(t), 4).alias("quality"),
        token_count(t).alias("n_tokens"),
    )
