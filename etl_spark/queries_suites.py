"""Driver-sweep suites: same-shape operator queries folded into one
gate entry each.

The driver's correctness sweep takes the registry in iteration order and
stops after 50 entries (observed: 38/38 in round 1, 50-of-62 in round 2,
50-of-63 in round 3) — with 63 fine-grained entries, ~13 operators per
round shipped without a same-round driver-green row no matter how the
registry was ordered. These suites fold families of SAME-SHAPE queries
(near-dup pair emitters, cosine top-k variants, rollup periods, ...) into
one UNION ALL entry per family, tagged by a ``part`` column, so the WHOLE
registry fits a single sweep. Nothing is lost: every constituent still
runs in full inside its suite (both the Spark plan and the DuckDB oracle
are the verbatim constituents unioned), the fine-grained entries remain
registered in ``etl_spark.queries`` for bench.py / pytest, and SURVEY §2
maps each operator to the suite entry that now carries its gate row.

Hash-stability rules for the union (the driver stringifies every cell and
compares the sorted multiset): every suite column is projected to exactly
one of two types ON BOTH SIDES — VARCHAR for text, DOUBLE for anything
numeric/boolean. Mixed-part columns carry NULLs, and a pandas int column
with NULLs decays to float64 ('9402.0') on the DuckDB side while Spark's
nullable bigint stays object ('9402') — casting both sides to DOUBLE up
front makes the stringified cell identical regardless of null pattern.
Constituent values are already per-column hash-stable (rounded floats,
decimal sums), so the cast is a pure representation change.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import ORACLES, QUERIES

# suite -> (parts, columns)
#   parts:   {part_tag: (constituent_query_name, colmap | None)}
#            colmap maps suite column -> constituent column; None means
#            "all suite columns exist under the same name"; a column
#            missing from the map is NULL for that part.
#   columns: [(suite_column, 's' | 'd')]  ('s' VARCHAR, 'd' DOUBLE)
SUITE_SPECS: dict[str, tuple[dict, list]] = {
    # text near-dup pair emitters (identical shape)
    "dedup_pair_suite": (
        {
            "minhash_lsh": ("dedup_minhash_lsh", None),
            "ngram_lsh": ("dedup_ngram_lsh", None),
            "ngram_jaccard": ("dedup_ngram_jaccard", None),
        },
        [("doc_a", "d"), ("doc_b", "d"), ("jaccard", "d")],
    ),
    # embedding cosine top-k strategies (identical shape)
    "sim_topk_suite": (
        {
            "brute": ("sim_cosine_topk", None),
            "numpy": ("sim_numpy_topk", None),
            "brute_large": ("sim_brute_topk_large", None),
            "ivf": ("sim_ivf_topk", None),
            "lsh": ("sim_lsh_topk", None),
        },
        [("query_id", "d"), ("neighbor_id", "d"), ("cos_r", "d"), ("rk", "d")],
    ),
    # embedding near-duplicate pair emitters (identical shape)
    "sim_near_dup_suite": (
        {
            "blocked": ("sim_embedding_near_dup", None),
            "lsh": ("sim_near_dup_lsh", None),
        },
        [("id_a", "d"), ("id_b", "d"), ("cos_r", "d")],
    ),
    # semi/anti join pair (identical shape)
    "j_semi_anti_suite": (
        {
            "anti": ("j6_anti_join", None),
            "semi": ("j7_semi_join", None),
        },
        [("c_custkey", "d"), ("c_name", "s")],
    ),
    # dataset split + stratified sample
    "prep_sampling_suite": (
        {
            "split": ("prep_dataset_split", {"doc_id": "doc_id", "split": "split"}),
            "stratified": ("prep_stratified_sample", {"doc_id": "doc_id", "lang": "lang"}),
        },
        [("doc_id", "d"), ("split", "s"), ("lang", "s")],
    ),
    # calendar rollups
    "d_rollup_suite": (
        {
            "monthly": (
                "d_monthly_rollup",
                {"period": "month_", "n_events": "n_events",
                 "active_users": "active_users", "n_purchases": "n_purchases",
                 "value": "revenue"},
            ),
            "weekly": (
                "d_weekly_rollup",
                {"period": "week_start", "event_type": "event_type",
                 "n_events": "n_events", "active_users": "active_users",
                 "value": "total_value"},
            ),
        },
        [("period", "s"), ("event_type", "s"), ("n_events", "d"),
         ("active_users", "d"), ("n_purchases", "d"), ("value", "d")],
    ),
    # corpus-level prep: near-dup clusters, boilerplate grams, decontamination
    "prep_corpus_suite": (
        {
            "clusters": ("prep_near_dup_clusters",
                         {"doc_id": "doc_id", "cluster_id": "cluster_id"}),
            "boilerplate": ("prep_boilerplate_ngrams",
                            {"gram": "gram", "n_docs": "n_docs",
                             "n_occurrences": "n_occurrences",
                             "min_doc_id": "min_doc_id"}),
            "decontaminate": ("prep_decontaminate",
                              {"doc_id": "doc_id", "n_hits": "n_hits",
                               "contaminated": "contaminated"}),
        },
        [("doc_id", "d"), ("cluster_id", "d"), ("gram", "s"), ("n_docs", "d"),
         ("n_occurrences", "d"), ("min_doc_id", "d"), ("n_hits", "d"),
         ("contaminated", "d")],
    ),
    # document profiling: corpus stats, per-doc fingerprints, exact dedup
    "doc_profile_suite": (
        {
            "stats": ("doc_stats",
                      {"lang": "lang", "source": "source", "n_docs": "n_docs",
                       "avg_tokens": "avg_tokens", "avg_chars": "avg_chars",
                       "stopword_ratio": "stopword_ratio"}),
            "fingerprint": ("doc_fingerprint",
                            {"doc_id": "doc_id", "min_sig": "min_sig",
                             "max_sig": "max_sig",
                             "n_distinct_tokens": "n_distinct_tokens"}),
            "exact_dedup": ("doc_exact_dedup",
                            {"text_hash": "text_hash", "n_dups": "n_dups",
                             "keep_id": "keep_id"}),
        },
        [("doc_id", "d"), ("lang", "s"), ("source", "s"), ("n_docs", "d"),
         ("avg_tokens", "d"), ("avg_chars", "d"), ("stopword_ratio", "d"),
         ("min_sig", "s"), ("max_sig", "s"), ("n_distinct_tokens", "d"),
         ("text_hash", "s"), ("n_dups", "d"), ("keep_id", "d")],
    ),
    # multimodal: typed metadata/checksum + real BMP/PNG decode features
    "media_suite": (
        {
            "features": ("media_features",
                         {"media_id": "media_id", "mime": "mime",
                          "n_bytes": "n_bytes", "width": "width",
                          "height": "height", "checksum": "checksum"}),
            "decode": ("media_decode",
                       {"media_id": "media_id", "width": "width",
                        "height": "height", "mean_px": "mean_px",
                        "top_row_mean": "top_row_mean"}),
            "decode_png": ("media_decode_png",
                           {"media_id": "media_id", "width": "width",
                            "height": "height", "mean_px": "mean_px",
                            "top_row_mean": "top_row_mean"}),
            "decode_jpeg": ("media_decode_jpeg",
                            {"media_id": "media_id", "width": "width",
                             "height": "height",
                             "mean_within_1": "mean_within_1",
                             "top_within_1": "top_within_1"}),
            "decode_jpeg_prog": ("media_decode_jpeg_prog",
                                 {"media_id": "media_id", "width": "width",
                                  "height": "height",
                                  "prog_equals_seq": "prog_equals_seq"}),
            # lossy codec, ORACLE-computed decoded values (constant-gray
            # fixture is bit-exact at q95 — see media_decode_jpeg_const)
            "decode_jpeg_const": ("media_decode_jpeg_const",
                                  {"media_id": "media_id", "width": "width",
                                   "height": "height", "mean_px": "mean_px",
                                   "top_row_mean": "top_row_mean"}),
            "decode_mp4": ("media_decode_mp4",
                           {"media_id": "media_id", "width": "width",
                            "height": "height", "duration_s": "duration_s",
                            "n_samples": "n_samples"}),
        },
        [("media_id", "d"), ("mime", "s"), ("n_bytes", "d"), ("width", "d"),
         ("height", "d"), ("checksum", "s"), ("mean_px", "d"),
         ("top_row_mean", "d"), ("mean_within_1", "s"),
         ("top_within_1", "s"), ("prog_equals_seq", "s"),
         ("duration_s", "d"), ("n_samples", "d")],
    ),
}


def _sql_type(kind: str) -> str:
    return "DOUBLE" if kind == "d" else "VARCHAR"


def _spark_type(kind: str) -> str:
    return "double" if kind == "d" else "string"


def suite_query(name: str):
    """Spark side of a suite: the verbatim constituent plans, each
    projected onto the suite schema (part tag + typed/padded columns),
    unioned."""
    parts, columns = SUITE_SPECS[name]

    def q(spark, sf_dir):
        out = None
        for tag in sorted(parts):
            qname, colmap = parts[tag]
            df = QUERIES[qname](spark, sf_dir)
            proj = [F.lit(tag).alias("part")]
            for col, kind in columns:
                src = col if colmap is None else colmap.get(col)
                if src is None:
                    proj.append(F.lit(None).cast(_spark_type(kind)).alias(col))
                else:
                    proj.append(F.col(src).cast(_spark_type(kind)).alias(col))
            sel = df.select(*proj)
            out = sel if out is None else out.unionByName(sel)
        return out

    return q


def suite_oracle(name: str) -> str:
    """DuckDB side: the verbatim constituent oracles as subqueries, same
    projection, UNION ALL."""
    parts, columns = SUITE_SPECS[name]
    selects = []
    for tag in sorted(parts):
        qname, colmap = parts[tag]
        inner = ORACLES[qname].strip().rstrip(";")
        proj = [f"'{tag}' AS part"]
        for col, kind in columns:
            src = col if colmap is None else colmap.get(col)
            if src is None:
                proj.append(f"CAST(NULL AS {_sql_type(kind)}) AS {col}")
            else:
                proj.append(f"CAST({src} AS {_sql_type(kind)}) AS {col}")
        selects.append(
            "SELECT " + ", ".join(proj) + f" FROM (\n{inner}\n) AS _{tag}"
        )
    return "\nUNION ALL\n".join(selects)


#: every fine-grained query name a suite carries (removed from the
#: driver-facing registry; still registered in etl_spark.queries)
SUITE_MEMBERS: dict[str, str] = {
    member: suite
    for suite, (parts, _) in SUITE_SPECS.items()
    for member, _cm in parts.values()
}


def driver_registry() -> tuple[dict, dict]:
    """(queries, oracles) for the driver contract: fine-grained entries
    whose family is not suited, plus one entry per suite."""
    queries = {n: fn for n, fn in QUERIES.items() if n not in SUITE_MEMBERS}
    oracles = {n: sql for n, sql in ORACLES.items() if n not in SUITE_MEMBERS}
    for name in SUITE_SPECS:
        queries[name] = suite_query(name)
        oracles[name] = suite_oracle(name)
    return queries, oracles
