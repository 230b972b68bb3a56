"""Dataset-preparation operators for LLM training pipelines.

Deterministic split assignment, hash-stratified sampling, PII redaction,
greedy sequence packing, and near-duplicate clustering — the corpus-
construction passes that sit between the dedup/similarity stack and a
training run. Reference analog: the GDPR pseudonymization + exclusion-
list machinery (`/root/reference/etl/dags/user_history/include/load/
modules/mod_load_data_gdpr.sql:10-57`) is the same shape — per-row
deterministic hashing feeding a downstream filter — generalized here to
corpus curation.

Every operator is a JVM-side column expression except ``pack_sequences``
(inherently sequential per shard → Arrow ``applyInPandas``), and every
randomness source is ``md5`` so a DuckDB oracle reproduces results
bit-for-bit (no ``rand()`` anywhere — reruns and backfills must assign
the same rows to the same split/sample/pack at any cluster size).

Scale shapes at 100 TB:
- split / redact: zero-shuffle projections, whole-stage codegen.
- stratified_sample: one shuffle on the strata key; the per-stratum
  rank window is the only ordered step. A pathologically hot stratum
  serializes its rank onto one task — mitigate upstream by sub-salting
  the stratum and apportioning counts, same playbook as cdc/dedup.py.
- pack_sequences: one shuffle on the shard key, then per-shard O(n)
  Arrow batches; shard count is the parallelism dial, and shard
  assignment is itself hash-deterministic.
- near_dup_clusters: candidate edges come from the capped LSH blocker
  (textdedup.minhash_lsh_pairs — narrow banded shuffle); label
  propagation is O(diameter) iterations of a self-join on the edge
  list, with localCheckpoint truncating the growing lineage. Near-dup
  graphs are overwhelmingly tiny cliques, so diameter (and iteration
  count) is small in practice; the iteration cap is an explicit knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 15 hex chars = 60 bits: positive, fits BIGINT in both engines.
_HASH_HEX_CHARS = 15


def uniform_hash(col: "F.Column", salt: str = "") -> "F.Column":
    """Deterministic uniform BIGINT in [0, 2^60) from md5 — identical in
    Spark (``conv(hex,16,10)``) and DuckDB (``('0x'||hex)::BIGINT``)."""
    h = F.md5(F.concat(F.lit(salt), F.lit("|"), col.cast("string")))
    return F.conv(F.substring(h, 1, _HASH_HEX_CHARS), 16, 10).cast("long")


def _oracle_hash(expr: str, salt: str = "") -> str:
    """The DuckDB rendering of :func:`uniform_hash`."""
    return (
        f"CAST(('0x' || substring(md5('{salt}' || '|' || "
        f"CAST({expr} AS VARCHAR)), 1, {_HASH_HEX_CHARS})) AS BIGINT)"
    )


def dataset_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document to a named split by hash bucket.

    ``weights`` are fractions summing to ~1; the [0,1) hash line is cut
    at their cumulative sums, in dict order. Membership depends only on
    (salt, id) — stable under reruns, repartitioning, and corpus growth
    (new docs don't move old ones between splits, unlike rank-based
    splitting). Zero shuffle.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    u = uniform_hash(F.col(id_col), salt) / F.lit(float(2**60))
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return docs.select(F.col(id_col), split.alias("split"))


def dataset_split_oracle(
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    u = f"({_oracle_hash(id_col, salt)} / CAST(pow(2, 60) AS DOUBLE))"
    names = list(weights)
    branches, acc = [], 0.0
    for name in names[:-1]:
        acc += weights[name]
        branches.append(f"WHEN {u} < {acc!r} THEN '{name}'")
    case = "CASE " + " ".join(branches) + f" ELSE '{names[-1]}' END"
    return f"SELECT {id_col}, {case} AS split FROM {table}"


def stratified_sample(
    docs: DataFrame,
    fraction: float,
    strata_cols: list[str] | None = None,
    salt: str = "sample-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-count deterministic stratified sample.

    Within each stratum, documents are ordered by ``(uniform_hash(id),
    id)`` and the first ``ceil(fraction * n)`` are kept — every stratum is
    represented at the exact fraction (±1 row), unlike Bernoulli
    ``sample()`` whose per-stratum counts are binomial noise and whose
    membership changes with partitioning.

    Physical strategy: **histogram threshold selection**, not a
    per-stratum rank window. A window would sort each stratum in ONE task
    (a single hot stratum — one language dominating the corpus —
    serializes the whole job). Instead:

      1. bucket the hash into ``threshold_bins`` equal ranges and count
         per (stratum, bin) — a narrow, fully parallel aggregation;
      2. per stratum, a prefix sum over its ≤``threshold_bins`` histogram
         rows (a bounded window: partition size == bin count, never
         data-sized) finds each bin's start rank, hence which bins are
         kept whole, skipped whole, or straddle the quota;
      3. rows in kept-whole bins pass with NO sort; only the single
         straddling bin per stratum (≈ n/bins rows under the uniform
         hash) is ranked exactly.

    Identical output to the naive full-sort selection — the bin index is
    the hash's high bits, so (bin, hash, id) order IS (hash, id) order —
    at O(n/bins) sorted rows per stratum instead of O(n).
    """
    strata = strata_cols or ["lang"]
    bins = 8192
    width = (1 << 60) // bins  # uniform_hash ∈ [0, 2^60)
    base = docs.select(F.col(id_col), *[F.col(c) for c in strata]).withColumn(
        "_h", uniform_hash(F.col(id_col), salt)
    ).withColumn("_bin", F.floor(F.col("_h") / F.lit(width)).cast("int"))

    wbin = Window.partitionBy(*strata).orderBy("_bin")
    wall = Window.partitionBy(*strata)
    hist = (
        base.groupBy(*strata, "_bin")
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn("_cum", F.sum("_c").over(wbin))
        .withColumn("_q", F.ceil(F.sum("_c").over(wall) * F.lit(fraction)))
        .withColumn("_start", F.col("_cum") - F.col("_c"))
    )
    info = hist.where(F.col("_start") < F.col("_q")).select(
        *[F.col(c).alias(f"_s_{c}") for c in strata],
        F.col("_bin").alias("_s_bin"),
        (F.col("_cum") <= F.col("_q")).alias("_whole"),
        (F.col("_q") - F.col("_start")).alias("_take"),
    )
    cond = F.col("_bin") == F.col("_s_bin")
    for c in strata:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_s_{c}"))
    joined = base.join(F.broadcast(info), cond, "inner")

    whole = joined.where(F.col("_whole")).select(id_col, *strata)
    wsel = Window.partitionBy(*strata, "_bin").orderBy(F.col("_h"), F.col(id_col))
    straddle = (
        joined.where(~F.col("_whole"))
        .withColumn("_rk", F.row_number().over(wsel))
        .where(F.col("_rk") <= F.col("_take"))
        .select(id_col, *strata)
    )
    return whole.unionByName(straddle)


def stratified_sample_oracle(
    fraction: float,
    strata_cols: list[str] | None = None,
    salt: str = "sample-v1",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    strata = ", ".join(strata_cols or ["lang"])
    h = _oracle_hash(id_col, salt)
    return f"""
WITH ranked AS (
  SELECT {id_col}, {strata},
         row_number() OVER (PARTITION BY {strata} ORDER BY {h}, {id_col}) AS rk,
         count(*) OVER (PARTITION BY {strata}) AS n
  FROM {table}
)
SELECT {id_col}, {strata} FROM ranked WHERE rk <= ceil(n * {fraction})
"""


# PII patterns: restricted to syntax with identical semantics in Java
# regex (Spark) and RE2 (DuckDB) — character classes, bounded greedy
# quantifiers, \b word boundaries; no backrefs, no lookaround.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ][0-9]{3,4}", "<PHONE>"),
]


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII spans and count them per document.

    Patterns are applied in fixed order (email → ip → phone) so counts
    and replacements compose identically across engines. Zero-shuffle
    projection; at 100 TB this runs at scan bandwidth inside
    whole-stage codegen (JVM regex, no Python)."""
    out = docs
    clean = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(clean, F.lit(pat), F.lit(0))).alias(
                f"n_{name}"
            )
        )
        clean = F.regexp_replace(clean, pat, repl)
    return out.select(
        "doc_id", clean.alias("clean_text"), *counts
    )


def pii_redact_oracle(table: str = "documents", text_col: str = "text") -> str:
    clean = text_col
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            f"len(regexp_extract_all({clean}, '{pat}')) AS n_{name}"
        )
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    return (
        f"SELECT doc_id, {clean} AS clean_text, {', '.join(counts)} "
        f"FROM {table}"
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    n_shards: int = 8,
    salt: str = "pack-v1",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy sequence packing: fill fixed token-budget packs per shard.

    Documents are hash-sharded, then within a shard (ordered by id) the
    classic greedy rule runs: append to the open pack while it fits,
    else start a new pack; over-budget documents get a pack of their
    own. The sequential fold is per-shard only — shards pack in
    parallel as Arrow batches (``applyInPandas`` with an O(n) loop over
    numpy arrays; n = shard size, bounded by corpus/n_shards). At 100 TB
    the shard count is the parallelism dial and pack ids are globally
    unique as (shard, pack_in_shard).

    Token counts are whitespace tokens (swap in the BPE-ish profile from
    textstats for model-accurate budgets — same plan shape).
    """
    import pandas as pd

    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        (uniform_hash(F.col(id_col), salt) % n_shards).cast("int").alias("shard"),
        toks.cast("long").alias("n_tokens"),
    )

    # doc_id keeps the corpus's own id type (string ids are common) —
    # only the derived columns are fixed-width
    id_ddl = docs.schema[id_col].dataType.simpleString()
    schema = f"doc_id {id_ddl}, shard int, n_tokens long, pack_id long, pack_fill long"

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", ignore_index=True)
        packs, fills = [], []
        pack, fill = 0, 0
        first = True
        for t in pdf["n_tokens"].to_numpy():
            if first:
                fill = t
                first = False
            elif fill + t <= budget:
                fill += t
            else:
                pack += 1
                fill = t
            packs.append(pack)
            fills.append(fill)
        pdf["pack_id"] = packs
        pdf["pack_fill"] = fills
        return pdf

    return base.groupBy("shard").applyInPandas(_pack, schema)


def pack_sequences_oracle(
    budget: int = 512,
    n_shards: int = 8,
    salt: str = "pack-v1",
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """Recursive-CTE rendering of the same greedy fold (row at rn joins
    the state at rn-1)."""
    h = _oracle_hash(id_col, salt)
    return rf"""
WITH RECURSIVE base AS (
  SELECT {id_col} AS doc_id,
         CAST({h} % {n_shards} AS INTEGER) AS shard,
         CAST(len(regexp_split_to_array(trim({text_col}), '\s+')) AS BIGINT)
           AS n_tokens
  FROM {table}
), ordered AS (
  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
  FROM base
), state AS (
  SELECT shard, rn, doc_id, n_tokens,
         CAST(0 AS BIGINT) AS pack_id, n_tokens AS pack_fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
         CASE WHEN s.pack_fill + d.n_tokens <= {budget}
              THEN s.pack_id ELSE s.pack_id + 1 END,
         CASE WHEN s.pack_fill + d.n_tokens <= {budget}
              THEN s.pack_fill + d.n_tokens ELSE d.n_tokens END
  FROM state s JOIN ordered d ON d.shard = s.shard AND d.rn = s.rn + 1
)
SELECT doc_id, shard, n_tokens, pack_id, pack_fill FROM state
"""


def near_dup_clusters(
    docs: DataFrame,
    max_iters: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Connected components over the LSH near-duplicate graph.

    Edges come from :func:`etl_spark.operators.textdedup.minhash_lsh_pairs`
    (capped-bucket LSH — the scale-safe candidate generator); components
    are found by min-label propagation: every node repeatedly adopts the
    smallest label among itself and its neighbors until a fixpoint. The
    loop is driver-controlled but each iteration is one distributed
    join + aggregate; ``localCheckpoint`` truncates lineage so the plan
    doesn't deepen with iterations. Convergence in O(component diameter)
    iterations — near-dup components are small cliques, so 2-3 in
    practice (``max_iters`` bounds adversarial chains; unconverged runs
    raise rather than return wrong clusters).

    Output: one row per document that has at least one near-duplicate,
    with its cluster id (= smallest doc id in the component).
    """
    from .textdedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs, id_col=id_col, text_col=text_col)
    # symmetric edge list (a->b and b->a) so one-directional propagation
    # reaches the whole component
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        # carry the pre-update label through the checkpoint: the
        # convergence check is then a scan of the materialized frame
        # instead of a second shuffle join against the old labels
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                        ).alias("label"),
                F.col("label").alias("_prev"),
            )
            .localCheckpoint()
        )
        changed = updated.where(F.col("label") != F.col("_prev")).count()
        labels = updated.select("id", "label")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"near_dup_clusters did not converge in {max_iters} iterations"
        )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def near_dup_clusters_oracle(pair_sql: str) -> str:
    """Transitive closure over the pair oracle's edges (small graphs:
    the closure is the whole point of the oracle, not a scale path)."""
    return f"""
WITH RECURSIVE pair_base AS ({pair_sql}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pair_base
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pair_base
), nodes AS (
  SELECT DISTINCT src AS id FROM edges
), reach AS (
  SELECT id, id AS root FROM nodes
  UNION
  SELECT e.dst AS id, r.root
  FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, min(root) AS cluster_id FROM reach GROUP BY id
"""


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level repeated n-gram (boilerplate) detection.

    Word n-grams are built as a JVM higher-order transform (no UDF),
    exploded, and aggregated across the corpus; n-grams appearing in
    ≥ ``min_docs`` distinct documents are boilerplate candidates
    (headers, footers, license blurbs).

    The corpus-wide aggregation never shuffles n-gram TEXT:

      1. candidate filter — count distinct docs per ``xxhash64(gram)``:
         the shuffle key is 8 bytes instead of ~n words of text (~10×
         fewer shuffle bytes at transcript-scale corpora). A 64-bit
         collision can only MERGE two grams' counts, so the filter is a
         superset of the true boilerplate set — never a miss;
      2. survivors re-attach their text via a hashed semi-join against
         the SAME exploded relation (persisted — see below), and the
         exact stats (distinct docs, occurrences, min doc) are then
         computed per gram TEXT over surviving rows only — boilerplate
         is rare, so this final text-keyed shuffle is tiny, and the
         HAVING re-check makes the result collision-exact.

    The exploded (doc_id, gram) relation feeds BOTH branches (the hashed
    candidate count and the survivor re-attach); without a barrier each
    branch re-tokenizes and re-slices every document — measured +46% at
    sf0.1. It is persisted (MEMORY_AND_DISK) exactly like
    ``bucket_pairs``: expensive to recompute (per-row transform over the
    whole corpus), lineage kept so executor loss recomputes, blocks age
    out via LRU.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array())
    # output column named 'gram' so it leads the name-sorted column order
    # (the correctness gate sorts rows by the first name-sorted columns;
    # the counts alone are heavily tied, the gram text is unique)
    exploded = docs.select("doc_id", F.explode(grams).alias("gram")).persist()
    cand = (
        exploded.groupBy(F.xxhash64("gram").alias("_gh"))
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("_gh")
    )
    kept = exploded.join(
        F.broadcast(cand), F.xxhash64("gram") == F.col("_gh"), "left_semi"
    )
    return (
        kept.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def boilerplate_ngrams_oracle(
    n: int = 5, min_docs: int = 3, text_col: str = "text",
    table: str = "documents",
) -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower({text_col})), '\s+') AS t
  FROM {table}
), grams AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {n}
              THEN list_transform(range(1, len(t) - {n} + 2),
                                  i -> array_to_string(t[i:i+{n - 1}], ' '))
              ELSE [] END AS gl
  FROM toks
), exploded AS (
  SELECT doc_id, UNNEST(gl) AS gram FROM grams
)
SELECT gram, count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_occurrences, min(doc_id) AS min_doc_id
FROM exploded GROUP BY gram HAVING count(DISTINCT doc_id) >= {min_docs}
"""


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing at
    least one n-word-gram with any evaluation document (the standard
    guard against eval leakage into a training corpus).

    Returns one row per train doc: ``(id, n_hits, contaminated)`` where
    ``n_hits`` counts the doc's DISTINCT leaked n-grams.

    Scale shape: the eval side collapses to a DISTINCT gram set before
    the join — eval suites are small (10^3-10^5 docs), so the gram set
    broadcasts and the train side never shuffles: explode → broadcast
    semi-probe → partial-aggregated count by doc id. At extreme eval
    sizes, hash each gram to 64 bits first (xxhash64) to shrink the
    broadcast ~10×; kept as raw strings here so the DuckDB oracle
    reproduces the exact join keys.
    """
    from .textdedup import word_shingles

    egrams = (
        eval_docs.select(F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
    )
    tgrams = train.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    )
    hits = (
        tgrams.join(F.broadcast(egrams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))  # grams pre-distinct per doc
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.col("n_hits").isNotNull().alias("contaminated"),
        )
    )


def _oracle_word_shingles(n: int, text_col: str = "text") -> str:
    """DuckDB rendering of textdedup.word_shingles (distinct n-word grams,
    whole-text fallback for docs shorter than n tokens)."""
    toks = f"string_split_regex(lower(trim({text_col})), '\\s+')"
    return (
        f"list_distinct(CASE WHEN len({toks}) >= {n} "
        f"THEN list_transform(range(1, len({toks}) - {n} + 2), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n} - 1), ' ')) "
        f"ELSE [array_to_string({toks}, ' ')] END)"
    )


def decontaminate_oracle(
    train_sql: str,
    eval_sql: str,
    n: int = 8,
    id_col: str = "doc_id",
) -> str:
    return f"""
    WITH egrams AS (
      SELECT DISTINCT unnest({_oracle_word_shingles(n)}) AS gram
      FROM ({eval_sql})
    ), tgrams AS (
      SELECT {id_col}, unnest({_oracle_word_shingles(n)}) AS gram
      FROM ({train_sql})
    ), hits AS (
      SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_hits
      FROM tgrams JOIN egrams USING (gram)
      GROUP BY {id_col}
    )
    SELECT t.{id_col},
           COALESCE(h.n_hits, 0) AS n_hits,
           h.n_hits IS NOT NULL AS contaminated
    FROM ({train_sql}) t LEFT JOIN hits h USING ({id_col})
    """


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-budget overlapping token windows (the
    dual of ``pack_sequences``; the standard pre-pass for context-length
    capping and retrieval indexing).

    Chunk i covers whitespace tokens [1 + i*stride, +chunk_tokens) with
    stride = chunk_tokens - overlap; the chunk count is
    ceil(max(n_tokens - overlap, 1) / stride), so every token lands in
    at least one chunk, consecutive chunks share ``overlap`` tokens, and
    a doc shorter than one budget yields exactly one whole-doc chunk.

    Scale shape: a zero-shuffle projection — tokenize, generate chunk
    starts with ``sequence``, slice and re-join per chunk, explode. All
    whole-stage codegen; output rows ≈ input tokens / stride regardless
    of document skew (one 10^6-token document becomes many rows, not one
    hot task).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    # case-preserving split (unlike textdedup.tokens): chunk text is
    # payload, not a matching key
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = F.ceil(F.greatest(n - overlap, F.lit(1)) / F.lit(stride)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.slice(toks, i * stride + 1, chunk_tokens).alias("_ct"),
        ),
    )
    return docs.select(
        F.col(id_col), F.explode(chunks).alias("_c")
    ).select(
        id_col,
        F.col("_c.chunk_idx").alias("chunk_idx"),
        F.size("_c._ct").alias("n_tokens"),
        F.concat_ws(" ", "_c._ct").alias("chunk_text"),
    )


def chunk_documents_oracle(
    chunk_tokens: int = 32,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    stride = chunk_tokens - overlap
    toks = f"string_split_regex(trim({text_col}), '\\s+')"
    return f"""
    WITH t AS (
      SELECT {id_col}, {toks} AS toks,
             CAST(ceil(greatest(len({toks}) - {overlap}, 1)
                       / {stride}.0) AS INT) AS n_chunks
      FROM {table}
    ), c AS (
      SELECT {id_col}, unnest(range(0, n_chunks)) AS chunk_idx, toks
      FROM t
    )
    SELECT {id_col},
           CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(list_slice(toks, chunk_idx * {stride} + 1,
                               chunk_idx * {stride} + {chunk_tokens})) AS INT
               ) AS n_tokens,
           array_to_string(list_slice(toks, chunk_idx * {stride} + 1,
                                      chunk_idx * {stride} + {chunk_tokens}),
                           ' ') AS chunk_text
    FROM c
    """
