"""Deterministic, distributed synthetic data generators.

Everything is a pure function of the row id via ``xxhash64`` — generation
is `spark.range(n)` plus column expressions, so it is:
  * fully distributed (no driver-side pandas, scales to 10^10 rows),
  * deterministic regardless of parallelism (local[8] == local[32]),
  * seeded (the seed participates in every hash).

Shapes follow FIXTURES.md:
  * ``gen_changes``  — the CDC/binlog change stream over the transcripts
    table: ops I/U/D, ~10% duplicates (verbatim + repeated-with-newer),
    ~5% late/out-of-order events, deletes of absent keys, updates before
    inserts, Zipf-ish hot-key skew on ``conv_id``.
  * ``gen_events``   — reference-shaped event spine for the derived
    transforms (sessionization / registration / snapshot), mirroring
    /root/reference/etl/dags/user_history/include/fact/insert_sessions.sql:7-21.

The LWW dedup key is ``(conv_id, turn_idx)`` ordered by ``(op_ts, lsn)``;
``lsn`` is unique per physical row (except verbatim duplicates, which are
bit-identical so either winner is equal), giving the strict total order
the reference achieves with its 3-level tie-break
(/root/reference/etl/dags/user_history/include/load/modules/
mod_load_data_get_data.sql:16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Small deterministic vocabulary for pseudo-text (byte-equality target).
_VOCAB = (
    "the quick spark stream merge upsert table scan filter window join "
    "group sort shuffle partition bucket salt skew epoch snapshot schema "
    "column row batch commit lineage offset replay checkpoint delta key "
    "value turn conversation agent tool user assistant system reply plan"
).split()

SKEW_EXP = 3.5  # P(rank < 1%) ≈ 0.27 of events → "top-1% keys ~30% of mass"


def _h(col, salt: str, seed: int):
    """Deterministic 64-bit hash of (col, salt, seed), non-negative."""
    return F.abs(F.xxhash64(col, F.lit(salt), F.lit(seed)))


def _pseudo_text(src, seed: int, max_words: int = 24):
    """Deterministic pseudo-text: n ∈ [2, max_words-1] words from _VOCAB."""
    nwords = (_h(src, "nw", seed) % (max_words - 2) + 2).cast("int")
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    return F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), nwords),
            lambda i: F.element_at(vocab, (F.pmod(F.xxhash64(src, i, F.lit(seed)), F.lit(len(_VOCAB))) + 1).cast("int")),
        ),
    )


def gen_changes(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 1000,
    turns_per_conv: int = 40,
    n_epochs: int = 8,
    seed: int = 42,
    base_ts: str = "2025-01-01 00:00:00",
    with_lang: bool = False,
) -> DataFrame:
    """CDC change log: (op, conv_id, turn_idx, role, text, tool, ts, op_ts, lsn, epoch).

    ``with_lang=True`` adds the schema-evolution column ``lang`` (FIXTURES §2:
    one designated epoch adds a column; the engine must evolve the target).
    """
    per_epoch = max(1, (n_events + n_epochs - 1) // n_epochs)
    df = spark.range(n_events)

    # Duplicate fixture: ~5% verbatim copies of the previous row, ~5%
    # re-emissions of the previous row's logical event with a newer (op_ts, lsn).
    # A row may only duplicate a NON-duplicate predecessor — otherwise the
    # copy would reproduce hash(id-1)-derived payload while row id-1
    # actually emitted hash(id-2)'s, breaking the bit-identical invariant.
    dup_kind = _h(F.col("id"), "dup", seed) % 20
    prev_is_dup = _h(F.col("id") - 1, "dup", seed) % 20 < 2
    is_dup = (dup_kind < 2) & (F.col("id") > 0) & ~prev_is_dup
    src = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
    verbatim = is_dup & (dup_kind == F.lit(0))

    df = df.withColumn("src", src).withColumn("verbatim", verbatim)

    # Zipf-ish skew: u ∈ [0,1) → rank = floor(C * u^SKEW_EXP) piles mass on low ranks.
    u = (_h(F.col("src"), "conv", seed) % 1_000_000) / 1_000_000.0
    conv_rank = F.floor(F.lit(float(n_convs)) * F.pow(F.lit(u), F.lit(SKEW_EXP)))
    conv_id = F.format_string("conv_%08d", conv_rank)
    turn_idx = (_h(F.col("src"), "turn", seed) % turns_per_conv).cast("int")

    role_i = _h(F.col("src"), "role", seed) % 4
    role = (
        F.when(role_i == 0, "user")
        .when(role_i == 1, "assistant")
        .when(role_i == 2, "system")
        .otherwise("tool")
    )
    tool = F.when(
        role_i >= 1,
        F.format_string("tool_%02d", _h(F.col("src"), "tool", seed) % 20),
    ).otherwise(F.lit(None).cast("string"))

    op_i = _h(F.col("src"), "op", seed) % 100
    op = F.when(op_i < 70, "U").when(op_i < 90, "I").otherwise("D")

    base = F.to_timestamp(F.lit(base_ts))
    # event-time: monotone non-decreasing within a conversation
    ts = F.timestamp_add("SECOND", (conv_rank * 86400 / n_convs + turn_idx * 60).cast("long"), base)

    # op_ts: roughly follows row id; ~5% late by 48h (out-of-order fixture)
    late = _h(F.col("src"), "late", seed) % 100 < 5
    op_ts = F.timestamp_add(
        "SECOND",
        (F.col("src") - F.when(late, F.lit(172800)).otherwise(F.lit(0))).cast("long"),
        base,
    )
    lsn = F.when(F.col("verbatim"), F.col("src")).otherwise(F.col("id"))

    is_delete = op == F.lit("D")
    out = df.select(
        op.alias("op"),
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.when(~is_delete, role).alias("role"),
        F.when(~is_delete, _pseudo_text(F.col("src"), seed)).alias("text"),
        F.when(~is_delete, tool).alias("tool"),
        # deletes keep the before-image event time (Debezium-style full
        # before-image): a tombstone that knows its key's event time keeps
        # the file-set time stats null-free, so time-window pruning stays
        # effective. ts is a stable function of the key, so this is the
        # same value every other version of the key carries.
        ts.alias("ts"),
        op_ts.alias("op_ts"),
        lsn.cast("long").alias("lsn"),
        (F.col("id") / per_epoch).cast("int").alias("epoch"),
    )
    if with_lang:
        lang_i = _h(F.col("conv_id"), "lang", seed) % 5
        lang = (
            F.when(lang_i == 0, "en").when(lang_i == 1, "es").when(lang_i == 2, "de")
            .when(lang_i == 3, "fr").otherwise("zh")
        )
        out = out.withColumn("lang", F.when(F.col("op") != "D", lang))
    return out


def write_change_log(
    spark: SparkSession,
    path: str,
    n_events: int,
    evolve_from_epoch: int | None = None,
    files_per_epoch: int = 32,
    **kwargs,
) -> None:
    """Write the change log as one parquet dir per epoch (``epoch=K/``).

    If ``evolve_from_epoch`` is set, epochs ≥ it carry the extra ``lang``
    column (schema-evolution fixture) — earlier epochs don't have it at all,
    so the engine must widen the target schema mid-replay.

    ``files_per_epoch`` controls scan parallelism downstream: a real binlog
    shard set is many files, and the apply's map side can use at most one
    task per parquet split — too few files serializes the whole scan.
    """
    n_epochs = kwargs.get("n_epochs", 8)
    if n_epochs == 1 and evolve_from_epoch is None:
        # single-epoch fast path (the scaling fixture's shape): one
        # round-robin repartition gives EXACTLY files_per_epoch
        # equal-sized files — the layout the declared scaling protocol
        # measures — and a single epoch never paid the per-epoch
        # re-generation the partitioned path below exists to avoid
        (
            gen_changes(spark, n_events, **kwargs)
            .drop("epoch")
            .repartition(files_per_epoch)
            .write.mode("overwrite")
            .parquet(f"{path}/epoch=00000")
        )
        return
    cut = n_epochs if evolve_from_epoch is None else evolve_from_epoch

    def _write(src, lo, hi):
        # ONE partitioned write per schema regime (two passes total, not
        # one per epoch — the old per-epoch filter loop re-evaluated the
        # generator's hash expressions n_epochs times over all rows).
        # Dynamic overwrite lets the two regimes share the dataset root;
        # the spread column fans each epoch over ~files_per_epoch tasks
        # (scan parallelism downstream — the apply's map side can use at
        # most one task per parquet split).
        spread = F.pmod(F.xxhash64("conv_id", "turn_idx", "lsn"),
                        F.lit(files_per_epoch))
        # hash partitioning on (epoch, spread) leaves ~1/e of the slots
        # empty (collisions double up elsewhere); maxRecordsPerFile splits
        # the doubled-up partitions back apart so each epoch really lands
        # ~files_per_epoch equal files — the scan-split count downstream
        # replay parallelism depends on
        per_file = -(-n_events // (n_epochs * files_per_epoch))  # ceil
        (
            src.where((F.col("epoch") >= lo) & (F.col("epoch") < hi))
            .repartition(n_epochs * files_per_epoch, F.col("epoch"), spread)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .option("maxRecordsPerFile", str(per_file))
            .partitionBy("epoch")
            .parquet(path)
        )

    if cut > 0:
        _write(gen_changes(spark, n_events, **kwargs), 0, cut)
    if cut < n_epochs:
        _write(gen_changes(spark, n_events, with_lang=True, **kwargs), cut, n_epochs)


def gen_events(
    spark: SparkSession,
    n_events: int,
    n_users: int = 200,
    n_days: int = 7,
    seed: int = 42,
    base_date: str = "2025-03-01",
) -> DataFrame:
    """Reference-shaped event spine (FIXTURES §3) for derived-transform tests."""
    df = spark.range(n_events)
    uid_rank = F.floor(
        F.lit(float(n_users)) * F.pow((_h(F.col("id"), "uid", seed) % 1_000_000) / 1_000_000.0, F.lit(2.0))
    )
    unique_id = F.format_string("u_%06d", uid_rank)
    day = (_h(F.col("id"), "day", seed) % n_days).cast("int")
    date_ = F.date_add(F.to_date(F.lit(base_date)), day)
    sec = (_h(F.col("id"), "sec", seed) % 86_400).cast("long")
    event_tstamp = F.timestamp_add("SECOND", sec, F.to_timestamp(date_))
    en_i = _h(F.col("id"), "en", seed) % 10
    event_name = (
        F.when(en_i < 4, "login").when(en_i < 5, "logout").when(en_i < 7, "purchase")
        .when(en_i < 9, "level_up").otherwise("gdpr_delete_request")
    )
    session_id = F.format_string("s_%s_%d", unique_id, (sec / 3600).cast("int"))
    plat_i = _h(F.col("id"), "plat", seed) % 3
    platform = F.when(plat_i == 0, "android").when(plat_i == 1, "ios").otherwise("pc")
    country_i = _h(F.col("id"), "geo", seed) % 6
    geo = (
        F.when(country_i == 0, "US").when(country_i == 1, "DE").when(country_i == 2, "JP")
        .when(country_i == 3, "BR").when(country_i == 4, "GB").otherwise("FR")
    )
    return df.select(
        date_.alias("date_"),
        unique_id.alias("unique_id"),
        F.format_string("inst_%06d", uid_rank).alias("installation_id"),
        F.when(_h(F.col("id"), "hasuser", seed) % 10 < 8, F.format_string("user_%06d", uid_rank)).alias("user_id"),
        F.sha2(F.concat_ws("|", F.lit(seed), F.col("id")), 256).alias("event_id"),
        F.sha2(F.concat_ws("|", unique_id, event_name, sec), 256).alias("event_fingerprint"),
        event_name.alias("event_name"),
        event_tstamp.alias("event_tstamp"),
        F.timestamp_add("SECOND", (_h(F.col("id"), "lag", seed) % 120).cast("long"), event_tstamp).alias("collector_tstamp"),
        session_id.alias("session_id"),
        (_h(F.col("id"), "idx", seed) % 1000).cast("int").alias("event_index"),
        platform.alias("platform"),
        F.when(_h(F.col("id"), "geonull", seed) % 2000 != 0, geo).alias("geo_country"),
        F.when(_h(F.col("id"), "sand", seed) % 50 == 0, F.lit(True)).alias("sandbox_mode"),
        F.when(event_name == "purchase", (_h(F.col("id"), "usd", seed) % 10_000) / 100.0).alias("paid_usd"),
        F.format_string("1.%d.0", (_h(F.col("id"), "bv", seed) % 9)).alias("build_version"),
    )
