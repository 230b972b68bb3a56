"""Similarity search over an embedding column (``array<float>``).

Three operators, all pure ``pyspark.sql.functions`` higher-order array
expressions (JVM-side, whole-stage codegen; no Python in the hot path):

  * ``cosine_topk``          — brute-force cosine top-k: broadcast the
                               (small) query set against the corpus.
                               The exact baseline every ANN variant is
                               measured against.
  * ``lsh_cosine_topk``      — random-hyperplane LSH: each vector gets a
                               sign-bit signature from ``num_planes``
                               deterministic pseudo-random hyperplanes;
                               top-k is searched only among vectors in
                               the SAME bucket. At scale this turns an
                               O(Q×N) scan into a bucket-pruned join.
  * ``embedding_near_dups``  — near-duplicate pairs by cosine ≥ threshold
                               (semantic dedup for training corpora),
                               blocked by a coarse key.

The hyperplanes are derived from md5 hex digits (deterministic, seedable,
and reproducible in any engine — the DuckDB oracle computes bit-identical
signatures), centered on [-7.5, 7.5] per component.

Scale notes: brute force broadcasts queries (fine for ≤10^4 queries ×
any corpus: one pass, no shuffle of the corpus); LSH shuffles on the
bucket signature only; near-dup blocks on a coarse key exactly like
textdedup's blocked Jaccard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textdedup import HEX


def dot(a, b) -> "F.Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a, b) -> "F.Column":
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def norm(a) -> "F.Column":
    """L2 norm with the SAME fold order as ``cosine``'s denominator —
    precomputing it once per vector (instead of once per candidate pair)
    is bit-identical because each dot product keeps its own sequential
    fold; only the evaluation count changes."""
    return F.sqrt(dot(a, a))


def _plane_component(p: int, d) -> "F.Column":
    """Deterministic hyperplane component in [-7.5, 7.5]: the value of a
    hex digit of md5('p{p}|{d}') minus 7.5 (zero-mean)."""
    h = F.md5(F.concat(F.lit(f"p{p}|"), d.cast("string")))
    return (F.instr(F.lit(HEX), F.substring(h, 1, 1)) - 1).cast("double") - 7.5


def _plane_values(p: int, dim: int) -> list[float]:
    """Driver-side precompute of the SAME plane (bit-identical to
    ``_plane_component``: hashlib and Spark md5 agree on hex digests).
    The plane depends only on (p, component index), never on row data —
    evaluating md5 per row per component would burn ~planes×dim hash
    calls per vector for values that are constants."""
    import hashlib

    return [
        float(HEX.index(hashlib.md5(f"p{p}|{d}".encode()).hexdigest()[0])) - 7.5
        for d in range(dim)
    ]


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (brute force, broadcast
    queries). Deterministic tie-break on neighbor id."""
    from . import ensure_parallelism

    vectors = ensure_parallelism(vectors)
    scored = (
        F.broadcast(queries)
        .crossJoin(vectors)
        .where(F.col(id_col) != F.col(query_id_col))
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            cosine(F.col(query_vec_col), F.col(vec_col)).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id_col, "neighbor_id", F.round("cos", 4).alias("cos_r"), "rk")
    )


def lsh_table_signatures(
    vec, num_tables: int = 6, planes_per_table: int = 4, dim: int | None = None
) -> "F.Column":
    """Multi-table LSH: array of (tbl, sig) structs, one per hash table.
    Each table uses its own disjoint plane set (global plane index
    ``tbl * planes_per_table + p``). A single fine signature shatters the
    corpus into near-singleton buckets (recall collapses); L coarser
    tables union their buckets — the classic recall/cost dial.

    With ``dim`` known, the planes are precomputed driver-side and shipped
    as array literals — the projection is a plain multiply-add over the
    vector with zero per-row hashing. Without ``dim`` (ragged vectors) it
    falls back to per-row md5 plane derivation — identical values,
    ~10× the expression cost."""

    def _proj(gp: int):
        if dim is not None:
            plane = F.array(*[F.lit(v) for v in _plane_values(gp, dim)])
            pairs = F.zip_with(vec, plane, lambda x, w: x.cast("double") * w)
        else:
            pairs = F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x.cast("double") * _plane_component(gp, i),
            )
        return F.aggregate(pairs, F.lit(0.0), lambda acc, v: acc + v)

    tables = []
    for t in range(num_tables):
        bits = [
            F.when(_proj(t * planes_per_table + p) > 0, F.lit("1")).otherwise(F.lit("0"))
            for p in range(planes_per_table)
        ]
        tables.append(F.struct(F.lit(t).alias("tbl"), F.concat(*bits).alias("sig")))
    return F.array(*tables)


def _signed_rows(
    df: DataFrame,
    idc: str,
    vecc: str,
    id_alias: str,
    v_alias: str,
    num_tables: int,
    planes_per_table: int,
    dim: int | None,
) -> DataFrame:
    """One (id, vec, _tbl, _sig) row per hash table per input row:
    projections computed ONCE per row via a single transform over the 2-D
    plane literal, materialized behind a projection boundary so the
    per-table sig assembly reads the array instead of recomputing
    num_tables×planes aggregate trees (which bloats the Catalyst plan
    ~24×: measured seconds of pure planning time)."""
    if dim is None:  # empty corpus — signature shape only
        return df.select(
            F.col(idc).alias(id_alias), F.col(vecc).alias(v_alias),
            F.explode(
                lsh_table_signatures(F.col(vecc), num_tables, planes_per_table)
            ).alias("_t"),
        ).select(id_alias, v_alias, F.col("_t.tbl").alias("_tbl"),
                 F.col("_t.sig").alias("_sig"))
    planes = F.array(*[
        F.array(*[F.lit(v) for v in _plane_values(gp, dim)])
        for gp in range(num_tables * planes_per_table)
    ])
    projs = F.transform(
        planes,
        lambda pl: F.aggregate(
            F.zip_with(F.col(vecc), pl, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    staged = df.select(
        F.col(idc).alias(id_alias), F.col(vecc).alias(v_alias),
        projs.alias("_projs"),
    )
    tables = [
        F.struct(
            F.lit(t).alias("tbl"),
            F.concat(*[
                F.when(
                    F.col("_projs")[t * planes_per_table + p] > 0, F.lit("1")
                ).otherwise(F.lit("0"))
                for p in range(planes_per_table)
            ]).alias("sig"),
        )
        for t in range(num_tables)
    ]
    return staged.select(
        id_alias, v_alias, F.explode(F.array(*tables)).alias("_t")
    ).select(id_alias, v_alias, F.col("_t.tbl").alias("_tbl"),
             F.col("_t.sig").alias("_sig"))


def lsh_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_tables: int = 6,
    planes_per_table: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Approximate top-k: candidates = union over L hash tables of the
    query's bucket in each table; exact cosine re-rank on candidates only.

    At scale the corpus shuffles on (tbl, sig) — each query probes
    L buckets (~L·N/2^planes vectors) instead of scanning N.
    """
    from . import ensure_parallelism

    vectors = ensure_parallelism(vectors)
    # one tiny probe fixes the dimensionality → literal precomputed planes
    first = vectors.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(first["d"]) if first is not None else None

    corpus = _signed_rows(
        vectors, id_col, vec_col, "neighbor_id", "_v", num_tables, planes_per_table, dim
    )
    probes = _signed_rows(
        queries, query_id_col, query_vec_col, query_id_col, "_qv",
        num_tables, planes_per_table, dim,
    )
    cand = (
        F.broadcast(probes)
        .join(corpus, ["_tbl", "_sig"])
        .where(F.col("neighbor_id") != F.col(query_id_col))
        .dropDuplicates([query_id_col, "neighbor_id"])
    )
    scored = cand.select(
        F.col(query_id_col),
        "neighbor_id",
        cosine(F.col("_qv"), F.col("_v")).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id_col, "neighbor_id", F.round("cos", 4).alias("cos_r"), "rk")
    )


def cosine_topk_numpy(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched NumPy matmul (mapInPandas).

    The builtins version (``cosine_topk``) evaluates a higher-order
    aggregate per (query, vector) pair — allocation-bound. This path
    ships the (small) query matrix to every task and does one
    ``corpus_batch @ Q.T`` per Arrow batch: the per-pair cost drops to a
    fused BLAS op. Two-stage top-k: per-batch top-k, then a global
    window re-rank over the ≤ k·num_batches survivors per query.
    This is the north-rule-sanctioned vectorized-UDF escape hatch for
    ops the JVM expressions can't execute efficiently.
    """
    import numpy as np
    import pandas as pd

    # id types follow the INPUT frames (string doc ids are the convention
    # elsewhere in operators/) — hardcoding LongType would corrupt or
    # reject non-long ids at the Arrow boundary
    qid_type = queries.schema[query_id_col].dataType
    nid_type = vectors.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(query_id_col, qid_type),
            T.StructField("neighbor_id", nid_type),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    q_rows = queries.select(query_id_col, query_vec_col).collect()
    if not q_rows:
        # zero queries: a valid, empty result (np.linalg.norm on the 0-d
        # stack would raise an axis error before any task ran)
        return (
            vectors.sparkSession.createDataFrame([], out_schema)
            .select(query_id_col, "neighbor_id",
                    F.lit(None).cast("double").alias("cos_r"),
                    F.lit(None).cast("int").alias("rk"))
            .limit(0)
        )
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def _score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = q_norm @ mat.T  # (Q, batch)
            kk = min(k + 1, sims.shape[1])  # +1: the query itself may be in-batch
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            qi = np.repeat(np.arange(len(q_ids)), kk)
            ni = top.ravel()
            yield pd.DataFrame(
                {
                    query_id_col: q_ids[qi],
                    "neighbor_id": ids[ni],
                    "cos": sims[qi, ni],
                }
            )

    from . import ensure_parallelism

    partials = ensure_parallelism(vectors).select(id_col, vec_col).mapInPandas(_score, out_schema)
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        partials.where(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id_col, "neighbor_id", F.round("cos", 4).alias("cos_r"), "rk")
    )


def embedding_near_dups(
    vectors: DataFrame,
    threshold: float = 0.30,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block: int | None = 10_000,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold) within a block.

    ``max_block`` guards the quadratic stage: blocks with more members are
    excluded (route them through the LSH top-k path instead) so the worst
    block costs ≤ max_block² comparisons at any corpus size.
    """
    from . import ensure_parallelism

    base = ensure_parallelism(vectors).select(
        F.col(block_col).alias("_blk"), F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    if max_block is not None:
        small = (
            base.groupBy("_blk").agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") <= max_block).select("_blk")
        )
        base = base.join(small, "_blk", "left_semi")
    # norm once per vector (N evaluations), not once per pair (~N²/blocks):
    # the quadratic stage then pays only the cross-pair dot product
    base = base.withColumn("_n", norm(F.col("_v")))
    left = base.select(
        "_blk", F.col("_id").alias("id_a"),
        F.col("_v").alias("v_a"), F.col("_n").alias("n_a"),
    )
    right = base.select(
        "_blk", F.col("_id").alias("id_b"),
        F.col("_v").alias("v_b"), F.col("_n").alias("n_b"),
    )
    return (
        left.join(right, "_blk")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos", dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos_r"))
    )


def ivf_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the cell-partitioned ANN
    scale path, complementing the hyperplane-LSH variant.

    Coarse quantizer: the ``n_cells`` corpus vectors with the smallest
    ids, L2-normalized driver-side, stand in for an offline-trained
    k-means codebook (deterministic, so the DuckDB oracle reproduces the
    exact cells; swap in trained centroids without touching the plan).
    Every corpus vector is assigned to its max-cosine cell by a pure
    map-side argmax over the broadcast centroid literals — no shuffle,
    no join. Each query probes its ``n_probe`` best cells and brute-
    forces only those cells' members (broadcast probes → the corpus is
    scanned once, filtered by cell match).

    At 10^9 vectors the knobs follow IVF practice: n_cells ≈ √N so a
    probe touches ~n_probe·√N candidates instead of N; assignment cost
    is n_cells fused multiply-adds per row inside whole-stage codegen.
    Recall/cost dial: n_probe up for recall, n_cells up for speed.
    """
    import math

    from . import ensure_parallelism

    vectors = ensure_parallelism(vectors)
    seeds = (
        vectors.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col))
        .limit(n_cells)
        .collect()
    )
    if not seeds:  # empty corpus — brute path returns the empty shape
        return cosine_topk(
            vectors, queries, k, id_col, vec_col, query_id_col, query_vec_col
        )
    cent_lits = []
    for r in seeds:
        v = [float(x) for x in r[vec_col]]
        nrm = math.sqrt(sum(x * x for x in v)) or 1.0
        cent_lits.append(F.array(*[F.lit(x / nrm) for x in v]))

    def _assign(vec) -> "F.Column":
        # argmax cell, ties → lowest cell (first occurrence)
        scores = F.array(*[dot(vec, c) for c in cent_lits])
        return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")

    def _probe_cells(vec) -> "F.Column":
        # top-n_probe cells by centroid cosine; (-cell) in the sort struct
        # makes descending order break score ties toward the LOWEST cell
        scored = F.array(*[
            F.struct(dot(vec, c).alias("s"), F.lit(-i).alias("nc"))
            for i, c in enumerate(cent_lits)
        ])
        ranked = F.slice(F.sort_array(scored, asc=False), 1, min(n_probe, len(cent_lits)))
        return F.transform(ranked, lambda t: -t["nc"])

    corpus = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_v"),
        _assign(F.col(vec_col)).alias("_cell"),
    )
    probes = queries.select(
        query_id_col,
        F.col(query_vec_col).alias("_qv"),
        F.explode(_probe_cells(F.col(query_vec_col))).alias("_cell"),
    )
    scored = (
        F.broadcast(probes)
        .join(corpus, "_cell")
        .where(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col,
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_v")).alias("cos"),
        )
        # no dedup needed: a corpus vector lives in exactly ONE cell and a
        # query's probe cells are distinct, so each (query, neighbor) pair
        # appears at most once — the plan stays a single broadcast join
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id_col, "neighbor_id", F.round("cos", 4).alias("cos_r"), "rk")
    )


def embedding_near_dups_lsh(
    vectors: DataFrame,
    threshold: float = 0.30,
    num_tables: int = 6,
    planes_per_table: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 200,
) -> DataFrame:
    """Near-duplicate vector pairs with hyperplane-LSH candidate
    generation (the scale-safe composition of ``embedding_near_dups``).

    The label-blocked form is quadratic WITHIN a block — one skewed label
    holding 10^7 vectors explodes it. Here the block IS the LSH bucket:
    candidates are pairs sharing a (table, signature) bucket in ANY of
    the ``num_tables`` hash tables (hot buckets capped at ``max_bucket``
    like minhash's guard), then the exact cosine verifies candidates
    only. Recall per table for pairs at angle θ is (1 − θ/π)^planes —
    dial ``num_tables`` up / ``planes_per_table`` down for recall, the
    reverse for cost. The shuffle carries (id, tbl, sig) rows, never the
    vectors; vectors re-attach by id for the surviving candidates.
    """
    from . import bucket_pairs, ensure_parallelism

    vectors = ensure_parallelism(vectors)
    first = vectors.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(first["d"]) if first is not None else None

    signed = _signed_rows(
        vectors, id_col, vec_col, "_id", "_v", num_tables, planes_per_table, dim
    ).select("_id", "_tbl", "_sig")  # narrow: no vectors through the shuffle

    cand = bucket_pairs(signed, ["_tbl", "_sig"], "_id", max_bucket)
    # norm once per vector on the re-attach side — candidate pairs then
    # pay one dot product each instead of three (see ``norm``)
    base = vectors.select(
        F.col(id_col).alias("_rid"),
        F.col(vec_col).alias("_rv"),
        norm(F.col(vec_col)).alias("_rn"),
    )
    pairs = (
        cand.join(
            base.select(F.col("_rid").alias("id_a"), F.col("_rv").alias("v_a"),
                        F.col("_rn").alias("n_a")), "id_a")
        .join(
            base.select(F.col("_rid").alias("id_b"), F.col("_rv").alias("v_b"),
                        F.col("_rn").alias("n_b")), "id_b")
    )
    return (
        pairs.withColumn(
            "cos", dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos_r"))
    )
