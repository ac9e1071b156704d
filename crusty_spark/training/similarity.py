"""Similarity search over the embeddings table.

- brute-force cosine top-k: the correctness baseline. The query side
  is small (sampled ids); the join is a broadcast of queries against
  the full corpus — one scan, no shuffle of the big side, rank via a
  bounded per-query window.
- LSH-bucketed top-k: the scale path. Both sides bucket by a sign-LSH
  signature; candidates only within a bucket, so the corpus-side scan
  shuffles once by bucket key instead of crossing with every query.
  (An IVF variant is the same shape with learned centroids as bucket
  keys.)

Cosine is computed with zip_with + aggregate — JVM higher-order
functions, no UDF. Scores are ranked on the rounded value with vec_id
tie-break so results are stable across engines (DuckDB twin uses
list_cosine_similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_of(v):
    return F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, v_: acc + v_)
    )


def _cos(a: str, b: str):
    # compute in float64 (embeddings are float32 on disk) so the DuckDB
    # twin (embedding::DOUBLE[]) sees bit-identical arithmetic
    av = F.transform(F.col(a), lambda x: x.cast("double"))
    bv = F.transform(F.col(b), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    def nrm(v):
        return F.sqrt(
            F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, v_: acc + v_)
        )
    return dot / (nrm(av) * nrm(bv))


def cosine_topk(
    emb: DataFrame, query_mod: int = 101, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbours for query vectors (vec_id % query_mod
    == 0), excluding self. Returns (query_id, neighbor_id, cos, rank).

    The float32->float64 cast and each side's norm are computed ONCE per
    row before the broadcast cross join, not once per (query, corpus)
    pair — sqrt(agg(v^2)) over the same doubles is the same float
    whether computed per pair or per row, so scores are bit-identical
    to the per-pair form (guide §1.2: cut repeated work before anything
    else; this removes ~2/3 of the pair-stage flops)."""
    base = _as_double_vecs(emb)
    q = base.filter(F.pmod("vec_id", F.lit(query_mod)) == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), _norm_of(F.col("v")).alias("qn")
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), _norm_of(F.col("v")).alias("cn")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot("qv", "cv") / (F.col("qn") * F.col("cn")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def sign_bucket(col, bits: int = 8):
    """Sign-LSH bucket id from the first `bits` dims' signs."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.when(
            F.element_at(col, (j + 1).cast("int")) > 0,
            F.pow(F.lit(2.0), j.cast("double")).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def _assign_nearest(e: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, v) x (cid, cv) -> (vec_id, v, cid): nearest centroid by
    squared L2 (rounded to 6dp, cid tie-break — the cross-engine-stable
    ordering). Argmin as ONE aggregation (min over a (dist, cid, v)
    struct — v rides along, never compared: (dist, cid) is unique per
    group), instead of row_number over the corpus x centroids cross:
    no per-vector sort, map-side combinable, k-times less post-cross
    data. The centroid table broadcasts."""
    dist = F.aggregate(
        F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    best = F.min(
        F.struct(
            F.round(dist, 6).alias("d"), F.col("cid").alias("cid"), F.col("v").alias("v")
        )
    ).alias("best")
    return (
        e.join(F.broadcast(cents))
        .groupBy("vec_id")
        .agg(best)
        .select("vec_id", F.col("best.v").alias("v"), F.col("best.cid").alias("cid"))
    )


def _as_double_vecs(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )


def kmeans_centroids(
    emb: DataFrame, n_centroids: int = 16, n_iter: int = 2
) -> DataFrame:
    """Lloyd's k-means as pure DataFrame ops -> (cid, cv) trained
    centroids — the IVF codebook trainer (the iterative-algorithm
    companion to ivf_topk's fixed codebook).

    Deterministic init: the first `n_centroids` vectors by id. Each
    iteration is (a) the broadcast struct-min assignment above and
    (b) the centroid update: per-cluster element-wise mean via
    posexplode -> (cid, pos) avg -> ordered collect — two map-side-
    combinable aggregations, no window, corpus scanned once per
    iteration. Means round to 6dp so the DuckDB twin (different float
    accumulation order) lands on identical codebooks. Clusters that
    lose all members keep their previous centroid. The per-iteration
    localCheckpoint truncates the iterative lineage (the centroid
    table is n_centroids rows — the checkpoint is cheap; the corpus is
    never checkpointed)."""
    e = _as_double_vecs(emb)
    cents = e.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    for _ in range(n_iter):
        assigned = _assign_nearest(e, cents)
        means = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
        )
        new = (
            means.groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos").alias("pos"), F.col("m").alias("m")))
                ).alias("pm")
            )
            .select("cid", F.transform("pm", lambda s: s["m"]).alias("cv"))
        )
        cents = new.unionByName(
            cents.join(new, "cid", "left_anti")
        ).localCheckpoint()
    return cents


def kmeans_assign(
    emb: DataFrame, n_centroids: int = 16, n_iter: int = 2
) -> DataFrame:
    """Final (vec_id, cid) assignment under kmeans_centroids' trained
    codebook — the IVF build output a real deployment would persist as
    the inverted-list index."""
    cents = kmeans_centroids(emb, n_centroids, n_iter)
    return _assign_nearest(_as_double_vecs(emb), cents).select("vec_id", "cid")


def ivf_topk(
    emb: DataFrame, n_centroids: int = 16, query_mod: int = 101, k: int = 5
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid
    (deterministic codebook: the first `n_centroids` vectors by id —
    plug in kmeans_centroids for a trained codebook, the plan shape is
    identical), then search only the query's inverted list. The
    centroid table broadcasts; the corpus shuffles once by centroid id.
    """
    e = _as_double_vecs(emb)
    cents = e.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    assigned = _assign_nearest(e, cents)
    # per-row norms, not per-pair (bit-identical — see cosine_topk)
    q = assigned.filter(F.pmod("vec_id", F.lit(query_mod)) == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        _norm_of(F.col("v")).alias("qn"), "cid",
    )
    c = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv2"),
        _norm_of(F.col("v")).alias("cn"), "cid",
    )
    scored = (
        c.join(F.broadcast(q), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(_dot("qv", "cv2") / (F.col("qn") * F.col("cn")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def lsh_topk(
    emb: DataFrame, query_mod: int = 101, k: int = 5, bits: int = 8
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-LSH
    bucket. Same output shape as cosine_topk; recall < 1 by design —
    this is the plan that survives 10^9 vectors (bucket-local work).
    Casts and norms are per-row, not per-pair (bit-identical — see
    cosine_topk; the sign bucket is sign-invariant under the cast)."""
    e = _as_double_vecs(emb).withColumn("bucket", sign_bucket(F.col("v"), bits))
    q = e.filter(F.pmod("vec_id", F.lit(query_mod)) == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        _norm_of(F.col("v")).alias("qn"), "bucket",
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"),
        _norm_of(F.col("v")).alias("cn"), "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(_dot("qv", "cv") / (F.col("qn") * F.col("cn")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
