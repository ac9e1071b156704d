"""Corpus-curation operators for image+caption training data.

These close the loop from crawl output to training input over the
BASELINE input_hint table shape ``(image_id, bytes, w, h, fmt,
caption, phash)``: quality-gate the pairs, collapse caption variants
of identical images, mix strata to target proportions, and assign
deterministic export shards. Everything is single-pass column math
(whole-stage codegen; the only shuffles are the per-stratum /
per-phash aggregations, both map-side combinable) plus one broadcast
join of a strata-sized plan table — at 100 TB the data crosses the
cluster at most once per operator.

Each operator has an exact DuckDB twin in __spark_entry__
(q_image_filter, q_caption_dedup, q_corpus_mix, q_export_shards).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens_of

#: hash-threshold resolution for rate-based sampling (parts per million)
PPM = 1_000_000


def filter_image_caption(
    pairs: DataFrame,
    min_w: int = 64,
    min_h: int = 64,
    max_aspect: int = 3,
    fmts: tuple[str, ...] = ("png", "jpeg"),
    min_caption_tokens: int = 5,
) -> DataFrame:
    """LAION-style pre-training filter over image+caption pairs.

    Gates, in documented order (each is a pure predicate; Catalyst
    fuses them into one scan with all four pushed to the source):
      1. resolution: ``w >= min_w AND h >= min_h``
      2. aspect ratio: ``max(w,h) <= max_aspect * min(w,h)`` —
         integer compare, no float boundary ambiguity
      3. container format whitelist
      4. caption substance: ``>= min_caption_tokens`` whitespace
         tokens (tokenizer shared with text.token_count)

    Returns the surviving rows plus ``n_caption_tokens``.
    """
    n_tok = F.size(tokens_of(F.col("caption")))
    return (
        pairs.withColumn("n_caption_tokens", n_tok)
        .filter(
            (F.col("w") >= min_w)
            & (F.col("h") >= min_h)
            & (F.greatest("w", "h") <= max_aspect * F.least("w", "h"))
            & F.col("fmt").isin(*fmts)
            & (F.col("n_caption_tokens") >= min_caption_tokens)
        )
    )


def caption_canonicalize(pairs: DataFrame) -> DataFrame:
    """Collapse caption variants of byte-identical images.

    Crawls see the same image under many captions (alt text, file
    name, surrounding paragraph). Group by exact ``phash`` and keep
    one deterministic representative per image: the lexicographically
    smallest image_id and caption (order-independent, so the result is
    stable under any partitioning). One map-side-combinable hash
    aggregation — no window, no sort.

    -> (phash, rep_image_id, canon_caption, n_rows, n_captions)
    """
    return pairs.groupBy("phash").agg(
        F.min("image_id").alias("rep_image_id"),
        F.min("caption").alias("canon_caption"),
        F.count("*").alias("n_rows"),
        F.countDistinct("caption").alias("n_captions"),
    )


def mix_plan(
    docs: DataFrame, stratum_col: str, weights: dict[str, int]
) -> DataFrame:
    """Derive the largest achievable downsampling plan that hits the
    target stratum proportions exactly (no upsampling).

    ``weights`` are integer parts (e.g. {en: 5, de: 3, fr: 2} = 50/30/20)
    so every derived quantity is integer arithmetic — bit-identical
    across engines. With W = sum(parts) and per-stratum count c_s:

      T        = min_s floor(c_s * W / w_s)   (feasible mixed total)
      n_target = floor(w_s * T / W)           (<= c_s by construction)
      ppm      = floor(n_target * PPM / c_s)  (hash-sampling threshold)

    -> (stratum, n_total, n_target, ppm); strata outside ``weights``
    are excluded (weight 0). The result has len(weights) rows — always
    broadcast-sized — INCLUDING weighted strata absent from the corpus
    (n_total 0): a missing stratum makes the target proportions
    infeasible, so it must force t_total = 0 (sample nothing) rather
    than silently vanish from the min and let the emitted plan miss the
    target ratios. Its own ppm is 0, matching 'no rows to sample'.
    """
    wtotal = sum(weights.values())
    spark = docs.sparkSession
    wrows = spark.createDataFrame(
        [(k, int(v)) for k, v in weights.items()], "stratum string, wt int"
    )
    counts = (
        docs.filter(F.col(stratum_col).isin(*weights.keys()))
        .groupBy(F.col(stratum_col).alias("stratum"))
        .agg(F.count("*").alias("n_total"))
    )
    counts = (
        wrows.join(counts, "stratum", "left")
        .withColumn("n_total", F.coalesce("n_total", F.lit(0).cast("long")))
    )
    feasible = counts.select(
        F.min(F.expr(f"(n_total * {wtotal}) div wt")).alias("t_total")
    )
    return (
        counts.crossJoin(F.broadcast(feasible))
        .withColumn("n_target", F.expr(f"(wt * t_total) div {wtotal}"))
        # n_total = 0 only for a corpus-absent stratum (t_total is then
        # 0 for every row); guard the division so ANSI mode doesn't
        # throw on 0 div 0 — ppm 0 == sample nothing, same value the
        # expression produces for every present stratum when t_total=0
        .withColumn(
            "ppm",
            F.when(F.col("n_total") == 0, F.lit(0).cast("long")).otherwise(
                F.expr(f"(n_target * {PPM}) div n_total")
            ),
        )
        .select("stratum", "n_total", "n_target", "ppm")
    )


def mix_corpus(
    docs: DataFrame,
    stratum_col: str,
    weights: dict[str, int],
    key_col: str = "doc_id",
    sample_hash: Column | None = None,
) -> DataFrame:
    """Deterministic hash-threshold corpus mixing (data mixing for
    pre-training): sample each stratum at the rate mix_plan derived so
    the output approximates the target proportions, keeping a row iff
    ``hash(key) % PPM < ppm(stratum)``.

    The plan side is len(weights) rows — broadcast join, so the corpus
    is scanned exactly once with no big-side shuffle; membership is
    reproducible row-local math (re-running on any partitioning of the
    same rows selects the same set). ``sample_hash`` defaults to the
    JVM xxhash64 of ``key_col``; pass a custom column (e.g. the shared
    md5-h64) when a cross-engine twin must select identical rows.
    """
    if sample_hash is None:
        sample_hash = F.xxhash64(F.col(key_col))
    plan = mix_plan(docs, stratum_col, weights).withColumnRenamed(
        "stratum", stratum_col
    )
    return (
        docs.join(F.broadcast(plan), stratum_col)
        .filter(F.pmod(sample_hash, F.lit(PPM)) < F.col("ppm"))
        .drop("n_total", "n_target", "ppm")
    )


def assign_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int = 16,
    shard_hash: Column | None = None,
) -> DataFrame:
    """Deterministic training-export shard assignment:
    ``shard = hash(key) % n_shards``. Row-local (no shuffle to
    assign); a writer then does one exchange on ``shard`` to produce
    exactly n_shards balanced output files — hash occupancy keeps the
    imbalance O(sqrt(rows/shards)) regardless of input order or skewed
    natural keys. Same hash seam as mix_corpus for oracle parity.
    """
    if shard_hash is None:
        shard_hash = F.xxhash64(F.col(key_col))
    return df.withColumn(
        "shard", F.pmod(shard_hash, F.lit(n_shards)).cast("int")
    )
