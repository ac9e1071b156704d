"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash,
embedding near-dup.

Scale notes (the point of each design):
- exact: one hash-aggregate shuffle on the content hash; at 100 TB this
  is the cheapest pass and runs first to shrink everything downstream.
- ngram-jaccard: the exact pairwise verifier. Never run on the full
  corpus — it's the *verify* stage after candidate generation; its
  self-join is bounded by shingle-bucket fan-out.
- minhash-lsh: the scale path. k signatures -> b bands; candidates are
  pairs sharing a band bucket — the only shuffle is groupBy(band,key),
  and skewed buckets are capped (banding parameters control recall).
- simhash: one 64->16-bit signature per doc via bit-vote aggregation;
  near-dups share the signature bucket.
- embedding near-dup: sign-LSH bucket (first 16 dims' signs) then
  exact cosine verify within buckets.

Every stage is groupBy/join/higher-order-function only — no Python in
the loop; DuckDB SQL twins in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import h64, tokens_of


def norm_text(col: Column) -> Column:
    """Normalization used for exact dedup: lowercase, collapse spaces."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical (normalized) texts: representative =
    min(doc_id), plus group size. Hash-agg, map-side combinable."""
    return (
        docs.select("doc_id", h64(norm_text(F.col("text"))).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count("*").alias("n_dups"))
    )


def shingles_of(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles."""
    toks = tokens_of(text)
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return F.array_distinct(sh)


def _doc_shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(shingles_of(F.col("text"), k)).alias("shingle")
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5, k: int = 3) -> DataFrame:
    """Exact Jaccard over word k-gram shingles for every pair sharing at
    least one shingle. |A∩B| from the shingle self-join, |A∪B| =
    |A|+|B|-|A∩B|. Returns (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    sh = _doc_shingles(docs, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = 8, k: int = 3) -> DataFrame:
    """MinHash: signature_i = min over shingles of h64(shingle || ':' || i).
    Computed with one explode + groupBy — the per-perm hashing happens
    inside a higher-order transform, all JVM-side."""
    sh = _doc_shingles(docs, k)
    cols = [
        F.min(h64(F.concat_ws(":", F.col("shingle"), F.lit(str(i))))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*cols)


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.5,
    k: int = 3,
) -> DataFrame:
    """Banded LSH over MinHash signatures: candidates share a band key;
    candidates are then verified with exact Jaccard. Returns
    (doc_a, doc_b, jaccard) — the scale-path near-dup detector."""
    sig = minhash_signatures(docs, n_hashes, k)
    n_bands = n_hashes // band_size
    bands = None
    for b in range(n_bands):
        key = F.concat_ws(
            "_", *[F.col(f"mh{b * band_size + j}").cast("string") for j in range(band_size)]
        )
        part = sig.select("doc_id", F.lit(b).alias("band"), h64(key).alias("band_key"))
        bands = part if bands is None else bands.unionByName(part)
    x = bands.alias("x")
    y = bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    exact = ngram_jaccard_pairs(docs, threshold=0.0, k=k)
    return (
        cand.join(exact, ["doc_a", "doc_b"])
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash: bit j of the signature is the sign of the vote
    sum_tokens(+1 if bit j of h64(token) else -1). Expressed as
    explode(tokens) x explode(bitpos) -> groupBy(doc, bit) votes ->
    groupBy(doc) bit-assembly. Two map-side-combinable aggregations."""
    tok = docs.select("doc_id", F.explode(tokens_of(F.col("text"))).alias("tok"))
    tok = tok.withColumn("th", h64(F.col("tok")))
    bitpos = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    votes = (
        tok.select("doc_id", "th", bitpos)
        .withColumn(
            "vote",
            F.when(F.expr("(th >> bit) & 1") == 1, 1).otherwise(-1),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("v"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")).otherwise(0)
        ).alias("simhash")
    )


def embedding_near_dup(
    emb: DataFrame, threshold: float = 0.95, sign_bits: int = 16
) -> DataFrame:
    """Near-duplicate vectors: sign-LSH blocking (signature = signs of
    the first `sign_bits` dims) then exact cosine verify inside blocks.
    Returns (vec_a, vec_b, cos) with vec_a < vec_b, cos >= threshold."""
    from .similarity import sign_bucket

    e0 = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
    )
    e = e0.select(
        "vec_id", "embedding", sign_bucket(F.col("embedding"), sign_bits).alias("sig")
    )
    a, b = e.alias("a"), e.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.embedding"), F.col("b.embedding"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(f"{side}.embedding"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        a.join(b, (F.col("a.sig") == F.col("b.sig")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(dot / (norm("a") * norm("b")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
