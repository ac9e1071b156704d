"""Composed training-data cleaning pipeline over the documents table.

The standard pre-training corpus pass, expressed as a composition of
this package's operators so the whole chain stays JVM-side built-ins:

  quality gate (length + punctuation ratio)
    -> language gate (n-gram stopword language id)
    -> exact dedup (normalized content hash, keep min doc_id)
    -> near-dup drop (MinHash-LSH candidates + exact Jaccard verify;
       of each surviving pair (a < b) the LATER doc_id b is dropped)

At 100 TB each stage strictly shrinks its input before the next,
more expensive one runs — the cheap hash-agg dedup runs before the
shingle/LSH machinery, which itself only verifies banded candidates.
DuckDB twin: __spark_entry__.q_clean_corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as D
from . import text as X


def clean_corpus(
    docs: DataFrame,
    lang: str = "en",
    min_chars: int = 60,
    max_punct: float = 0.2,
    jaccard: float = 0.3,
) -> DataFrame:
    """-> (doc_id, n_chars) of documents surviving the full chain."""
    quality = X.quality_score(docs)
    good_q = quality.filter(
        (F.col("n_chars_q") >= min_chars) & (F.col("punct_ratio") <= max_punct)
    ).select("doc_id")
    good_l = X.lang_id(docs).filter(F.col("pred_lang") == lang).select("doc_id")
    kept = docs.join(good_q, "doc_id", "left_semi").join(good_l, "doc_id", "left_semi")

    reps = D.exact_dedup(kept).select(F.col("rep_doc_id").alias("doc_id"))
    kept = kept.join(reps, "doc_id", "left_semi")

    pairs = D.minhash_lsh_pairs(kept, threshold=jaccard)
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    survivors = kept.join(drop, "doc_id", "left_anti")
    return survivors.select("doc_id", F.length("text").cast("int").alias("n_chars"))


def curate_crawled_images(
    parsed: DataFrame,
    images: DataFrame,
    n_shards: int = 8,
    min_w: int = 16,
    min_h: int = 16,
    max_aspect: int = 3,
    fmts: tuple[str, ...] = ("png", "jpeg"),
    min_caption_tokens: int = 3,
) -> DataFrame:
    """Crawl output -> training input, the full axes-A+B composition:

      fetch_and_parse rows (url, image_id, caption, phash, ...)
        -> successful image fetches only
        -> join payload metadata (w, h, fmt) back by image_id
        -> curation.filter_image_caption   (quality gates)
        -> curation.caption_canonicalize   (one caption per image)
        -> curation.assign_shards          (deterministic export shards)

    -> (shard, n_images, n_source_rows) per export shard. ``parsed`` is
    the PARSE_SCHEMA output of fetch.fetch_and_parse (or the persisted
    frontier join equivalent); ``images`` is the input_hint payload
    table. The metadata join broadcasts ``images``' metadata columns
    when small; at 100 TB the payload table is bucketed by image_id and
    the join co-locates instead — either way no payload bytes move,
    only (image_id, w, h, fmt)."""
    from . import curation as C

    fetched = parsed.filter(
        (F.col("status") == 200) & F.col("image_id").isNotNull()
    ).select("image_id", "caption", "phash")
    meta = images.select("image_id", "w", "h", "fmt")
    pairs = fetched.join(meta, "image_id")
    good = C.filter_image_caption(
        pairs,
        min_w=min_w,
        min_h=min_h,
        max_aspect=max_aspect,
        fmts=fmts,
        min_caption_tokens=min_caption_tokens,
    )
    canon = C.caption_canonicalize(good.select("image_id", "phash", "caption"))
    sharded = C.assign_shards(canon, key_col="rep_image_id", n_shards=n_shards)
    return sharded.groupBy("shard").agg(
        F.count("*").alias("n_images"),
        F.sum("n_rows").cast("bigint").alias("n_source_rows"),
    )
