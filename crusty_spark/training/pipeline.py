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
