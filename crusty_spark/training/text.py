"""Text-analysis operators: tokens, quality, language id, fingerprints.

All are single-pass column expressions over ``documents(doc_id, text,
lang, source, n_chars)`` — they stay inside whole-stage codegen, scan
only the columns they project (parquet column pruning), and shuffle
only when aggregating. Each has an exact DuckDB SQL twin in
__spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def h64(col: Column) -> Column:
    """Shared cross-engine 64-bit hash: identical in DuckDB as
    cast(concat('0x', substr(md5(x),1,15)) as bigint). 60 bits, always
    non-negative — safe in a signed long in both engines."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens_of(text: Column) -> Column:
    """Whitespace tokens of lowercased, punctuation-stripped text."""
    cleaned = F.regexp_replace(F.lower(text), "[^a-z0-9' ]", " ")
    return F.filter(F.split(cleaned, " +"), lambda t: t != "")


# stopword lists for the n-gram/stopword language heuristic
STOP_EN = ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"]
STOP_DE = ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"]
STOP_FR = ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"]


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish regex pieces (\\w+ runs and single
    non-space punctuation), the two standard size estimators."""
    return docs.select(
        "doc_id",
        F.size(tokens_of(F.col("text"))).alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0)).alias(
            "n_pieces"
        ),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Length/punctuation/stopword-ratio quality heuristics, rounded for
    cross-engine float stability."""
    toks = tokens_of(F.col("text"))
    n_tok = F.size(toks)
    n_chars = F.length("text")
    n_punct = F.size(F.regexp_extract_all("text", F.lit(r"[^\w\s]"), 0))
    n_stop = F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in STOP_EN])))
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_q"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(n_chars / F.greatest(n_tok, F.lit(1)), 4).alias("mean_token_len"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-overlap language classifier (en/de/fr/unknown), the
    classic cheap lang-id heuristic; deterministic tie-break en>de>fr."""
    toks = F.array_distinct(tokens_of(F.col("text")))

    def score(words):
        return F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))

    s_en, s_de, s_fr = score(STOP_EN), score(STOP_DE), score(STOP_FR)
    best = F.greatest(s_en, s_de, s_fr)
    pred = (
        F.when(best == 0, "unknown")
        .when(s_en == best, "en")
        .when(s_de == best, "de")
        .otherwise("fr")
    )
    return docs.select("doc_id", "lang", pred.alias("pred_lang"),
                       s_en.alias("s_en"), s_de.alias("s_de"), s_fr.alias("s_fr"))


def fingerprint(docs: DataFrame, shingle: int = 3) -> DataFrame:
    """64-bit document fingerprint: min shared-hash over word
    3-gram shingles (a min-hash — the rolling-hash fingerprint family).
    Empty/short docs fall back to hashing the whole text."""
    from .dedup import shingles_of

    # shingles_of binds the tokenizer once per row (the raw
    # shingles_from_tokens(tokens_of(..)) form evaluates it 3x —
    # measured 2.4 s -> ~1 s for q_fingerprint at sf0.1)
    shingles = shingles_of(F.col("text"), shingle)
    mins = F.array_min(F.transform(shingles, lambda s: h64(s)))
    return docs.select(
        "doc_id", F.coalesce(mins, h64(F.col("text"))).alias("fingerprint")
    )
