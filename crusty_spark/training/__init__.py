"""Training-data pipeline operators over the documents/embeddings tables.

These extend the crawl engine with the operations a 100 TB
training-data pipeline needs downstream of the crawler: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding near-dup),
approximate similarity search, and text analysis (language id, quality
scoring, token counting, fingerprinting).

Every operator is expressed with JVM-side built-ins (no Python UDFs in
the hot path) and has an ANSI-SQL twin runnable by DuckDB for the
driver's correctness gate; the shared cross-engine 64-bit hash is
``conv(substr(md5(x),1,15),16,10)`` — identical in Spark and DuckDB.
"""

from . import curation, dedup, similarity, text  # noqa: F401
