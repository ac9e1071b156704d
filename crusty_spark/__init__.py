"""crusty_spark — a from-scratch PySpark-native broad-crawl frontier engine.

Reproduces the query/data-processing semantics of the reference crawler
let4be/crusty (see SURVEY.md for the file:line map) as an idiomatic
Spark DataFrame program:

- a domain-sharded URL frontier over snapshot-versioned tables of
  (image, caption) pairs (``crusty_spark.frontier``, ``crusty_spark.crawler``)
- URL canonicalization + 64-bit hashing (``crusty_spark.urls``,
  ``crusty_spark.hashing``)
- a partitioned Bloom URL/domain-seen set built/probed in vectorized
  numpy inside ``applyInPandas`` (``crusty_spark.bloom``)
- per-addr_key politeness (1 in-flight domain per /24, token bucket)
  realized as window-free salted two-phase argmin selection
  (``crusty_spark.frontier``)
- robots gating, budgets, depth limits, nofollow/same-domain filters
  (``crusty_spark.fetch``)
- decayed per-TLD top-k heavy hitters (``crusty_spark.topk``)
- training-data pipeline operators: dedup (exact/minhash/simhash/
  jaccard), ANN similarity, text quality (``crusty_spark.training``)

Everything is DataFrame-first; the only Python-side compute is
Arrow-batched pandas UDFs (never per-row Python).
"""

__version__ = "0.1.0"
