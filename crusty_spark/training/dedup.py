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


def banded_candidate_pairs(
    bands: DataFrame,
    key_cols: list[str],
    member_col: str,
    id_field: str,
    max_bucket: int | None,
) -> DataFrame:
    """Within-bucket candidate pairs for ANY banded blocking scheme
    (MinHash bands, pHash chunks, sign-LSH buckets) — the shared
    skeleton of the three near-dup detectors.

    ``bands`` has ``key_cols`` (the bucket key) plus ``member_col``, a
    struct whose ``id_field`` orders members. Returns (a, b) struct
    pairs with a.id < b.id; a pair appears once per shared bucket, so
    callers with multi-band schemes dedup downstream.

    Two scale properties, in order:

    1. **Bucket cap** (the skew guard): bucket sizes are counted first
       (one map-side-combinable aggregation — a bounded buffer, unlike
       a collect_list of the raw bucket), and buckets over
       ``max_bucket`` are thinned to ~max_bucket deterministic
       representatives by hash-sampling ids — no sort or window. A
       degenerate key (N identical docs / flat images / correlated
       sign buckets) costs O(max_bucket^2), never O(N^2); the capped
       bucket still surfaces its duplicate cluster through the kept
       representatives.
    2. **No bucket self-join**: after the cap, each bucket's members
       collect into ONE array (bounded by the cap) and pairs stream
       out of a nested explode — replacing the sort-merge self-join +
       its second shuffle of the band table. When the caller hands in
       a bands table already hash-partitioned on ``key_cols`` (e.g.
       repartition before persist), the size count, the thinning join
       and the collect all reuse that single exchange.
    """
    m = F.col(member_col)
    if max_bucket is not None:
        sizes = bands.groupBy(*key_cols).agg(F.count("*").alias("n_in_bucket"))
        keep_every = F.ceil(F.col("n_in_bucket") / F.lit(max_bucket)).cast("long")
        bands = (
            bands.join(sizes, list(key_cols))
            .filter(
                (F.col("n_in_bucket") <= max_bucket)
                | (F.pmod(F.xxhash64(m[id_field].cast("string")), keep_every) == 0)
            )
            .drop("n_in_bucket")
        )
    grouped = bands.groupBy(*key_cols).agg(F.collect_list(member_col).alias("ms"))
    return (
        grouped.filter(F.size("ms") >= 2)
        .select(F.explode("ms").alias("a"), F.col("ms").alias("ms"))
        .select("a", F.explode("ms").alias("b"))
        .filter(F.col("a")[id_field] < F.col("b")[id_field])
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical (normalized) texts: representative =
    min(doc_id), plus group size. Hash-agg, map-side combinable."""
    return (
        docs.select("doc_id", h64(norm_text(F.col("text"))).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count("*").alias("n_dups"))
    )


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles.

    Built with chained zip_with over shifted slices rather than
    transform(sequence(...), i -> slice(toks, i, k)): a lambda that
    *captures* the token expression re-evaluates it once per shingle
    index (CollapseProject re-inlines any withColumn barrier too) —
    measured 10x slowdown at sf0.1 (the regex tokenizer ran 260k times
    instead of 5k). zip_with arguments are evaluated once per row.

    CALLER TRAP: ``toks`` itself still appears THREE times below (the
    base and two shifted slices). If you pass an EXPRESSION (e.g.
    ``tokens_of(text)``) it is evaluated 3x per row — and a withColumn
    barrier does not help, CollapseProject inlines it back (measured:
    the regex tokenizer tripled minhash/fingerprint cost at sf0.1,
    3.5 s -> 0.9 s when bound once). Pass a lambda VARIABLE (see
    ``shingles_of``, which binds via a single-element transform — HOF
    lambda arguments are evaluated once) or a genuinely materialized
    column."""
    if k != 3:  # general k: chain k-1 zips; only k=3 is used here
        raise NotImplementedError("shingles_from_tokens supports k=3")
    n = F.size(toks)
    shifted1 = F.slice(toks, 2, F.greatest(n, F.lit(1)))
    pairs = F.zip_with(toks, shifted1, lambda a, b: F.concat(a, F.lit(" "), b))
    shifted2 = F.slice(toks, 3, F.greatest(n, F.lit(1)))
    triples = F.zip_with(pairs, shifted2, lambda p, c: F.concat(p, F.lit(" "), c))
    full = F.filter(triples, lambda x: x.isNotNull())  # zip_with null-pads the tail
    # short docs (n < k): one truncated shingle, matching the oracle's
    # toks[i:least(i+2, len)] behaviour
    sh = F.when(F.size(full) > 0, full).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_distinct(sh)


def shingles_of(text: Column, k: int = 3) -> Column:
    """Shingles straight from text, tokenizer evaluated ONCE per row:
    the token array is bound through a single-element ``transform``
    whose lambda variable (unlike a projected column, which
    CollapseProject inlines back into every reference) is evaluated
    once — measured 3.5 s -> 0.9 s for the sf0.1 shingle explode."""
    return F.transform(
        F.array(tokens_of(text)), lambda toks: shingles_from_tokens(toks, k)
    )[0]


def _with_shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """doc_id + materialized shingle set, tokenizer evaluated once/row."""
    return docs.select("doc_id", shingles_of(F.col("text"), k).alias("sh"))


def _doc_shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    return _with_shingles(docs, k).select("doc_id", F.explode("sh").alias("shingle"))


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


def minhash_signatures(
    docs: DataFrame, n_hashes: int = 8, k: int = 3, shingle_sets: DataFrame | None = None
) -> DataFrame:
    """MinHash: signature_i = min over shingles of h64(shingle || ':' || i).

    Computed as ``array_min(transform(sh, ...))`` over the per-doc
    shingle array — row-local higher-order functions, so the previous
    explode + groupBy EXCHANGE of every (doc, shingle, 8 hashes) row is
    gone entirely (guide §2.4: remove shuffles outright); the min over
    the same distinct-shingle set is the same value. ``shingle_sets``
    lets a caller that already materialized ``_with_shingles`` reuse it
    (the tokenizer + shingle build is the dominant per-row cost)."""
    sh = _with_shingles(docs, k) if shingle_sets is None else shingle_sets
    cols = [
        F.array_min(
            F.transform(
                F.col("sh"), lambda s, i=i: h64(F.concat_ws(":", s, F.lit(str(i))))
            )
        ).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return sh.select("doc_id", *cols)


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.5,
    k: int = 3,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Banded LSH over MinHash signatures: candidates share a band key;
    candidates are then verified with exact Jaccard. Returns
    (doc_a, doc_b, jaccard) — the scale-path near-dup detector.

    ``max_bucket`` bounds the candidate blow-up of degenerate band keys
    (e.g. millions of near-empty docs landing in one bucket would make
    pair generation quadratic) — see banded_candidate_pairs, the shared
    cap + pair skeleton of all three near-dup detectors."""
    # ONE tokenizer+shingle pass feeds both the signatures and the
    # verify stage (it was computed twice — guide §1.2: don't compute
    # things twice before tuning anything else)
    sets = _with_shingles(docs, k).persist()
    sig = minhash_signatures(docs, n_hashes, k, shingle_sets=sets)
    n_bands = n_hashes // band_size
    # one projection + explode, NOT a per-band union: a union would
    # recompute the whole shingle->signature aggregation once per band
    # (measured 56s -> ~8s at sf0.1)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            h64(
                F.concat_ws(
                    "_",
                    *[F.col(f"mh{b * band_size + j}").cast("string") for j in range(band_size)],
                )
            ).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    bands = (
        sig.select("doc_id", F.explode(F.array(*band_structs)).alias("bk"))
        .select(
            F.struct(F.col("doc_id").alias("doc_id")).alias("m"),
            F.col("bk.band").alias("band"),
            F.col("bk.band_key").alias("band_key"),
        )
        # ONE explicit exchange on the bucket key, persisted: the size
        # count, the cap's thinning join and the member collect in
        # banded_candidate_pairs all reuse this partitioning — and the
        # shingle->signature aggregation runs once (tiny: n_docs x
        # n_bands rows)
        .repartition("band", "band_key")
        .persist()
    )
    cand = (
        banded_candidate_pairs(bands, ["band", "band_key"], "m", "doc_id", max_bucket)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # verify ONLY the candidates: jaccard from per-doc shingle sets via
    # array_intersect — the all-pairs shingle self-join would dominate
    # the whole pipeline (measured 84s vs <10s at sf0.1) and defeats the
    # point of LSH blocking
    sets_a = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sets_b = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    out = (
        cand.join(sets_a, "doc_a")
        .join(sets_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                n_inter / (F.size("sh_a") + F.size("sh_b") - n_inter), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    # materialize the (small) verified-pair result, then drop the cached
    # intermediates — a long-running pipeline calling this repeatedly
    # must not accumulate persisted bands/shingle sets
    out = out.localCheckpoint(eager=True)
    bands.unpersist()
    sets.unpersist()
    return out


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over near-duplicate pairs -> (doc_id,
    cluster_id), cluster_id = the component's min doc_id (the canonical
    representative). This is the transitive closure the pair list
    alone doesn't give: A~B and B~C puts A,B,C in ONE cluster even
    when (A,C) never surfaced as a candidate pair — the "keep one per
    group" step of a dedup pipeline.

    Algorithm: iterative min-label propagation (the Pregel/GraphX
    connected-components recipe as plain DataFrame ops): every round
    each node adopts the min label among itself and its neighbors;
    converges in O(component diameter) rounds — near-dup components
    are dense (clusters of mutually-similar docs), so the diameter is
    tiny in practice. Each round is one hash-partitioned join + one
    map-side-combinable min-aggregation over (nodes + edges) rows; the
    per-round localCheckpoint truncates the otherwise-exponential
    iterative lineage, and the driver-side convergence count is the
    standard fixpoint check every iterative DataFrame algorithm needs
    (one tiny action per round, not a collect of the data).

    ``max_iter`` must be >= 1, and convergence is only ACCEPTED on a
    round that observes zero label changes — so max_iter must exceed
    the widest component's diameter by one confirming round, or the
    call raises even though the last propagation round happened to
    land the final labels."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint()
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["dst"] == labels["id"])
            .select(F.col("src").alias("id"), F.col("label").alias("label"))
        )
        new_labels = (
            labels.unionByName(nbr).groupBy("id").agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # min-label propagation advances one hop per round: a component
        # whose diameter exceeds max_iter would exit here with SPLIT
        # clusters and no signal. Fail loudly instead — callers with
        # genuinely long similarity chains should raise max_iter.
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iter} rounds "
            f"({changed} labels still changing): a similarity-chain "
            "component is wider than max_iter hops; raise max_iter"
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash: bit j of the signature is the sign of the vote
    sum_tokens(+1 if bit j of h64(token) else -1).

    The `bits` vote lanes are UNROLLED as aggregate columns of one
    groupBy(doc) instead of the previous explode(bitpos) cross: the
    exchange carries n_tokens rows once, not `bits` times — and the
    map-side partial aggregation collapses that to ~one row per doc
    before the shuffle — and the second (doc-level) aggregation becomes
    a plain projection (guide §2.3 aggregate-before-shuffle / §2.4
    remove shuffles: 2 Exchanges -> 1, 16x less pre-combine data).
    Integer vote sums are order-independent, so signatures are
    identical; docs with zero tokens stay absent (explode semantics,
    unchanged)."""
    tok = docs.select("doc_id", F.explode(tokens_of(F.col("text"))).alias("tok"))
    tok = tok.withColumn("th", h64(F.col("tok")))
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(bits)
        ]
    )
    sig = F.lit(0).cast("bigint")
    for j in range(bits):
        sig = sig + F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return votes.select("doc_id", sig.alias("simhash"))


def phash_near_dup(
    df: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 3,
    n_bands: int = 4,
    max_bucket: int | None = 4_000,
) -> DataFrame:
    """Image near-duplicates via banded 64-bit perceptual hash: split the
    phash into `n_bands` chunks; candidate pairs share at least one
    chunk; verify popcount(a XOR b) <= max_hamming. Pigeonhole: any pair
    with hamming < n_bands is GUARANTEED to share a band, so recall is 1
    for max_hamming <= n_bands - 1 (the default 3/4 is the classic
    64-bit near-dup setting). Returns (id_a, id_b, hamming), id_a < id_b.

    Plan shape at 10^10 images: one band projection (no shuffle), then
    the shared banded_candidate_pairs skeleton — bucket-capped (a
    degenerate chunk key, e.g. flat images sharing a 16-bit band, costs
    O(max_bucket^2) not O(N^2)) and join-free — then an O(candidates)
    bit_count verify. Completes the multimodal dedup story next to the
    stored phash column (BASELINE.json input_hint)."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.expr(f"shiftrightunsigned({phash_col}, {b * width}) & {mask}").alias("key"),
        )
        for b in range(n_bands)
    ]
    bands = df.select(
        F.col(id_col).alias("id"),
        F.col(phash_col).alias("ph"),
        F.explode(F.array(*band_structs)).alias("bk"),
    ).select(
        F.struct(F.col("id").alias("id"), F.col("ph").alias("ph")).alias("m"),
        F.col("bk.band").alias("band"),
        F.col("bk.key").alias("key"),
    )
    cand = (
        banded_candidate_pairs(bands, ["band", "key"], "m", "id", max_bucket)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("a.ph").alias("ph_a"),
            F.col("b.id").alias("id_b"),
            F.col("b.ph").alias("ph_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.expr("ph_a ^ ph_b")).cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_near_dup(
    emb: DataFrame,
    threshold: float = 0.95,
    sign_bits: int = 16,
    max_bucket: int | None = 2_000,
) -> DataFrame:
    """Near-duplicate vectors: sign-LSH blocking (signature = signs of
    the first `sign_bits` dims) then exact cosine verify inside blocks.
    Returns (vec_a, vec_b, cos) with vec_a < vec_b, cos >= threshold.

    Real embeddings are CORRELATED, so sign buckets are very
    non-uniform — the shared banded_candidate_pairs cap bounds a hot
    bucket at O(max_bucket^2) instead of quadratic. One bucket key per
    vector (unlike multi-band MinHash), so pairs need no downstream
    dedup. Memory note: one grouped bucket holds <= ~max_bucket
    (vec_id, embedding) structs — this caller's default is tighter
    than MinHash's (2,000 vs 10,000) because members carry the full
    vector: ~8 MB per degenerate bucket at dim-512 float64 instead of
    ~40 MB; lower it further for wider vectors."""
    from .similarity import sign_bucket

    e0 = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
    )
    bands = e0.select(
        F.struct(F.col("vec_id").alias("vec_id"), F.col("embedding").alias("v")).alias("m"),
        sign_bucket(F.col("embedding"), sign_bits).alias("sig"),
    )
    pairs = banded_candidate_pairs(bands, ["sig"], "m", "vec_id", max_bucket)
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(f"{side}.v"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(dot / (norm("a") * norm("b")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
