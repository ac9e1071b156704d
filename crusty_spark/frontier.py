"""The frontier state machine: enqueue / dequeue / finish.

Re-expresses the reference's Redis smart-queue module
(workspace/redis-queue/src/lib.rs:29-197) as DataFrame transforms over
state tables. JOB = domain, TASK = page URL (conf/default.yaml:1-4).

State tables (schemas below; persisted per epoch by crawler.py):
- ``frontier`` — URL tasks, state in {'queued','done'}; replaces the
  ``in-flight-{N}/domains_by_addr_key`` buckets (lib.rs:21-27)
- ``leases``  — (addr_key, domain, lease_epoch, ttl); replaces the
  ``in-processing-{N}/{addr_key}`` SET..EX politeness lock
  (lib.rs:133-141)
- ``job_state`` — per-domain cumulative page count + token bucket;
  realizes TotalPageBudget (rules.rs:67) and the per-domain
  concurrency/delay politeness (conf/default.yaml:199-207)
- ``seen_bloom`` — crusty's ``in-history`` Bloom (lib.rs:187-194),
  see bloom.py

Scheduling semantics (deterministic refinement of SPOP, SURVEY §2.6 O3):
per epoch, at most ONE domain per addr_key is leased (lib.rs:89-99 —
the "max 1 in-flight per /24" politeness core), chosen as
argmin(priority, domain). The argmin is computed as a salted TWO-PHASE
min aggregation instead of a window: a hot addr_key (thousands of
domains on one /24) never lands on a single task, which is the
explicit skew handling the north_rule demands. Both phases are
map-side-combinable hash aggregations — no sort, no window state.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from . import urls as U


@dataclass(frozen=True)
class CrawlConfig:
    """Tunables, defaults mirroring conf/default.yaml of the reference."""

    shard_total: int = 16  # conf: shard_total (default.yaml:38)
    # scoped shards — THE multi-engine seam (conf/default.yaml:35-43,
    # wiring crusty.rs:550-560, scaling story README.md:42-58): enqueue
    # writes tasks into ALL shards 0..shard_total-1, but THIS engine
    # instance dequeues/finishes only shards in [shard_min, shard_max]
    # (shard_max=None means shard_total-1). N instances with disjoint
    # scopes over shared state tables jointly produce exactly the
    # single-engine schedule: addr_key -> shard is a function, so
    # politeness never crosses a scope boundary
    # (tests/test_crawler.py::test_scoped_shards_equal_single_engine).
    # SEMANTIC DIFFERENCE from the reference: shard_max here is
    # INCLUSIVE; the reference's is EXCLUSIVE (default.yaml:40-43:
    # "shard_max: 2 ... effective scoped shards - 0, 1"). A crusty
    # config ported verbatim must subtract 1 from shard_max (the
    # reference's shard_min is inclusive like ours). Inclusive bounds
    # were kept so shard_max=None == shard_total-1 reads naturally and
    # existing configs stay stable; reference_config() documents the
    # translation.
    shard_min: int = 0
    shard_max: int | None = None
    dequeue_limit: int = 10_000  # per-shard domains/epoch (default.yaml:83)
    domain_concurrency: int = 2  # pages per domain per epoch (default.yaml:202)
    lease_ttl_epochs: int = 10  # job hard timeout analog (default.yaml:84-87)
    max_depth: int = 25  # PageLevel (default.yaml:192)
    page_budget: int = 1000  # TotalPageBudget (default.yaml:188)
    links_per_page: int = 100  # LinkPerPageBudget (default.yaml:190)
    seen_capacity: int = 10_000_000  # bloom capacity (default.yaml:71)
    seen_err: float = 0.001  # bloom error (default.yaml:73)
    seen_expansion: int = 2  # bloom expansion (default.yaml:75)
    topk_k: int = 100  # topk.options.k (default.yaml:174)
    topk_decay: float = 0.92  # topk decay (default.yaml:177)
    # decayed-hit state bound (the reference sketch's width-25,000 /
    # k=100 ratio, redis-calc/src/lib.rs:59-66, default.yaml:172-178):
    # domain_hits keeps rank <= k*headroom per tld and drops hits < eps
    topk_headroom: int = 250
    topk_prune_eps: float = 1e-9
    salt_buckets: int = 16  # two-phase argmin fan-out for hot addr_keys
    # topk.collect.second_level_only (default.yaml:180, rules.rs:28-43):
    # linked-domain names collapse to the SLD and self-links compare SLDs
    second_level_only: bool = False
    max_redirect: int = 5  # status_filters::Redirect budget (default.yaml:196)
    # per-domain politeness delay jitter (conf/default.yaml:203-206:
    # delay 1s + delay_jitter 1s). Effective delay = crawl_delay +
    # frac(domain) * delay_jitter with frac = pmod(xxhash64(domain),
    # 1000)/1000 — the reference draws a random jitter; a deterministic
    # hash-derived draw keeps engine/simulator equality exact (same
    # trick as the hard-timeout jitter below). Units: epochs, like
    # crawl_delay_epochs. 0 disables (legacy default);
    # reference_config() carries the reference's 1.0.
    delay_jitter: float = 0.0
    # resolver.addr_ipv6_policy (config.rs:227-231, types.rs:22-40):
    # v4_single (legacy identity) | disabled | preferred | fallback
    addr_ipv6_policy: str = "v4_single"
    # reader.shard_min_last_read analog (conf/default.yaml:100-104:
    # "do not ask the same shard for jobs unless duration has passed
    # since last time"). In the epoch model the epoch IS the read
    # cadence, so this is a multiplier in epochs: with k, shard s is
    # dequeued only at epochs where epoch % k == s % k — each shard is
    # read exactly every k-th epoch and the reads stagger round-robin
    # across shards (smoothing queue-storage load, which is the
    # reference knob's purpose). 1 (the default, == the reference's 1 s
    # at its ~1 s permit cadence) reads every shard every epoch.
    # Deterministic and stateless, so engine/simulator stay exactly
    # equal; enqueue/finish are unaffected (the reference throttles
    # only the reader).
    shard_min_last_read_epochs: int = 1
    # addr_key prefix masks in bits (conf/default.yaml:54-55, applied
    # at types.rs:45-47): /mask of the selected address becomes the
    # politeness bucket. v4 default 24 == the reference's. The v6
    # default here is 64 (key = the full synthetic /64 prefix — the
    # legacy-stable engine format); the reference defaults v6 to 24
    # too, and reference_config() carries that.
    addr_key_v4_mask: int = 24
    addr_key_v6_mask: int = 64
    # resolver net blacklist (conf/default.yaml:246-247, types.rs:57-60):
    # CIDR nets; domains whose synthesized v4 identity falls inside any
    # are dropped at identity time. Empty by default (the reference's
    # reserved-net list is a deployment choice; tests exercise non-empty)
    net_v4_blacklist: tuple[str, ...] = ()
    # job soft/hard timeouts (conf/default.yaml:212-217), in epochs of
    # lease age. Soft: the domain stops being ALLOWED new fetches
    # (allowance -> 0, "drain, don't start"); hard: the job is
    # force-finished even with queued work, after a deterministic
    # per-domain jitter in [0, jitter] epochs (the reference adds a
    # random 60 s so a fleet of stuck jobs doesn't finish in lockstep).
    # None disables. Distinct from lease_ttl_epochs (J4), which models
    # dead-NODE recovery: an expired lease re-exposes the work, a hard
    # timeout retires it.
    job_soft_timeout_epochs: int | None = None
    job_hard_timeout_epochs: int | None = None
    job_hard_timeout_jitter_epochs: int = 0
    # snapshot-load colocation threshold: below this row count the
    # reloaded frontier is used as-is (a single exchange inside the
    # epoch is cheaper than repartition+sort+cache bookkeeping for a
    # small table); at/above it the snapshot is hash-partitioned by
    # domain and cached so every epoch branch runs exchange-free on the
    # big side (on Iceberg the table would be bucketed by domain and
    # the threshold is moot)
    frontier_colocate_min_rows: int = 100_000

    def __post_init__(self):
        # a hard timeout that can't fire before the lease expires (J4)
        # is silently neutralized: the lease lapses first, the domain is
        # re-leased with a fresh lease_epoch and the age resets, so a
        # stuck domain cycles soft-drain/re-lease forever instead of
        # being force-finished. Reject the config instead.
        if self.job_hard_timeout_epochs is not None and (
            self.job_hard_timeout_epochs + self.job_hard_timeout_jitter_epochs
            >= self.lease_ttl_epochs
        ):
            raise ValueError(
                "job_hard_timeout_epochs + job_hard_timeout_jitter_epochs must be "
                f"< lease_ttl_epochs (got {self.job_hard_timeout_epochs}+"
                f"{self.job_hard_timeout_jitter_epochs} >= {self.lease_ttl_epochs}): "
                "the lease would expire and reset the job age before the hard "
                "timeout could ever fire"
            )
        lo, hi = self.shard_scope()
        if not (0 <= lo <= hi < self.shard_total):
            raise ValueError(
                f"shard scope [{lo}, {hi}] must lie within [0, {self.shard_total - 1}]"
            )
        # fail at construction, not first use (the mask helpers raise too)
        U._v4_mask_int(self.addr_key_v4_mask)
        U._v6_mask_int(self.addr_key_v6_mask)

    def shard_scope(self) -> tuple[int, int]:
        """Inclusive [shard_min, shard_max] range this engine instance
        dequeues/finishes (default.yaml:35-43)."""
        hi = self.shard_total - 1 if self.shard_max is None else self.shard_max
        return (self.shard_min, hi)

    def scope_is_full(self) -> bool:
        return self.shard_scope() == (0, self.shard_total - 1)

    def bloom_kwargs(self) -> dict:
        return {
            "capacity": self.seen_capacity,
            "err": self.seen_err,
            "expansion": self.seen_expansion,
        }


def reference_config(**overrides) -> CrawlConfig:
    """A CrawlConfig carrying the REFERENCE's defaults where they differ
    from this engine's legacy-stable ones — for users porting a crusty
    config verbatim:

    - ``addr_ipv6_policy='fallback'`` (conf/default.yaml:270; the
      engine defaults to ``v4_single`` so existing addr_keys — and the
      politeness bucketing derived from them — stay stable for earlier
      adopters)
    - job soft/hard timeouts on (default.yaml:212-217: 180 s soft,
      300 s hard + 60 s jitter, mapped to epochs at the reference's
      ~60 s batch cadence: 3 / 5 / 1)
    - per-domain delay jitter on (default.yaml:203-206: delay_jitter 1s
      == 1.0 in delay units; the engine defaults to 0 so existing token
      rates stay stable)
    - ``addr_key_v6_mask=24`` (default.yaml:55 masks v6 to /24 as
      well; the engine defaults to 64 — the full synthetic /64 prefix —
      so existing v6 addr_keys stay stable)

    Everything else already mirrors conf/default.yaml. NOTE when
    porting scoped shards: this engine's ``shard_max`` is INCLUSIVE
    while the reference's is EXCLUSIVE (default.yaml:40-43) — pass
    ``shard_max = crusty_shard_max - 1``.
    """
    base: dict = dict(
        addr_ipv6_policy="fallback",
        job_soft_timeout_epochs=3,
        job_hard_timeout_epochs=5,
        job_hard_timeout_jitter_epochs=1,
        delay_jitter=1.0,
        addr_key_v6_mask=24,
    )
    base.update(overrides)
    return CrawlConfig(**base)


FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("domain", T.StringType(), False),
        T.StructField("tld", T.StringType(), False),
        T.StructField("addr_key", T.StringType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("state", T.StringType(), False),  # queued | done
        T.StructField("enqueued_epoch", T.IntegerType(), False),
        # robots-disallowed at admission time (task_filters::RobotsTxt,
        # rules.rs:71-73): kept for lineage but never fetched and never
        # counted as pending work.
        T.StructField("blocked", T.BooleanType(), False),
    ]
)

LEASES_SCHEMA = T.StructType(
    [
        T.StructField("addr_key", T.StringType(), False),
        T.StructField("domain", T.StringType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("lease_epoch", T.IntegerType(), False),
        T.StructField("ttl_epochs", T.IntegerType(), False),
    ]
)

JOB_STATE_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("pages_crawled", T.IntegerType(), False),
        T.StructField("tokens", T.DoubleType(), False),
        T.StructField("last_refill_epoch", T.IntegerType(), False),
        T.StructField("finished", T.BooleanType(), False),
    ]
)


def _mark_known_empty(df: DataFrame) -> DataFrame:
    """Tag a constructor-empty DataFrame. PySpark's createDataFrame([],
    schema) is RDD-backed (Scan ExistingRDD), so Catalyst's
    PropagateEmptyRelation cannot prove it empty statically and plans
    full SortMergeJoins (with big-side sorts and an empty-side
    exchange) against it; operators that receive a tagged frame skip
    those algebraic no-ops themselves (anti-join vs empty = identity,
    union vs empty = identity). Only these constructors set the tag, so
    the skip is always sound."""
    df._crusty_known_empty = True
    return df


def known_empty(df: DataFrame) -> bool:
    return bool(getattr(df, "_crusty_known_empty", False))


# Constant-empty frames are memoized per live session: createDataFrame
# is ~20 ms of py4j + RDD bookkeeping, and an epoch-driver calls these
# every epoch — pure driver floor that scales with nothing (guide
# §1.2 step 2: per-task — here per-epoch — constant work). A PLAN is
# cached, never data: the frame is immutable and empty by construction.
import weakref

_EMPTY_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _empty_cached(spark: SparkSession, name: str, schema: T.StructType) -> DataFrame:
    per = _EMPTY_CACHE.setdefault(spark, {})
    df = per.get(name)
    if df is None:
        df = _mark_known_empty(spark.createDataFrame([], schema))
        per[name] = df
    return df


def empty_frontier(spark: SparkSession) -> DataFrame:
    return _empty_cached(spark, "frontier", FRONTIER_SCHEMA)


def empty_leases(spark: SparkSession) -> DataFrame:
    return _empty_cached(spark, "leases", LEASES_SCHEMA)


def empty_job_state(spark: SparkSession) -> DataFrame:
    return _empty_cached(spark, "job_state", JOB_STATE_SCHEMA)


# ---------------------------------------------------------------------
# Enqueue
# ---------------------------------------------------------------------


def identity_for_urls(urls: DataFrame, cfg: CrawlConfig, depth_col=None) -> DataFrame:
    """url[, depth] -> full frontier identity, dropping host-less URLs
    (reference skips them at crusty.rs:498-507) and domains the address
    policy resolves to nothing (types.rs:57-60)."""
    df = U.with_frontier_identity(
        urls,
        shard_total=cfg.shard_total,
        addr_policy=cfg.addr_ipv6_policy,
        v4_mask=cfg.addr_key_v4_mask,
        v6_mask=cfg.addr_key_v6_mask,
    )
    df = df.filter(F.col("domain").isNotNull() & F.col("addr_key").isNotNull())
    if cfg.net_v4_blacklist:
        # resolver net blacklist (default.yaml:246-247): drop domains
        # whose synthesized v4 identity falls in a blacklisted net
        df = df.filter(~U.ip_blacklisted_col(F.col("domain"), cfg.net_v4_blacklist))
    depth = F.col("depth") if depth_col else F.lit(0)
    return df.select(
        "url", "url_hash", "domain", "tld", "addr_key", "shard", depth.cast("int").alias("depth")
    )


def enqueue_tasks(
    frontier: DataFrame, candidates: DataFrame, epoch: int
) -> DataFrame:
    """Insert-if-absent of task rows on (domain, url_hash) — the per-job
    URL dedup (task_filters::HashSetDedup, rules.rs:59-60,74) plus the
    enqueue idempotence of lib.rs:29-107. Returns the new frontier.

    Within-batch duplicates reduce to the MIN-DEPTH candidate (tie-break
    by the remaining struct fields, which are functions of the key): a
    deterministic rule shared with simulator.CrawlSimulator._enqueue_min
    — dropDuplicates would keep an arbitrary row and depth drives both
    dequeue argmin and fetch ordering."""
    blocked = F.col("blocked") if "blocked" in candidates.columns else F.lit(False)
    best = F.min(
        F.struct(
            F.col("depth").alias("depth"), F.col("url").alias("url"),
            F.col("tld").alias("tld"), F.col("addr_key").alias("addr_key"),
            F.col("shard").alias("shard"), blocked.alias("blocked"),
        )
    ).alias("c")
    fresh = (
        candidates.groupBy("domain", "url_hash")
        .agg(best)
        .join(
            frontier.select("domain", "url_hash"), ["domain", "url_hash"], "left_anti"
        )
        .select(
            F.col("c.url").alias("url"), "url_hash", "domain",
            F.col("c.tld").alias("tld"), F.col("c.addr_key").alias("addr_key"),
            F.col("c.shard").alias("shard"), F.col("c.depth").alias("depth"),
            F.lit("queued").alias("state"),
            F.lit(epoch).cast("int").alias("enqueued_epoch"),
            F.col("c.blocked").alias("blocked"),
        )
    )
    return frontier.unionByName(fresh)


# ---------------------------------------------------------------------
# Dequeue: salted two-phase argmin, one domain per addr_key
# ---------------------------------------------------------------------


def dequeue(
    frontier: DataFrame,
    leases: DataFrame,
    job_state: DataFrame,
    epoch: int,
    cfg: CrawlConfig,
) -> DataFrame:
    """-> new lease rows (LEASES_SCHEMA) for this epoch.

    Pipeline (each step cites the reference semantics it reproduces):
    1. candidate domains = queued tasks' domains minus finished jobs
    2. J3: drop addr_keys that already hold a lease (lib.rs:89-99)
    3. J2: drop domains already leased (lib.rs:50-63)
    4. per-addr_key argmin(min_depth, domain) via salted two-phase agg
       (SPOP replacement, deterministic — SURVEY §2.6 O3)
    5. O2: per-shard dequeue_limit (lib.rs:112-118)
    """
    # NOTE on style: the hot-path builders below use parsed SQL strings
    # (filter("..."), selectExpr, F.expr) instead of Column algebra —
    # each Column operator is one py4j round trip and an epoch driver
    # rebuilds this plan every epoch; one parsed string is one round
    # trip for the whole expression (measured: ~0.5 s/epoch of pure
    # driver time at any core count — a non-scaling floor, guide §1.2).
    # The parsed plans are identical to the Column forms.
    leases_empty = known_empty(leases)
    job_state_empty = known_empty(job_state)
    live_leases = leases.filter(f"lease_epoch + ttl_epochs > {int(epoch)}")
    queued = frontier.filter("state = 'queued' AND NOT blocked")
    if not cfg.scope_is_full():
        # scoped shards (default.yaml:35-43, crusty.rs:550-560): this
        # engine instance only schedules its shard range; on a
        # shard-partitioned snapshot the predicate prunes at file level
        lo, hi = cfg.shard_scope()
        queued = queued.filter(F.col("shard").between(F.lit(lo), F.lit(hi)))
    if cfg.shard_min_last_read_epochs > 1:
        # reader.shard_min_last_read (default.yaml:100-104): shard s is
        # read only every k-th epoch, staggered round-robin; a pure
        # function of (epoch, shard), so it prunes partitions on a
        # shard-partitioned snapshot just like the scope filter
        k = F.lit(cfg.shard_min_last_read_epochs)
        queued = queued.filter(F.pmod(F.lit(epoch), k) == F.pmod(F.col("shard"), k))
    # domain-level candidates. When the frontier table is partitioned by
    # domain (the engine keeps it that way — see Crawler/bench), this
    # aggregation needs NO exchange: hash-partitioning on `domain` is a
    # subset of the grouping keys.
    domains = queued.groupBy("shard", "addr_key", "domain").agg(
        F.expr("min(depth) AS min_depth")
    )
    # J2 + finished in ONE domain-keyed anti-join (big side stays on the
    # frontier's domain partitioning — only the small exclusion list
    # shuffles). J3 (addr_key holds a live lease) is applied AFTER the
    # per-addr_key argmin below, on one row per addr_key, where it is
    # exchange-free — excluding an addr_key before or after picking its
    # best domain is the same set. Constructor-empty exclusion sides
    # skip the join entirely (see _mark_known_empty): PySpark empty
    # frames are RDD-backed, so the optimizer would otherwise plan a
    # SortMergeJoin with a big-side sort against a provably-empty list.
    excl_parts = []
    if not job_state_empty:
        excl_parts.append(job_state.filter(F.col("finished")).select("domain"))
    if not leases_empty:
        excl_parts.append(live_leases.select("domain"))
    if excl_parts:
        excl_domains = excl_parts[0]
        for p in excl_parts[1:]:
            excl_domains = excl_domains.unionByName(p)
        domains = domains.join(excl_domains, "domain", "left_anti")

    # salted two-phase argmin over (min_depth, domain) per addr_key:
    # phase 1 reduces each (addr_key, salt) bucket to one candidate,
    # phase 2 reduces the <=salt_buckets survivors. Hot /24s with many
    # domains therefore never serialize into a single task. The single
    # explicit repartition — keyed on SHARD, which is a pure function
    # of addr_key (crc32 % shard_total), so it clusters addr_keys too —
    # is the ONLY exchange in the whole dequeue: phase 1 and phase 2
    # group by (shard, addr_key, ...) supersets of the partition key,
    # the J3 anti-join co-keys on (shard, addr_key) (every lease row's
    # shard is engine-derived from its addr_key, so adding the shard
    # equality is a no-op), and the final per-shard ranking window
    # reuses the same hashpartitioning(shard) — previously the window
    # re-exchanged by shard after an addr_key-keyed argmin (2 big
    # exchanges per dequeue instead of 1; guide §2.4: two operations
    # keyed the same way share one exchange). shard also spreads MORE
    # evenly than addr_key (shards are uniform by construction; a hot
    # /24 skews an addr_key partition), and shard, being a group key,
    # no longer rides the argmin struct.
    phase1 = (
        domains.selectExpr(
            "*", f"pmod(xxhash64(domain), {int(cfg.salt_buckets)}) AS salt"
        )
        .repartition("shard")
        .groupBy("shard", "addr_key", "salt")
        .agg(F.expr("min(struct(min_depth AS p, domain AS domain)) AS cand"))
    )
    picked = (
        phase1.groupBy("shard", "addr_key")
        .agg(F.expr("min(cand) AS cand"))
        .selectExpr("shard", "addr_key", "cand.domain AS domain", "cand.p AS min_depth")
    )
    if not leases_empty:
        picked = picked.join(
            live_leases.select("shard", "addr_key"), ["shard", "addr_key"], "left_anti"
        )

    # per-shard limit (deterministic rank by (min_depth, domain));
    # shard count is fixed and balanced so this window doesn't skew
    ranked = picked.selectExpr(
        "*",
        "row_number() OVER (PARTITION BY shard ORDER BY min_depth, domain) AS rk",
    ).filter(f"rk <= {int(cfg.dequeue_limit)}")

    return ranked.selectExpr(
        "addr_key",
        "domain",
        "shard",
        f"cast({int(epoch)} AS int) AS lease_epoch",
        f"cast({int(cfg.lease_ttl_epochs)} AS int) AS ttl_epochs",
    )


# ---------------------------------------------------------------------
# Politeness token bucket + fetch-task selection
# ---------------------------------------------------------------------

def allowance(
    job_state: DataFrame,
    leased: DataFrame,
    robots: DataFrame,
    epoch: int,
    cfg: CrawlConfig,
) -> DataFrame:
    """Token-bucket update for leased domains, as pure JVM column
    expressions (whole-stage codegen — no Python on the scheduler hot
    path; the earlier applyInPandas version grouped by shard, capping
    parallelism at shard_total and forcing each shard's leased set
    through one pandas frame, for arithmetic that is row-independent).

    rate = concurrency / (1 + crawl_delay + jitter(domain)) tokens per
    epoch with jitter = pmod(xxhash64(domain), 1000)/1000 *
    delay_jitter (default.yaml:203-206 — the reference draws a random
    jitter per request; a deterministic per-domain draw keeps
    engine/simulator equality exact); cap = concurrency; allowed pages
    this epoch = floor(available tokens), also capped by the remaining
    page budget (F6) and zeroed once the lease age reaches
    job_soft_timeout_epochs (the reference's soft-timeout "stop
    queueing new tasks, let in-flight drain" phase,
    default.yaml:212-214). Returns updated job_state rows + 'allowed'
    for this epoch's leased domains only. Every double op mirrors
    simulator.SimCrawler.run_epoch bit-for-bit (same order, same
    IEEE-754 rounding).
    """
    base = (
        leased.select("domain", "shard", "lease_epoch")
        .join(job_state, ["domain", "shard"], "left")
        .join(robots.select("domain", "crawl_delay_epochs"), "domain", "left")
        .select(
            "domain",
            "shard",
            "lease_epoch",
            F.coalesce("pages_crawled", F.lit(0)).alias("pages_crawled"),
            F.coalesce("tokens", F.lit(float(cfg.domain_concurrency))).alias("tokens"),
            F.coalesce("last_refill_epoch", F.lit(epoch)).alias("last_refill_epoch"),
            F.coalesce("finished", F.lit(False)).alias("finished"),
            F.coalesce("crawl_delay_epochs", F.lit(0)).alias("delay"),
        )
    )

    cap = float(cfg.domain_concurrency)
    jitter = (
        F.pmod(F.xxhash64("domain"), F.lit(1000)).cast("double") / F.lit(1000.0)
    ) * F.lit(float(cfg.delay_jitter))
    eff_delay = F.col("delay").cast("double") + jitter
    rate = F.lit(cap) / (F.lit(1.0) + eff_delay)
    dt = F.greatest(F.lit(epoch) - F.col("last_refill_epoch"), F.lit(0)).cast("double")
    tokens = F.least(F.col("tokens") + rate * dt, F.lit(cap))
    remaining = F.greatest(F.lit(cfg.page_budget) - F.col("pages_crawled"), F.lit(0))
    allowed = F.least(F.floor(tokens), remaining.cast("long"))
    if cfg.job_soft_timeout_epochs is not None:
        allowed = F.when(
            F.lit(epoch) - F.col("lease_epoch") >= F.lit(cfg.job_soft_timeout_epochs),
            F.lit(0).cast("long"),
        ).otherwise(allowed)
    return base.select(
        "domain",
        "shard",
        "pages_crawled",
        tokens.alias("tokens"),
        F.lit(epoch).cast("int").alias("last_refill_epoch"),
        "finished",
        allowed.cast("int").alias("allowed"),
    )


def select_fetch_tasks(
    frontier: DataFrame, allow: DataFrame, cfg: CrawlConfig
) -> DataFrame:
    """Pick the next `allowed` queued URLs per leased domain, ordered by
    (depth, url_hash) — deterministic tie-break (SURVEY §2.6 O3).

    Plan shape on a domain-partitioned frontier: the allow side is
    shuffle-hash-joined (per-partition hash build — parallel, unlike a
    driver-side broadcast build of 100k+ leased domains), the big side
    moves nowhere, and the literal `rn <= domain_concurrency` bound lets
    Spark plan a WindowGroupLimit: each partition keeps at most
    `concurrency` rows per domain DURING the sort instead of fully
    sorting every queued URL."""
    cands = frontier.filter("state = 'queued' AND NOT blocked").join(
        allow.filter("allowed > 0").select("domain", "allowed").hint("shuffle_hash"),
        "domain",
    )
    return (
        cands.selectExpr(
            "*",
            "row_number() OVER (PARTITION BY domain ORDER BY depth, url_hash) AS rn",
        )
        .filter(f"rn <= {int(cfg.domain_concurrency)} AND rn <= allowed")
        .drop("rn", "allowed")
    )


# ---------------------------------------------------------------------
# Finish
# ---------------------------------------------------------------------


def finish_domains(
    frontier: DataFrame,
    leases: DataFrame,
    job_state_updated: DataFrame,
    epoch: int,
    cfg: CrawlConfig,
) -> DataFrame:
    """Domains whose lease should be released because the job is done:
    no queued URLs remain, the page budget is exhausted
    (lib.rs:153-197 finish + TotalPageBudget), or the lease age passed
    the hard job timeout + per-domain jitter (default.yaml:215-217 —
    the force-kill for jobs the soft timeout couldn't drain; jitter is
    hash-derived so a fleet of stuck jobs doesn't retire in lockstep).
    Returns (domain, shard, pages_crawled, term_by, duration_epochs)
    rows; the caller releases leases, marks job_state finished, and
    commits the domain to the seen Bloom (J6).

    ``term_by`` is WHY the job ended — the reference's metrics_job
    attribution (infra/clickhouse/init.sql:55-63, row mapper
    workspace/main/src/types.rs:330-361, where timeouts label the row
    and every normal completion is "Ok"). Here the two normal paths
    are named for the dashboard: ``drained`` (no queued URLs remain —
    the job completed its work), ``page_budget`` (TotalPageBudget cap
    hit with work still queued), ``hard_timeout`` (neither — only the
    timeout disjunct fired). Precedence drained > page_budget mirrors
    the reference's Ok-before-error mapping; hard_timeout by
    construction labels only force-kills. ``duration_epochs`` is the
    lease age at finish — the epoch-cadence analog of the reference's
    ``duration_sec`` (elapsed since queued, types.rs:357)."""
    queued_counts = (
        frontier.filter((F.col("state") == "queued") & ~F.col("blocked"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_queued"))
    )
    leased = leases.select("domain", "shard", "lease_epoch").join(
        job_state_updated.select("domain", "pages_crawled"), "domain", "left"
    )
    is_done = (F.col("n_queued") == 0) | (
        F.coalesce("pages_crawled", F.lit(0)) >= cfg.page_budget
    )
    hard = cfg.job_hard_timeout_epochs
    if hard is not None:
        jitter = F.pmod(
            F.xxhash64("domain"), F.lit(cfg.job_hard_timeout_jitter_epochs + 1)
        )
        is_done = is_done | (F.lit(epoch) - F.col("lease_epoch") >= F.lit(hard) + jitter)
    done = (
        leased.join(queued_counts, "domain", "left")
        .withColumn("n_queued", F.coalesce("n_queued", F.lit(0)))
        .filter(is_done)
    )
    term_by = (
        F.when(F.col("n_queued") == 0, F.lit("drained"))
        .when(
            F.coalesce("pages_crawled", F.lit(0)) >= cfg.page_budget,
            F.lit("page_budget"),
        )
        .otherwise(F.lit("hard_timeout"))
    )
    return done.select(
        "domain",
        "shard",
        F.coalesce("pages_crawled", F.lit(0)).alias("pages_crawled"),
        term_by.alias("term_by"),
        (F.lit(epoch) - F.col("lease_epoch")).cast("int").alias("duration_epochs"),
    )
