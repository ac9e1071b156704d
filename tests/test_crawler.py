from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crusty_spark import metrics as M
from crusty_spark.crawler import Crawler
from crusty_spark.fixtures import images_df, seed_urls
from crusty_spark.frontier import CrawlConfig
from crusty_spark.simulator import SimCrawler

N_IMAGES = 64
CFG = CrawlConfig(
    shard_total=4,
    dequeue_limit=100,
    domain_concurrency=2,
    lease_ttl_epochs=10,
    max_depth=5,
    page_budget=6,
    seen_capacity=5000,
    seen_err=1e-6,  # so bloom FPs can't perturb the equality check
    salt_buckets=4,
)
SEEDS = seed_urls(12)
EPOCHS = 4


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    images = images_df(spark, N_IMAGES).cache()
    c = Crawler(spark, images, N_IMAGES, ckpt, cfg=CFG)
    c.init_empty()
    c.seed(SEEDS)
    stats = c.run(EPOCHS, stop_when_idle=False)
    return c, stats, ckpt, images


@pytest.fixture(scope="module")
def sim():
    s = SimCrawler(N_IMAGES, cfg=CFG)
    s.seed(SEEDS)
    stats = s.run(EPOCHS)
    return s, stats


def test_epoch_stats_match_simulator(crawl, sim):
    _, stats, _, _ = crawl
    s, sim_stats = sim
    for got, want in zip(stats, sim_stats):
        assert got.epoch == want["epoch"]
        assert got.dequeued == want["dequeued"], f"epoch {got.epoch} dequeued"
        assert got.fetched == want["fetched"], f"epoch {got.epoch} fetched"
        assert got.discovered_domains == want["discovered"], f"epoch {got.epoch} discovered"
        assert got.finished == want["finished"], f"epoch {got.epoch} finished"
        assert got.queued_after == want["queued_after"], f"epoch {got.epoch} queued"


def test_fetched_urls_match_simulator(crawl, sim):
    c, _, _, _ = crawl
    s, _ = sim
    engine_urls = {r.url for r in c.fetched_urls().collect()}
    sim_urls = set().union(*s.fetched_log) if s.fetched_log else set()
    assert engine_urls == sim_urls


def test_seen_membership_matches_simulator(crawl, sim):
    c, _, _, _ = crawl
    s, _ = sim
    engine_seen = {r.domain for r in c.seen_domains_exact().collect()}
    assert engine_seen == s.seen


def test_politeness_invariant(crawl):
    """Never two in-flight domains sharing an addr_key (lib.rs:89-99)."""
    c, _, ckpt, _ = crawl
    import glob
    import os

    for d in sorted(glob.glob(os.path.join(ckpt, "epoch=*"))):
        leases = c.spark.read.parquet(os.path.join(d, "leases"))
        dup = leases.groupBy("addr_key").count().filter("count > 1").count()
        assert dup == 0, f"politeness violated in {d}"


def test_page_budget_respected(crawl):
    c, _, _, _ = crawl
    js = c.state["job_state"].unionByName(c.state["job_state_archive"])
    over = js.filter(F.col("pages_crawled") > CFG.page_budget).count()
    assert over == 0


def test_resume_equals_uninterrupted(spark, tmp_path, crawl, sim):
    """Kill after epoch 2, resume, run to EPOCHS: final state must equal
    the uninterrupted run (north_rule exact resumability)."""
    _, _, _, images = crawl
    s, _ = sim
    ckpt2 = str(tmp_path / "ckpt2")
    c2 = Crawler(spark, images, N_IMAGES, ckpt2, cfg=CFG)
    c2.init_empty()
    c2.seed(SEEDS)
    c2.run(2, stop_when_idle=False)
    # simulate a new process: fresh Crawler object resumes from disk
    c3 = Crawler(spark, images, N_IMAGES, ckpt2, cfg=CFG)
    c3.resume()
    assert c3.epoch == 2
    c3.run(EPOCHS - 2, stop_when_idle=False)
    engine_seen = {r.domain for r in c3.seen_domains_exact().collect()}
    assert engine_seen == s.seen
    engine_urls = {r.url for r in c3.fetched_urls().collect()}
    sim_urls = set().union(*s.fetched_log) if s.fetched_log else set()
    assert engine_urls == sim_urls


def test_equality_holds_under_different_config(spark, tmp_path):
    """Same equality property under a second config (different sharding,
    concurrency-1 politeness, tighter budget) — guards against rules
    that only agree under the primary test config."""
    cfg2 = CrawlConfig(
        shard_total=8, dequeue_limit=50, domain_concurrency=1,
        lease_ttl_epochs=3, max_depth=3, page_budget=3,
        seen_capacity=2000, seen_err=1e-6, salt_buckets=2,
    )
    seeds2 = seed_urls(8)
    images = images_df(spark, N_IMAGES).cache()
    c = Crawler(spark, images, N_IMAGES, str(tmp_path / "ckpt_cfg2"), cfg=cfg2)
    c.init_empty()
    c.seed(seeds2)
    stats = c.run(3, stop_when_idle=False)
    s = SimCrawler(N_IMAGES, cfg=cfg2)
    s.seed(seeds2)
    sim_stats = s.run(3)
    for got, want in zip(stats, sim_stats):
        assert (got.dequeued, got.fetched, got.finished, got.queued_after) == (
            want["dequeued"], want["fetched"], want["finished"], want["queued_after"]
        ), f"epoch {got.epoch}"
    assert {r.domain for r in c.seen_domains_exact().collect()} == s.seen


def test_equality_under_second_level_only(spark, tmp_path):
    """F12/F13 (rules.rs:28-43): with second_level_only=True and
    subdomain seeds, linked names collapse to SLDs and self-links are
    suppressed on SLDs — engine and simulator must still agree exactly,
    including the recorded link graph."""
    cfg3 = CrawlConfig(
        shard_total=4, dequeue_limit=50, domain_concurrency=2,
        lease_ttl_epochs=5, max_depth=3, page_budget=4,
        seen_capacity=2000, seen_err=1e-6, salt_buckets=2,
        second_level_only=True,
    )
    seeds3 = [f"http://blog{k}.site{k % 5}.com/" for k in range(8)] + [
        "http://site7.net/",
        "http://www.site8.org/a",
    ]
    images = images_df(spark, N_IMAGES).cache()
    c = Crawler(spark, images, N_IMAGES, str(tmp_path / "ckpt_slo"), cfg=cfg3)
    c.init_empty()
    c.seed(seeds3)
    stats = c.run(3, stop_when_idle=False)
    s = SimCrawler(N_IMAGES, cfg=cfg3)
    s.seed(seeds3)
    sim_stats = s.run(3)
    for got, want in zip(stats, sim_stats):
        assert (got.dequeued, got.fetched, got.discovered_domains, got.finished) == (
            want["dequeued"], want["fetched"], want["discovered"], want["finished"]
        ), f"epoch {got.epoch}"
    assert {r.domain for r in c.seen_domains_exact().collect()} == s.seen
    engine_links = {(r.domain, r.linked) for r in c.state["domain_links"].collect()}
    # both sides drop a domain's links once it finishes, so these are
    # the same live view
    assert engine_links == s.domain_links


def test_topk_matches_simulator(crawl, sim):
    c, _, _, _ = crawl
    s, _ = sim
    got = {(r.tld, r.domain): r.hits for r in c.topk(100).collect()}
    # sim top-100 per tld
    import itertools

    want = {}
    by_tld: dict[str, list] = {}
    for (tld, dom), h in s.hits.items():
        by_tld.setdefault(tld, []).append((-h, dom, h))
    for tld, items in by_tld.items():
        items.sort()
        for _, dom, h in items[:100]:
            want[(tld, dom)] = h
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9, k


def test_equality_with_timeouts_and_blacklist(spark, tmp_path):
    """Job soft/hard timeouts (default.yaml:212-217) and the
    net_v4_blacklist resolver filter (default.yaml:246-247) must keep
    engine/simulator exact equality under a config that exercises both
    (small timeouts bite mid-crawl; the /2 net blacklists ~25% of
    synthesized addresses)."""
    cfgt = CrawlConfig(
        shard_total=4, dequeue_limit=100, domain_concurrency=2,
        lease_ttl_epochs=20, max_depth=4, page_budget=50,
        seen_capacity=5000, seen_err=1e-6, salt_buckets=4,
        job_soft_timeout_epochs=2, job_hard_timeout_epochs=3,
        job_hard_timeout_jitter_epochs=2,
        net_v4_blacklist=("64.0.0.0/2", "10.0.0.0/8"),
    )
    seeds = seed_urls(12)
    images = images_df(spark, N_IMAGES).cache()
    c = Crawler(spark, images, N_IMAGES, str(tmp_path / "ckpt_to"), cfg=cfgt)
    c.init_empty()
    c.seed(seeds)
    stats = c.run(5, stop_when_idle=False)
    s = SimCrawler(N_IMAGES, cfg=cfgt)
    s.seed(seeds)
    sim_stats = s.run(5)
    for got, want in zip(stats, sim_stats):
        assert (
            got.dequeued, got.fetched, got.discovered_domains,
            got.finished, got.queued_after,
        ) == (
            want["dequeued"], want["fetched"], want["discovered"],
            want["finished"], want["queued_after"],
        ), f"epoch {got.epoch}"
    assert {r.domain for r in c.seen_domains_exact().collect()} == s.seen
    engine_urls = {r.url for r in c.fetched_urls().collect()}
    assert engine_urls == set().union(*s.fetched_log)


def test_equality_with_delay_jitter(spark, tmp_path):
    """Per-domain delay jitter (default.yaml:203-206) makes token rates
    fractional and domain-specific — engine and simulator must still
    agree exactly (the jitter draw is the same hash on both sides)."""
    cfgj = CrawlConfig(
        shard_total=4, dequeue_limit=100, domain_concurrency=3,
        lease_ttl_epochs=10, max_depth=4, page_budget=8,
        seen_capacity=2000, seen_err=1e-6, salt_buckets=2,
        delay_jitter=1.5,
    )
    seeds = seed_urls(10)
    images = images_df(spark, N_IMAGES).cache()
    c = Crawler(spark, images, N_IMAGES, str(tmp_path / "ckpt_jit"), cfg=cfgj)
    c.init_empty()
    c.seed(seeds)
    stats = c.run(4, stop_when_idle=False)
    s = SimCrawler(N_IMAGES, cfg=cfgj)
    s.seed(seeds)
    sim_stats = s.run(4)
    for got, want in zip(stats, sim_stats):
        assert (got.dequeued, got.fetched, got.finished, got.queued_after) == (
            want["dequeued"], want["fetched"], want["finished"], want["queued_after"]
        ), f"epoch {got.epoch}"
    engine_urls = {r.url for r in c.fetched_urls().collect()}
    assert engine_urls == set().union(*s.fetched_log)


def test_hard_timeout_drains_endless_domain(spark, tmp_path):
    """A domain whose pages keep yielding internal links is bounded by
    the job timeouts, not just page_budget: soft stops new selections,
    hard force-finishes with queued work remaining."""
    cfgd = CrawlConfig(
        shard_total=4, dequeue_limit=100, domain_concurrency=4,
        lease_ttl_epochs=50, max_depth=25, page_budget=1000,
        seen_capacity=2000, seen_err=1e-6, salt_buckets=2,
        job_soft_timeout_epochs=2, job_hard_timeout_epochs=4,
    )
    images = images_df(spark, N_IMAGES).cache()
    c = Crawler(spark, images, N_IMAGES, str(tmp_path / "ckpt_drain"), cfg=cfgd)
    c.init_empty()
    c.seed(["http://endless0.com/"])
    c.run(8, stop_when_idle=False)
    both = c.state["job_state"].unionByName(c.state["job_state_archive"])
    js = {r.domain: r for r in both.collect()}
    assert js["endless0.com"].finished
    # far below the 1000-page budget: the timeout retired it
    assert js["endless0.com"].pages_crawled <= cfgd.domain_concurrency * (
        cfgd.job_hard_timeout_epochs + 1
    )
    # metrics_job attribution (init.sql:55-63 / types.rs:330-361): the
    # force-kill is labeled hard_timeout, at lease age >= the timeout
    jm = M.read_metrics(spark, str(tmp_path / "ckpt_drain"), "metrics_job").collect()
    (row,) = [r for r in jm if r.domain == "endless0.com"]
    assert row.term_by == "hard_timeout"
    assert row.duration_epochs >= cfgd.job_hard_timeout_epochs


def test_caller_supplied_robots_not_auto_extended(spark, tmp_path):
    """A caller-provided robots table is authoritative as given:
    seed() must NOT append synthesized rules for uncovered seed
    domains (they read as allow + default delay), unless the caller
    opts in with robots_auto_extend=True. Default construction
    (robots=None) keeps the synthesized stand-in."""
    from crusty_spark.fixtures import robots_df

    cfg = CrawlConfig(
        shard_total=4, dequeue_limit=100, domain_concurrency=2,
        lease_ttl_epochs=10, max_depth=3, page_budget=5,
        seen_capacity=2000, seen_err=1e-6, salt_buckets=2,
    )
    seeds = [f"http://site{k}.com/" for k in range(6)]
    covered = ["site0.com"]  # robots for one of the six seed domains
    images = images_df(spark, 32).cache()

    partial = robots_df(spark, covered)
    c = Crawler(spark, images, 32, str(tmp_path / "ck_frozen"), cfg=cfg, robots=partial)
    assert c.robots_auto_extend is False
    c.init_empty()
    c.seed(seeds)
    assert {r.domain for r in c.robots.select("domain").collect()} == set(covered)
    # uncovered seeds are admitted unblocked (no robots = allow)
    fr = c.state["frontier"].collect()
    assert {r.domain for r in fr} >= {"site1.com", "site2.com"}
    assert not any(r.blocked for r in fr if r.domain != "site0.com")

    opted = Crawler(
        spark, images, 32, str(tmp_path / "ck_opted"), cfg=cfg,
        robots=robots_df(spark, covered), robots_auto_extend=True,
    )
    opted.init_empty()
    opted.seed(seeds)
    assert {r.domain for r in opted.robots.select("domain").collect()} >= {
        "site0.com", "site1.com", "site5.com",
    }

    default = Crawler(spark, images, 32, str(tmp_path / "ck_default"), cfg=cfg)
    assert default.robots_auto_extend is True
    default.init_empty()
    default.seed(seeds)
    assert default.robots.count() >= 6


def test_finished_domains_leave_hot_frontier(spark, tmp_path):
    """Archive semantics (redis-queue lib.rs:162-169 bucket deletion):
    after a domain finishes, none of its rows remain in the hot
    frontier — per-epoch scan size tracks ACTIVE domains, not crawl
    age — while fetched_urls() still sees the archived history."""
    cfga = CrawlConfig(
        shard_total=4, dequeue_limit=100, domain_concurrency=2,
        lease_ttl_epochs=10, max_depth=3, page_budget=3,
        seen_capacity=5000, seen_err=1e-6, salt_buckets=4,
    )
    images = images_df(spark, N_IMAGES).cache()
    c = Crawler(spark, images, N_IMAGES, str(tmp_path / "ckpt_arch"), cfg=cfga)
    c.init_empty()
    c.seed(seed_urls(10))
    c.run(4, stop_when_idle=False)
    finished = {r.domain for r in c.seen_domains_exact().collect()}
    assert finished  # the tight budget must finish some domains
    hot = {r.domain for r in c.state["frontier"].select("domain").distinct().collect()}
    assert not (hot & finished), "finished domains still in hot frontier"
    archived = {
        r.domain for r in c.state["frontier_archive"].select("domain").distinct().collect()
    }
    assert finished <= archived
    assert c.fetched_urls().count() > 0
    # job_state mirrors the split: the hot merge table holds ACTIVE
    # domains only, finished rows live in job_state_archive
    assert c.state["job_state"].filter(F.col("finished")).count() == 0
    js_arch = {r.domain for r in c.state["job_state_archive"].collect()}
    assert js_arch == finished


def test_epoch_driver_action_budget(spark, tmp_path):
    """The epoch contract: exactly 4 driver count/collect actions
    (dequeue, fetch, discovery gate, fused finish+queue-depth) — the
    stage timers. Guards against count sprawl on the hot path."""
    cfgb = CrawlConfig(
        shard_total=4, dequeue_limit=50, domain_concurrency=2,
        lease_ttl_epochs=5, max_depth=3, page_budget=4,
        seen_capacity=2000, seen_err=1e-6, salt_buckets=2,
    )
    images = images_df(spark, N_IMAGES).cache()
    c = Crawler(spark, images, N_IMAGES, str(tmp_path / "ckpt_act"), cfg=cfgb)
    c.init_empty()
    # seed() must be fully lazy — no driver collect, no Spark job (the
    # round-3 version collected all seed domains to synthesize robots)
    sc = spark.sparkContext
    sc.setJobGroup("seed_audit", "seed must not run jobs")
    c.seed(seed_urls(6))
    sc.setJobGroup("seed_audit_done", "")
    assert list(sc.statusTracker().getJobIdsForGroup("seed_audit")) == []
    c.run(2, stop_when_idle=False)
    assert c.last_epoch_actions == 4


def test_reseeding_finished_domain_is_noop(spark, tmp_path):
    """With finished domains archived out of the hot tables, seed()
    anti-joins against job_state_archive so re-seeding a finished
    domain cannot re-crawl it, while genuinely new seeds still enter."""
    cfgr = CrawlConfig(
        shard_total=4, dequeue_limit=100, domain_concurrency=2,
        lease_ttl_epochs=10, max_depth=3, page_budget=2,
        seen_capacity=2000, seen_err=1e-6, salt_buckets=2,
    )
    images = images_df(spark, N_IMAGES).cache()
    c = Crawler(spark, images, N_IMAGES, str(tmp_path / "ckpt_reseed"), cfg=cfgr)
    c.init_empty()
    c.seed(seed_urls(4))
    c.run(4, stop_when_idle=False)
    finished = {r.domain for r in c.seen_domains_exact().collect()}
    assert finished  # the 2-page budget must finish some domains
    dom = sorted(finished)[0]
    c.seed([f"http://{dom}/", "http://brandnewseed0.com/"])
    hot = c.state["frontier"]
    assert hot.filter(F.col("domain") == dom).count() == 0, "finished domain re-entered"
    assert hot.filter(F.col("domain") == "brandnewseed0.com").count() == 1
    c.run(1, stop_when_idle=False)
    assert c.state["frontier"].filter(F.col("domain") == dom).count() == 0


def test_topk_state_bounded_with_small_headroom(spark, tmp_path):
    """domain_hits must stay bounded by n_tlds x k x headroom on a crawl
    that finishes many domains (the reference bounds this by sketch
    construction, width=k*250) — while topk results still equal the
    simulator's under the identical pruning rule."""
    cfg = CrawlConfig(
        shard_total=4, dequeue_limit=100, domain_concurrency=2,
        lease_ttl_epochs=10, max_depth=4, page_budget=2,
        seen_capacity=5000, seen_err=1e-6, salt_buckets=4,
        topk_k=2, topk_headroom=2,
    )
    seeds = seed_urls(12)
    images = images_df(spark, N_IMAGES).cache()
    c = Crawler(spark, images, N_IMAGES, str(tmp_path / "ckpt_topk"), cfg=cfg)
    c.init_empty()
    c.seed(seeds)
    c.run(5, stop_when_idle=False)
    s = SimCrawler(N_IMAGES, cfg=cfg)
    s.seed(seeds)
    s.run(5)
    hits_rows = c.state["domain_hits"].collect()
    assert len(hits_rows) > 0
    # bound: <= k*headroom rows per tld (incl. the "" global bucket)
    from collections import Counter

    per_tld = Counter(r.tld for r in hits_rows)
    assert all(n <= cfg.topk_k * cfg.topk_headroom for n in per_tld.values()), per_tld
    # exact state equality with the simulator under the same pruning
    got = {(r.tld, r.domain): r.hits for r in hits_rows}
    assert set(got) == set(s.hits)
    for key in got:
        assert abs(got[key] - s.hits[key]) < 1e-9, key


def test_scoped_shards_equal_single_engine(spark, tmp_path):
    """The multi-engine seam (conf/default.yaml:35-43, crusty.rs:550-560,
    README.md:42-58): two Crawler instances with disjoint shard scopes
    over SHARED state tables must jointly produce exactly the
    single-engine schedule. The reference shares one Redis; here the
    share is emulated by a per-epoch commit/merge of the shared tables
    (frontier, seen Bloom, robots cache) after both instances' epochs —
    exactly what concurrent engines see on shared storage, since each
    dequeues at epoch start from the previous epoch's committed state.
    Politeness can never cross a scope boundary (addr_key -> shard is a
    function), so per-epoch dequeue/fetch/finish counts ADD UP to the
    single-engine (simulator) run, and the final fetched-URL and
    seen-domain sets match exactly."""
    cfgs = dict(
        shard_total=4, dequeue_limit=100, domain_concurrency=2,
        lease_ttl_epochs=10, max_depth=3, page_budget=4,
        seen_capacity=5000, seen_err=1e-6, salt_buckets=4,
    )
    scope_a, scope_b = (0, 1), (2, 3)
    cfg_a = CrawlConfig(**cfgs, shard_min=0, shard_max=1)
    cfg_b = CrawlConfig(**cfgs, shard_min=2, shard_max=3)
    seeds = seed_urls(12)
    images = images_df(spark, N_IMAGES).cache()
    ca = Crawler(spark, images, N_IMAGES, str(tmp_path / "ckpt_sA"), cfg=cfg_a)
    cb = Crawler(spark, images, N_IMAGES, str(tmp_path / "ckpt_sB"), cfg=cfg_b)
    for c in (ca, cb):
        c.init_empty()
        c.seed(seeds)  # enqueue writes ALL shards on both (crusty.rs:550-560)

    def merged_scope_rows(owner, other, scope):
        """The merged frontier's rows for `scope`: the owner (the
        instance that schedules these shards) is authoritative; the
        other instance can only have ADDED rows there (discovery
        enqueues cross shard scopes), so take its additions minus
        anything the owner already has or has archived/finished."""
        lo, hi = scope
        own = owner.state["frontier"].filter(F.col("shard").between(lo, hi))
        oth = other.state["frontier"].filter(F.col("shard").between(lo, hi))
        known = own.select("domain", "url_hash").unionByName(
            owner.state["frontier_archive"].select("domain", "url_hash")
        )
        fresh = (
            oth.join(known, ["domain", "url_hash"], "left_anti")
            .join(owner.state["job_state_archive"].select("domain"), "domain", "left_anti")
        )
        return own.unionByName(fresh)

    def merge_blooms(a, b):
        """OR the shared scaling-Bloom bitsets per (shard, level) — the
        shared-Redis analog. n_items double-counts the common base; at
        this capacity (5000 vs ~100 inserts) level scaling never
        triggers, so only the bits matter."""
        from crusty_spark.bloom import BLOOM_SCHEMA

        rows: dict = {}
        for r in a.collect() + b.collect():
            key = (r.shard, r.level)
            if key in rows:
                p = rows[key]
                p["bits"] = bytes(x | y for x, y in zip(p["bits"], bytes(r.bits)))
                p["n_items"] += r.n_items
            else:
                rows[key] = {
                    "shard": r.shard, "level": r.level, "bits": bytes(r.bits),
                    "n_bits": r.n_bits, "n_hashes": r.n_hashes,
                    "n_items": r.n_items, "capacity": r.capacity,
                }
        data = [tuple(v[f] for f in BLOOM_SCHEMA.fieldNames()) for v in rows.values()]
        return spark.createDataFrame(data, BLOOM_SCHEMA)

    stats_a, stats_b = [], []
    for _ in range(3):
        stats_a.append(ca.run_epoch())
        stats_b.append(cb.run_epoch())
        # the per-epoch shared-table commit
        frontier = merged_scope_rows(ca, cb, scope_a).unionByName(
            merged_scope_rows(cb, ca, scope_b)
        ).localCheckpoint()
        bloom = merge_blooms(ca.state["seen_bloom"], cb.state["seen_bloom"])
        robots = ca.robots.unionByName(cb.robots).dropDuplicates(["domain"]).localCheckpoint()
        for c in (ca, cb):
            c.state["frontier"] = frontier
            c.state["seen_bloom"] = bloom
            c.robots = robots

    s = SimCrawler(N_IMAGES, cfg=CrawlConfig(**cfgs))  # full scope
    s.seed(seeds)
    sim_stats = s.run(3)
    for ga, gb, want in zip(stats_a, stats_b, sim_stats):
        assert ga.dequeued + gb.dequeued == want["dequeued"], f"epoch {ga.epoch} dequeued"
        assert ga.fetched + gb.fetched == want["fetched"], f"epoch {ga.epoch} fetched"
        assert ga.finished + gb.finished == want["finished"], f"epoch {ga.epoch} finished"
    got_urls = {r.url for r in ca.fetched_urls().collect()} | {
        r.url for r in cb.fetched_urls().collect()
    }
    assert got_urls == set().union(*s.fetched_log)
    got_seen = {r.domain for r in ca.seen_domains_exact().collect()} | {
        r.domain for r in cb.seen_domains_exact().collect()
    }
    assert got_seen == s.seen


def test_shard_read_cadence_equality_and_staggering(spark, tmp_path):
    """reader.shard_min_last_read analog (default.yaml:100-104): with
    shard_min_last_read_epochs=2 each shard is dequeued only every 2nd
    epoch (staggered by shard parity), engine == simulator exactly,
    and every lease ever taken respects the cadence rule."""
    cfgk = CrawlConfig(
        shard_total=4, dequeue_limit=100, domain_concurrency=2,
        lease_ttl_epochs=10, max_depth=3, page_budget=4,
        seen_capacity=2000, seen_err=1e-6, salt_buckets=2,
        shard_min_last_read_epochs=2,
    )
    seeds = seed_urls(12)
    images = images_df(spark, N_IMAGES).cache()
    c = Crawler(spark, images, N_IMAGES, str(tmp_path / "ckpt_cadence"), cfg=cfgk)
    c.init_empty()
    c.seed(seeds)
    stats = c.run(4, stop_when_idle=False)
    s = SimCrawler(N_IMAGES, cfg=cfgk)
    s.seed(seeds)
    sim_stats = s.run(4)
    for got, want in zip(stats, sim_stats):
        assert (got.dequeued, got.fetched, got.finished, got.queued_after) == (
            want["dequeued"], want["fetched"], want["finished"], want["queued_after"]
        ), f"epoch {got.epoch}"
    assert {r.domain for r in c.seen_domains_exact().collect()} == s.seen
    # cadence rule on the persisted lease history: a lease taken at
    # epoch e always has shard % 2 == e % 2
    import glob
    import os

    saw_lease = False
    for d in sorted(glob.glob(os.path.join(str(tmp_path / "ckpt_cadence"), "epoch=*"))):
        for r in c.spark.read.parquet(os.path.join(d, "leases")).collect():
            saw_lease = True
            assert r.shard % 2 == r.lease_epoch % 2, (r.domain, r.shard, r.lease_epoch)
    assert saw_lease


def test_cross_scope_same_epoch_discovery_race(spark):
    """The one real race of the scoped-engine concurrent-commit
    protocol (README 'Scale design notes'): engines A and B both
    discover domain D in the SAME epoch and stage it for D's scope
    owner. The owner's fold — staged-inbox union → min-depth reduce →
    anti-join vs live frontier AND job_state_archive — must admit
    exactly ONE frontier row for D, keep the MIN staged depth, lease D
    once (politeness), and drop re-discoveries of a domain the owner
    already finished. The fold is enqueue_tasks' own semantics plus
    the archive anti-join seed() uses — no new code path to trust."""
    from crusty_spark import frontier as FR
    from crusty_spark import urls as U

    cfg = CrawlConfig(
        shard_total=4, shard_min=0, shard_max=1, dequeue_limit=100,
        domain_concurrency=2, lease_ttl_epochs=10, max_depth=5,
        page_budget=10, seen_capacity=2000, seen_err=1e-6, salt_buckets=2,
    )
    # two domains that land in owner A's scope (shards 0-1)
    in_scope = [
        d for d in (f"race{i}.com" for i in range(60))
        if U.py_shard_of(U.py_addr_key_of(d), cfg.shard_total) <= 1
    ][:2]
    assert len(in_scope) == 2
    d_live, d_finished = in_scope

    def staged(depth: int) -> "DataFrame":
        raw = spark.createDataFrame(
            [(f"http://{d_live}/x", depth), (f"http://{d_finished}/y", depth)],
            ["url", "depth"],
        )
        return FR.identity_for_urls(raw, cfg, depth_col=True)

    # A staged the discovery at depth 3, B at depth 2 — same epoch
    inbox = staged(3).unionByName(staged(2))
    archive = spark.createDataFrame(
        [(d_finished, 0, 10, 0.0, 0, True)], FR.JOB_STATE_SCHEMA
    )
    folded = FR.enqueue_tasks(
        FR.empty_frontier(spark),
        inbox.join(archive.select("domain"), "domain", "left_anti"),
        epoch=1,
    )
    rows = folded.collect()
    assert [r.domain for r in rows] == [d_live]  # deduped + archive-dropped
    assert rows[0].depth == 2  # min staged depth won
    # the owner schedules D exactly once
    leases = FR.dequeue(
        folded, FR.empty_leases(spark), FR.empty_job_state(spark), 1, cfg
    )
    lease_rows = leases.collect()
    assert len(lease_rows) == 1 and lease_rows[0].domain == d_live


def test_archive_writes_are_per_epoch_deltas(spark, tmp_path):
    """Append-only archives: each finishing epoch writes ONLY its
    archived delta under archive/<name>/e{N} (the metrics append
    pattern) — never a rewrite of the whole cold table — so checkpoint
    write cost tracks the epoch's finish count, not crawl age."""
    import glob
    import os

    cfg = CrawlConfig(
        shard_total=4, dequeue_limit=100, domain_concurrency=2,
        lease_ttl_epochs=10, max_depth=3, page_budget=2,
        seen_capacity=5000, seen_err=1e-6, salt_buckets=4,
    )
    images = images_df(spark, N_IMAGES).cache()
    ck = str(tmp_path / "ckpt_delta")
    c = Crawler(spark, images, N_IMAGES, ck, cfg=cfg)
    c.init_empty()
    c.seed(seed_urls(10))
    c.run(5, stop_when_idle=False)
    fins = {m["epoch"]: m["finished"] for m in c.metrics_rows}
    assert any(n > 0 for n in fins.values())
    # job_state_archive: a delta dir exists iff the epoch finished
    # domains, and holds exactly that epoch's finished rows
    for e, n in fins.items():
        dd = os.path.join(ck, "archive", "job_state_archive", f"e{e:06d}")
        assert os.path.isdir(dd) == (n > 0), (e, n)
        if n:
            assert c.spark.read.parquet(dd).count() == n
    # frontier_archive deltas are disjoint per epoch and union to the
    # logical archive — nothing was ever rewritten
    fa_dirs = sorted(glob.glob(os.path.join(ck, "archive", "frontier_archive", "e*")))
    assert fa_dirs
    per_domains = [
        {r.domain for r in c.spark.read.parquet(p).select("domain").distinct().collect()}
        for p in fa_dirs
    ]
    flat = [d for s in per_domains for d in s]
    assert len(flat) == len(set(flat)), "same domain archived twice"
    per_rows = [c.spark.read.parquet(p).count() for p in fa_dirs]
    assert sum(per_rows) == c.state["frontier_archive"].count()
    # epoch snapshot dirs no longer carry full archive copies
    for d2 in glob.glob(os.path.join(ck, "epoch=*")):
        assert not os.path.isdir(os.path.join(d2, "frontier_archive"))
        assert not os.path.isdir(os.path.join(d2, "job_state_archive"))


def test_archive_compaction_bounds_dirs_and_preserves_contents(spark, tmp_path):
    """compact_archives (Iceberg rewrite_data_files analog): folding
    committed deltas into a base keeps the per-table dir count
    <= keep_deltas + 1 across many finishing epochs, never changes the
    logical archive (row-set equality vs an uncompacted twin), and
    resume still works from the compacted layout."""
    import glob
    import os

    cfg = CrawlConfig(
        shard_total=4, dequeue_limit=100, domain_concurrency=2,
        lease_ttl_epochs=10, max_depth=3, page_budget=2,
        seen_capacity=5000, seen_err=1e-6, salt_buckets=4,
    )
    keep = 1
    images = images_df(spark, N_IMAGES).cache()
    ck = str(tmp_path / "ckpt_compact")
    ck2 = str(tmp_path / "ckpt_plain")
    c = Crawler(spark, images, N_IMAGES, ck, cfg=cfg)
    plain = Crawler(spark, images, N_IMAGES, ck2, cfg=cfg)
    for x in (c, plain):
        x.init_empty()
        x.seed(seed_urls(10))
    n_finishing = 0
    for _ in range(5):
        s = c.run(1, stop_when_idle=False, compact_keep=keep)[0]
        plain.run(1, stop_when_idle=False)
        n_finishing += s.finished > 0
        for name in Crawler.ARCHIVE_TABLES:
            adir = os.path.join(ck, "archive", name)
            n_dirs = len(glob.glob(os.path.join(adir, "base-e*"))) + len(
                glob.glob(os.path.join(adir, "e*"))
            )
            assert n_dirs <= keep + 1, (name, sorted(os.listdir(adir)))
    assert n_finishing >= 3, "fixture must exercise several compactions"
    # logical archives equal the uncompacted twin's, row for row
    for name in Crawler.ARCHIVE_TABLES:
        got = {tuple(r) for r in c.state[name].collect()}
        want = {tuple(r) for r in plain.state[name].collect()}
        assert got == want, name
    # a fresh process resumes from the compacted layout
    c2 = Crawler(spark, images, N_IMAGES, ck, cfg=cfg)
    c2.resume()
    assert c2.epoch == 5
    assert c2.state["frontier_archive"].count() == plain.state["frontier_archive"].count()
    c2.run(1, stop_when_idle=False)
    assert c2.epoch == 6


def test_compact_archives_sweeps_interrupted_leftovers(spark, tmp_path):
    """Crash rule: a compaction interrupted after the base rename but
    before the shadowed-dir deletes leaves duplicates ON DISK but never
    in reads (the newest base shadows them); the next compact_archives
    call sweeps them."""
    import glob
    import os

    cfg = CrawlConfig(
        shard_total=4, dequeue_limit=100, domain_concurrency=2,
        lease_ttl_epochs=10, max_depth=3, page_budget=2,
        seen_capacity=5000, seen_err=1e-6, salt_buckets=4,
    )
    images = images_df(spark, N_IMAGES).cache()
    ck = str(tmp_path / "ckpt_crash")
    c = Crawler(spark, images, N_IMAGES, ck, cfg=cfg)
    c.init_empty()
    c.seed(seed_urls(10))
    c.run(4, stop_when_idle=False)
    name = "job_state_archive"
    adir = os.path.join(ck, "archive", name)
    deltas = sorted(glob.glob(os.path.join(adir, "e*")))
    assert len(deltas) >= 2
    before = {tuple(r) for r in c.state[name].collect()}
    # simulate the interrupted compaction: base written + renamed, but
    # the folded delta dirs were never deleted
    m = max(int(os.path.basename(p)[1:]) for p in deltas)
    c.spark.read.schema(c._archive_schema(name)).parquet(*deltas).write.mode(
        "overwrite"
    ).parquet(os.path.join(adir, f"base-e{m:06d}"))
    # reads ignore the shadowed deltas (no double-counting)
    assert {tuple(r) for r in c._read_archive(name, c.epoch).collect()} == before
    # a compaction that crashed DURING union.write leaves a tmp dir
    # whose fold epoch need not match any later call's; the sweep must
    # remove it unconditionally (it is never a commit point)
    stale_tmp = os.path.join(adir, "_tmp-base-e000000")
    os.makedirs(stale_tmp, exist_ok=True)
    c.compact_archives(keep_deltas=8)
    assert not os.path.exists(stale_tmp)
    assert sorted(glob.glob(os.path.join(adir, "e*"))) == []
    assert {tuple(r) for r in c._read_archive(name, c.epoch).collect()} == before


def test_snapshot_pruning_keeps_resumability(spark, tmp_path):
    """prune_snapshots (expire_snapshots analog): old epoch dirs are
    removed, the newest `keep` remain, and a fresh process still resumes
    from the latest snapshot."""
    import glob
    import os

    cfg4 = CrawlConfig(
        shard_total=4, dequeue_limit=50, domain_concurrency=2,
        lease_ttl_epochs=5, max_depth=3, page_budget=4,
        seen_capacity=2000, seen_err=1e-6, salt_buckets=2,
    )
    images = images_df(spark, N_IMAGES).cache()
    ck = str(tmp_path / "ckpt_prune")
    c = Crawler(spark, images, N_IMAGES, ck, cfg=cfg4)
    c.init_empty()
    c.seed(seed_urls(8))
    c.run(4, stop_when_idle=False, prune_keep=2)
    dirs = sorted(glob.glob(os.path.join(ck, "epoch=*")))
    assert [os.path.basename(d) for d in dirs] == ["epoch=000003", "epoch=000004"]
    c2 = Crawler(spark, images, N_IMAGES, ck, cfg=cfg4)
    c2.resume()
    assert c2.epoch == 4
    c2.run(1, stop_when_idle=False)  # must not need pruned history
    assert c2.epoch == 5
