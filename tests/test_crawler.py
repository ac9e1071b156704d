from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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
    over = c.state["job_state"].filter(F.col("pages_crawled") > CFG.page_budget).count()
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
