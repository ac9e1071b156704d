from __future__ import annotations

from urllib.parse import urljoin

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crusty_spark import urls as U


def test_column_layer_matches_python_twins(spark):
    samples = [
        "http://example.com/",
        "http://WWW.Example.COM/path?q=1",
        "https://sub.site.io/a/b",
        "http://www.x.org/",
        "not-a-url",
    ]
    df = U.with_frontier_identity(
        spark.createDataFrame([(s,) for s in samples], ["url"]), shard_total=4
    )
    for r in df.collect():
        host = U.py_host_of(r.url)
        if host is None:
            assert r.domain is None
            continue
        dom = U.py_strip_www(host)
        assert r.domain == dom
        assert r.tld == U.py_tld_of(dom)
        assert r.addr_key == U.py_addr_key_of(dom)
        assert r.shard == U.py_shard_of(r.addr_key, 4)


def test_addr_key_is_slash24_bucket():
    # two domains whose synthetic IPs share a /24 must share addr_key
    d1 = "a.example.com"
    ip1 = U.py_synth_ip32(d1)
    # find a sibling by brute force over suffixes (deterministic scan)
    sib = None
    for i in range(200000):
        d2 = f"b{i}.example.com"
        if U.py_synth_ip32(d2) >> 8 == ip1 >> 8:
            sib = d2
            break
    if sib is not None:
        assert U.py_addr_key_of(d1) == U.py_addr_key_of(sib)


CANON_CASES = [
    ("http://a.com/x/y", "z", "http://a.com/x/z"),
    ("http://a.com/x/y/", "z", "http://a.com/x/y/z"),
    ("http://a.com/x/y", "/abs", "http://a.com/abs"),
    ("http://a.com/x/y", "//other.com/p", "http://other.com/p"),
    ("https://a.com/x", "//other.com/p", "https://other.com/p"),
    ("http://a.com/x/y", "HTTP://B.COM/Q?a=1#frag", "http://b.com/Q?a=1"),
    ("http://a.com/", "http://b.com:80/p", "http://b.com/p"),
    ("http://a.com/", "https://b.com:443/p", "https://b.com/p"),
    ("http://a.com/d1/d2/page", "../up", "http://a.com/d1/up"),
    ("http://a.com/d1/d2/page", "./here", "http://a.com/d1/d2/here"),
    ("http://a.com", "p", "http://a.com/p"),
    ("http://a.com/x", "http://plain.com", "http://plain.com/"),
    # ".." climbing above the root is dropped (RFC 3986 5.2.4)
    ("http://a.com/p3", "../p5", "http://a.com/p5"),
    ("http://a.com/p3", "../../p5", "http://a.com/p5"),
    ("http://a.com/d/p", "../../../x", "http://a.com/x"),
    # remove_dot_segments applies to the PATH only — dot segments inside
    # the query string pass through untouched (RFC 3986 5.2.4 operates
    # on the path component)
    ("http://a.com/x", "/login?next=/a/../b", "http://a.com/login?next=/a/../b"),
    ("http://a.com/x", "/d/../p?q=/./r", "http://a.com/p?q=/./r"),
]


def test_canonicalize_cases():
    base = pd.Series([b for b, _, _ in CANON_CASES])
    href = pd.Series([h for _, h, _ in CANON_CASES])
    got = U.canonicalize_series(href, base)
    for (b, h, want), g in zip(CANON_CASES, got):
        assert g == want, f"base={b} href={h}: got {g} want {want}"


def test_canonicalize_idempotent():
    base = pd.Series([b for b, _, _ in CANON_CASES])
    href = pd.Series([h for _, h, _ in CANON_CASES])
    once = U.canonicalize_series(href, base)
    twice = U.canonicalize_series(once, base)
    assert list(once) == list(twice)


_seg = st.text(alphabet="abcxyz09", min_size=1, max_size=5)


@given(
    host=st.builds(lambda a, b: f"{a}.{b}.com", _seg, _seg),
    basepath=st.lists(_seg, max_size=3),
    href=st.one_of(
        st.builds(lambda s: "/" + "/".join(s), st.lists(_seg, min_size=1, max_size=3)),
        st.builds(lambda s: "/".join(s), st.lists(_seg, min_size=1, max_size=3)),
        st.builds(lambda h, s: f"http://{h}/" + "/".join(s), _seg, st.lists(_seg, max_size=2)),
    ),
)
@settings(max_examples=150, deadline=None)
def test_canonicalize_matches_urljoin(host, basepath, href):
    base = f"http://{host}/" + "/".join(basepath)
    got = U.canonicalize_series(pd.Series([href]), pd.Series([base]))[0]
    want = urljoin(base, href)
    if want.startswith(("http://", "https://")) and "/" not in want.split("://", 1)[1]:
        want += "/"
    assert got == want


def test_net_v4_blacklist_parity(spark):
    """net_v4_blacklist (default.yaml:246-247, types.rs:57-60): the JVM
    predicate must equal the scalar twin on every domain, and known
    addresses must classify correctly."""
    from pyspark.sql import functions as F

    from crusty_spark.urls import (
        ip_blacklisted_col,
        parse_cidr,
        py_ip_blacklisted,
        py_synth_ip32,
    )

    nets = ("64.0.0.0/2", "10.0.0.0/8", "192.168.0.0/16")
    domains = [f"bl{i}.test{i % 9}.org" for i in range(300)]
    df = spark.createDataFrame([(d,) for d in domains], ["domain"])
    got = {
        r.domain: r.bl
        for r in df.select(
            "domain", ip_blacklisted_col(F.col("domain"), nets).alias("bl")
        ).collect()
    }
    hits = 0
    for d in domains:
        want = py_ip_blacklisted(d, nets)
        assert got[d] == want, d
        # twin self-consistency against the raw synthesized address
        ip = py_synth_ip32(d)
        manual = any(
            (ip >> (32 - b)) == (base >> (32 - b))
            for base, b in map(parse_cidr, nets)
        )
        assert want == manual, d
        hits += want
    assert 0 < hits < len(domains)  # the /2 net makes ~25% match
    assert parse_cidr("10.0.0.0/8") == (10 << 24, 8)
    with pytest.raises(ValueError):
        parse_cidr("300.0.0.0/8")
    with pytest.raises(ValueError):
        parse_cidr("1.2.3.4/40")


def test_addr_policy_parity_and_invariants(spark):
    """O1 (types.rs:22-40): JVM addr_key_policy must equal the scalar
    twin for every policy, and the policy semantics must hold: disabled
    never yields a v6 key (12-char b64), preferred uses the v6 whenever
    one exists, fallback uses v6 only when no v4 exists."""
    from pyspark.sql import functions as F

    from crusty_spark.urls import (
        ADDR_POLICIES,
        addr_key_policy,
        py_addr_key_policy,
        py_synth_addrs,
    )

    domains = [f"site{i}.example{i % 7}.com" for i in range(240)]
    df = spark.createDataFrame([(d,) for d in domains], ["domain"])
    sel = df.select(
        "domain",
        *[addr_key_policy(F.col("domain"), p).alias(p) for p in ADDR_POLICIES],
    )
    rows = {r.domain: r for r in sel.collect()}
    n_dropped = n_v6 = 0
    for d in domains:
        r = rows[d]
        v4s, v6 = py_synth_addrs(d)
        for p in ADDR_POLICIES:
            assert getattr(r, p) == py_addr_key_policy(d, p), (d, p)
        # v4 keys are base64 of 4 bytes (8 chars), v6 keys of 8 bytes (12)
        if r.disabled is not None:
            assert len(r.disabled) == 8
        else:
            n_dropped += 1
        if v6 is not None:
            assert len(r.preferred) == 12
            n_v6 += 1
        elif v4s:
            assert r.preferred == r.disabled
        if v4s:
            assert r.fallback == r.disabled
        elif v6 is not None:
            assert len(r.fallback) == 12
    assert n_dropped > 0 and n_v6 > 0  # both branches actually exercised


def test_addr_key_masks_parity_and_semantics(spark):
    """Configurable addr_key_v4_mask/v6_mask (conf/default.yaml:54-55,
    applied at types.rs:45-47): JVM == scalar twin at non-default
    masks, a wider mask merges buckets (monotone coarsening), and the
    reference's v6 /24 default is expressible."""
    from pyspark.sql import functions as F

    from crusty_spark.urls import (
        addr_key_policy,
        py_addr_key_policy,
        py_synth_addrs,
    )

    domains = [f"m{i}.example{i % 5}.net" for i in range(200)]
    df = spark.createDataFrame([(d,) for d in domains], ["domain"])
    cases = [("v4_single", 16, 64), ("fallback", 16, 24), ("preferred", 8, 40)]
    sel = df.select(
        "domain",
        *[
            addr_key_policy(F.col("domain"), p, v4, v6).alias(f"k{i}")
            for i, (p, v4, v6) in enumerate(cases)
        ],
    )
    n_v6 = 0
    for r in sel.collect():
        for i, (p, v4, v6) in enumerate(cases):
            assert getattr(r, f"k{i}") == py_addr_key_policy(r.domain, p, v4, v6), (
                r.domain, p, v4, v6,
            )
        if py_synth_addrs(r.domain)[1] is not None:
            n_v6 += 1
    assert n_v6 > 0  # the v6 mask branch was actually exercised
    # coarsening: /8 buckets are unions of /24 buckets — same /24 key
    # implies same /8 key; and 200 domains over 256 /8s must collide,
    # so strictly fewer distinct buckets at the wider mask
    k24 = {d: py_addr_key_policy(d, "v4_single", 24) for d in domains}
    k8 = {d: py_addr_key_policy(d, "v4_single", 8) for d in domains}
    by24: dict = {}
    for d in domains:
        by24.setdefault(k24[d], set()).add(k8[d])
    assert all(len(v) == 1 for v in by24.values())
    assert len(set(k8.values())) < len(set(k24.values()))


def test_crawl_equality_under_nondefault_masks(spark, tmp_path):
    """Engine vs simulator with addr_key_v4_mask=16 and the reference's
    v6 /24 under fallback policy: coarser politeness buckets change the
    schedule, and both implementations must change identically."""
    from crusty_spark.crawler import Crawler
    from crusty_spark.fixtures import images_df, seed_urls
    from crusty_spark.frontier import CrawlConfig
    from crusty_spark.simulator import SimCrawler

    cfg = CrawlConfig(
        shard_total=4, dequeue_limit=50, domain_concurrency=2,
        lease_ttl_epochs=5, max_depth=3, page_budget=4,
        seen_capacity=2000, seen_err=1e-6, salt_buckets=2,
        addr_ipv6_policy="fallback", addr_key_v4_mask=16, addr_key_v6_mask=24,
    )
    seeds = seed_urls(10)
    images = images_df(spark, 32).cache()
    c = Crawler(spark, images, 32, str(tmp_path / "ckpt_mask"), cfg=cfg)
    c.init_empty()
    c.seed(seeds)
    stats = c.run(2, stop_when_idle=False)
    s = SimCrawler(32, cfg=cfg)
    s.seed(seeds)
    sim_stats = s.run(2)
    for got, want in zip(stats, sim_stats):
        assert (got.dequeued, got.fetched, got.finished) == (
            want["dequeued"], want["fetched"], want["finished"]
        ), f"epoch {got.epoch}"
    assert {r.domain for r in c.seen_domains_exact().collect()} == s.seen


def test_crawl_equality_under_fallback_policy(spark, tmp_path):
    """Engine vs simulator with addr_ipv6_policy='fallback': the
    politeness bucketing changes (v6 /64 keys, dropped unresolvable
    domains) but the two implementations must still agree."""
    from crusty_spark.crawler import Crawler
    from crusty_spark.fixtures import images_df, seed_urls
    from crusty_spark.frontier import CrawlConfig
    from crusty_spark.simulator import SimCrawler

    cfg = CrawlConfig(
        shard_total=4, dequeue_limit=50, domain_concurrency=2,
        lease_ttl_epochs=5, max_depth=3, page_budget=4,
        seen_capacity=2000, seen_err=1e-6, salt_buckets=2,
        addr_ipv6_policy="fallback",
    )
    seeds = seed_urls(10)
    images = images_df(spark, 32).cache()
    c = Crawler(spark, images, 32, str(tmp_path / "ckpt_v6"), cfg=cfg)
    c.init_empty()
    c.seed(seeds)
    stats = c.run(2, stop_when_idle=False)
    s = SimCrawler(32, cfg=cfg)
    s.seed(seeds)
    sim_stats = s.run(2)
    for got, want in zip(stats, sim_stats):
        assert (got.dequeued, got.fetched, got.finished) == (
            want["dequeued"], want["fetched"], want["finished"]
        ), f"epoch {got.epoch}"
    assert {r.domain for r in c.seen_domains_exact().collect()} == s.seen
