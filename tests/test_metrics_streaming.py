from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crusty_spark import metrics as M
from crusty_spark.crawler import Crawler
from crusty_spark.fixtures import images_df, seed_urls
from crusty_spark.frontier import CrawlConfig
from crusty_spark.streaming import run_metrics_stream

CFG = CrawlConfig(
    shard_total=4, dequeue_limit=100, max_depth=4, page_budget=5,
    seen_capacity=5000, seen_err=1e-6, salt_buckets=4,
)


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt_metrics"))
    images = images_df(spark, 48).cache()
    c = Crawler(spark, images, 48, ckpt, cfg=CFG)
    c.init_empty()
    c.seed(seed_urls(10))
    stats = c.run(3, stop_when_idle=False)
    return c, stats, ckpt


def test_metrics_task_rows_match_fetch_counts(spark, crawled):
    c, stats, ckpt = crawled
    tm = M.read_metrics(spark, ckpt, "metrics_task")
    per_epoch = {r.epoch: r.n for r in tm.groupBy("epoch").agg(F.count("*").alias("n")).collect()}
    for s in stats:
        assert per_epoch.get(s.epoch, 0) == s.fetched


def test_metrics_job_rows_match_finished(spark, crawled):
    c, stats, ckpt = crawled
    jm = M.read_metrics(spark, ckpt, "metrics_job")
    per_epoch = {r.epoch: r.n for r in jm.groupBy("epoch").agg(F.count("*").alias("n")).collect()}
    for s in stats:
        assert per_epoch.get(s.epoch, 0) == s.finished


def test_job_finish_attribution(spark, crawled):
    """metrics_job carries term_by + duration_epochs (init.sql:55-63,
    types.rs:330-361): every finish is attributed, and with no job
    timeouts configured every path is a normal completion. The
    breakdown aggregate reconciles with the crawl's finish counts."""
    c, stats, ckpt = crawled
    jm = M.read_metrics(spark, ckpt, "metrics_job")
    rows = jm.collect()
    assert rows
    assert all(r.term_by in ("drained", "page_budget") for r in rows)
    assert all(r.duration_epochs >= 0 for r in rows)
    # the 5-page budget with endless-ish fixtures must exercise both
    # normal paths, or the attribution test is vacuous
    assert {r.term_by for r in rows} == {"drained", "page_budget"}
    bd = M.job_finish_breakdown(jm).collect()
    assert sum(r.jobs for r in bd) == sum(s.finished for s in stats)
    assert all(r.avg_duration_epochs >= 0 for r in bd)


def test_dashboard_aggregates(spark, crawled):
    c, stats, ckpt = crawled
    pages = M.pages_per_epoch(M.read_metrics(spark, ckpt, "metrics_task"))
    rows = pages.collect()
    assert all(r.pages > 0 for r in rows)
    ok = sum(r.pages for r in rows if r.term_by == "ok")
    err = sum(r.pages for r in rows if r.term_by == "error")
    filt = sum(r.pages for r in rows if r.term_by == "filtered")
    ovr = sum(r.pages for r in rows if r.term_by == "oversize")
    total = sum(s.fetched for s in stats)
    assert ok + err + filt + ovr == total
    assert ok > err + filt + ovr  # ~85% clean 200s by construction

    qt = M.queue_throughput(M.read_metrics(spark, ckpt, "metrics_queue")).collect()
    assert {r.epoch for r in qt} == {s.epoch for s in stats}


def test_tx_rx_and_parse_time_panels(spark, crawled):
    """The TX half of the RX/TX panel (crusty.json:1357) and the
    parse-latency panel are answerable from metrics_task's fetch-phase
    columns (init.sql:43-52): every epoch reports positive TX bytes
    (every task writes a request) and parsed pages carry parse time."""
    c, stats, ckpt = crawled
    tm = M.read_metrics(spark, ckpt, "metrics_task")
    txrx = {r.epoch: r for r in M.tx_rx_per_epoch(tm).collect()}
    for s in stats:
        if s.fetched:
            assert txrx[s.epoch].tx_bytes > 0
            assert txrx[s.epoch].pages == s.fetched
            # request bytes are bounded by the synthetic draw [160, 640)
            assert 160 * s.fetched <= txrx[s.epoch].tx_bytes < 640 * s.fetched
    pt = M.parse_time_stats(tm).collect()
    assert pt and all(r.avg_parse_micro > 0 and r.micro_per_mb > 0 for r in pt)


def test_metrics_db_timings(spark, crawled):
    c, stats, ckpt = crawled
    db = M.read_metrics(spark, ckpt, "metrics_db").collect()
    assert len(db) == len(stats)
    assert all(r.took_ms > 0 for r in db)


def test_metrics_db_per_stage_timings(spark, crawled):
    """Per-stage took_ms + since_last_ms (types.rs:142-154 parity): the
    dashboard's 'which stage regressed' question is answerable —
    stage_latency ranks the four pipeline stages, and the stage times
    are consistent with the epoch total."""
    c, stats, ckpt = crawled
    db = M.read_metrics(spark, ckpt, "metrics_db")
    rows = db.collect()
    for r in rows:
        for col in ("dequeue_ms", "fetch_ms", "expand_ms", "finish_ms", "since_last_ms"):
            assert getattr(r, col) >= 0, col
        assert r.dequeue_ms + r.fetch_ms + r.expand_ms + r.finish_ms <= r.took_ms
    # epochs after the first measure a positive inter-epoch gap
    assert all(r.since_last_ms > 0 for r in rows if r.epoch > 1)
    ranked = M.stage_latency(db).collect()
    assert [r.stage for r in ranked] and len(ranked) == 4
    assert all(r.n_epochs == len(rows) for r in ranked)
    avgs = [r.avg_ms for r in ranked]
    assert avgs == sorted(avgs, reverse=True)  # slowest stage first


def test_streaming_windowed_rates(spark):
    out = run_metrics_stream(spark, seconds=15.0, rows_per_second=400)
    rows = out.collect()
    assert len(rows) >= 1, "at least one finalized window"
    assert all(r.pages > 0 and r.rx_bytes > 0 for r in rows)
    # ~2% of hash-derived statuses are non-200; ok windows must dominate
    ok = sum(r.pages for r in rows if r.term_by == "ok")
    err = sum(r.pages for r in rows if r.term_by == "error")
    assert ok > err


def test_streaming_token_bucket_matches_twin(spark):
    """Stateful streaming politeness (applyInPandasWithState token
    bucket): admission flags must EXACTLY equal the scalar twin replayed
    over the same per-domain event sequence — for an in-event-time-order
    stream (the rate source here), admission is independent of
    micro-batch boundaries; late out-of-order arrivals are documented
    as outside the equality contract — and at
    ~60 req/s/domain against a ~1 token/s bucket, most requests must be
    deferred, not dropped (rows pass through flagged)."""
    import time
    import uuid

    from crusty_spark.streaming import (
        py_token_bucket,
        streaming_token_bucket,
        url_event_stream,
    )

    name = f"bucket_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_token_bucket(url_event_stream(spark, rows_per_second=500), concurrency=2)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            if spark.table(name).count() >= 400:
                break
            time.sleep(1)
    finally:
        q.stop()
    rows = spark.table(name).collect()
    assert len(rows) >= 400
    by_dom: dict[str, list] = {}
    for r in rows:
        by_dom.setdefault(r.domain, []).append((r.ts.timestamp(), r.url_hash, r.admitted))
    n_adm = n_rej = 0
    for dom, evs in by_dom.items():
        evs.sort()
        want = py_token_bucket([(ts, uh) for ts, uh, _ in evs], concurrency=2)
        got = [adm for _, _, adm in evs]
        assert got == want, f"{dom}: streaming bucket diverged from twin"
        n_adm += sum(got)
        n_rej += len(got) - sum(got)
    assert n_adm > 0 and n_rej > n_adm  # overload: most deferred


def test_streaming_token_bucket_buffered_handles_late_events(spark):
    """late_buffer_s mode: over a stream whose events arrive up to
    2 s OUT of event-time order, the buffered bucket must still emit
    admission flags exactly equal to the scalar twin replayed over the
    event-time-sorted sequence — the watermark-buffer reordering puts
    every bounded-late event in its correct position before judging
    it. (The unbuffered mode documents this case as outside its
    contract.) The jitter must actually reorder arrivals, and overload
    must defer most requests."""
    import time
    import uuid

    from crusty_spark.streaming import (
        jittered_url_event_stream,
        py_token_bucket,
        streaming_token_bucket,
    )

    name = f"bucket_late_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_token_bucket(
            jittered_url_event_stream(spark, rows_per_second=500, max_late_s=2.0),
            concurrency=2,
            late_buffer_s=2.5,
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.monotonic() + 40
        while time.monotonic() < deadline:
            if spark.table(name).count() >= 400:
                break
            time.sleep(1)
    finally:
        q.stop()
    rows = spark.table(name).collect()
    assert len(rows) >= 400
    # the stream was genuinely out of order: some event with a LOWER
    # url_hash (arrival tick) carries a LATER event time within a domain
    by_dom: dict[str, list] = {}
    for r in rows:
        by_dom.setdefault(r.domain, []).append((r.ts.timestamp(), r.url_hash, r.admitted))
    reordered = any(
        any(
            a[0] > b[0]
            for a, b in zip(sorted(evs, key=lambda e: e[1]), sorted(evs, key=lambda e: e[1])[1:])
        )
        for evs in by_dom.values()
    )
    assert reordered, "jitter failed to reorder any arrivals"
    n_adm = n_rej = 0
    for dom, evs in by_dom.items():
        evs.sort()
        want = py_token_bucket([(ts, uh) for ts, uh, _ in evs], concurrency=2)
        got = [adm for _, _, adm in evs]
        assert got == want, f"{dom}: buffered bucket diverged from twin under lateness"
        n_adm += sum(got)
        n_rej += len(got) - sum(got)
    assert n_adm > 0 and n_rej > n_adm  # overload: most deferred


def test_domain_topk_history_persisted(spark, crawled):
    """metrics_topk (types.rs:400-409, init.sql:65-71): one topk
    snapshot per consume epoch; domain_topk_latest == live topk at the
    newest snapshot epoch (the argMax(hits, created_at) panel)."""
    c, stats, ckpt = crawled
    consume_epochs = [s.epoch for s in stats if s.finished > 0]
    if not consume_epochs:
        pytest.skip("no domain finished in this mini crawl")
    hist = M.read_metrics(spark, ckpt, "metrics_topk")
    assert set(r.epoch for r in hist.select("epoch").distinct().collect()) == set(
        consume_epochs
    )
    latest = {
        (r.tld, r.domain): r.hits for r in M.domain_topk_latest(hist).collect()
    }
    last = max(consume_epochs)
    snapshot = {
        (r.tld, r.domain): r.hits
        for r in hist.filter(F.col("epoch") == last).collect()
    }
    for k, v in snapshot.items():
        assert abs(latest[k] - v) < 1e-12


def test_streaming_stateful_seen_filter(spark):
    """applyInPandasWithState seen-set: across every micro-batch of a
    repeat-heavy stream, each (domain, url_hash) is emitted AT MOST
    once, and something is actually emitted."""
    import time
    import uuid

    from crusty_spark.streaming import streaming_seen_filter, url_event_stream

    name = f"seen_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_seen_filter(url_event_stream(spark, rows_per_second=400))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.monotonic() + 25
        while time.monotonic() < deadline:
            if spark.table(name).count() >= 20:
                break
            time.sleep(1)
    finally:
        q.stop()
    rows = spark.table(name).collect()
    assert len(rows) >= 20
    keys = [(r.domain, r.url_hash) for r in rows]
    assert len(keys) == len(set(keys)), "stateful filter emitted a duplicate"
    # value space is 8 domains x 40 paths: the cap on distinct emissions
    assert len(set(keys)) <= 8 * 40
