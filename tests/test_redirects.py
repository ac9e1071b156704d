"""F9 redirect-chain semantics (reference status_filters::Redirect,
rules.rs:79-86; max_redirect: 5, conf/default.yaml:196): vectorized
kernel vs the scalar twin, hop budget, and the fetch output surface."""

from __future__ import annotations

import numpy as np

from crusty_spark.fetch import (
    MAX_REDIRECT,
    STATUS_REDIRECT_EXCEEDED,
    py_resolve_redirects,
    resolve_redirects_np,
)


def test_vector_chain_matches_scalar_twin():
    hashes = np.array(
        [h * 2654435761 % (1 << 63) - (1 << 62) for h in range(1, 30_000)], dtype=np.int64
    )
    fh, st, hops = resolve_redirects_np(hashes)
    saw_redirect = False
    for i in range(0, len(hashes), 17):
        pfh, pst, phops = py_resolve_redirects(int(hashes[i]))
        assert (int(fh[i]), int(st[i]), int(hops[i])) == (pfh, pst, phops), hashes[i]
        saw_redirect = saw_redirect or phops > 0
    assert saw_redirect  # ~4% of hashes must actually redirect


def test_hop_budget_and_statuses():
    from crusty_spark.hashing import xxh64_long_np

    # hash-distributed inputs (raw small ints bias the >>17 status bits)
    hashes = xxh64_long_np(np.arange(100_000, dtype=np.int64)).view(np.int64)
    fh, st, hops = resolve_redirects_np(hashes)
    assert set(np.unique(st)) <= {200, 404, 500, STATUS_REDIRECT_EXCEEDED}
    assert hops.max() <= MAX_REDIRECT
    assert (st == 200).sum() > 0.8 * len(hashes)
    # exceeded rows exist only at the full budget
    assert (hops[st == STATUS_REDIRECT_EXCEEDED] == MAX_REDIRECT).all()
    # non-redirected rows keep their hash
    keep = hops == 0
    assert (fh[keep] == hashes[keep]).all()


def test_fetch_surface_has_redirect_columns(spark):
    from crusty_spark import fetch as FE
    from crusty_spark import frontier as FR
    from crusty_spark.fixtures import images_df, seed_urls

    cfg = FR.CrawlConfig(shard_total=4)
    # 400 URLs: P(no redirect in sample) = 0.96^400 ~ 8e-8 — the
    # saw-a-redirect assertion is deterministic in practice
    tasks = FR.identity_for_urls(
        spark.createDataFrame([(u,) for u in seed_urls(400)], ["url"]), cfg
    )
    images = images_df(spark, 32)
    store = FE.payload_store(images)
    rows = FE.fetch_and_parse(tasks, images, 32, store_bc=store).collect()
    assert any(r.n_redirects > 0 for r in rows)
    for r in rows:
        if r.n_redirects > 0:
            assert r.final_url != r.url and "/r" in r.final_url
        else:
            assert r.final_url == r.url
        if r.status != 200:
            assert r.internal_paths == [] and r.external_domains == []


def test_fetch_phase_vector_matches_scalar_twin():
    """fetch_phase_np vs py_fetch_phase bit parity (the simulator gates
    on the scalar twin, the engine on the vector kernel)."""
    from crusty_spark import fetch as FE
    from crusty_spark.hashing import xxh64_long_np

    uh = xxh64_long_np(np.arange(5000, dtype=np.int64)).view(np.int64)
    fh = xxh64_long_np(uh, seed=9).view(np.int64)
    st, ld, ov, wt, wr = FE.fetch_phase_np(fh, uh)
    for i in range(0, len(uh), 13):
        pst, pld, pov, pwt, pwr = FE.py_fetch_phase(int(fh[i]), int(uh[i]))
        assert (int(st[i]), int(ld[i]), bool(ov[i]), int(wt[i]), int(wr[i])) == (
            pst, pld, pov, pwt, pwr
        ), (fh[i], uh[i])
    # each cap actually trips at its designed rate (~2-3%)
    assert 0 < (st >= FE.STATUS_TIMEOUT_MS).mean() < 0.06
    assert 0 < (ld >= FE.LOAD_TIMEOUT_MS).mean() < 0.06
    assert 0 < ov.mean() < 0.05


def _hash_hitting(kind):
    """Smallest url_hash whose fetch outcome is `kind` (via the scalar
    twins — the same functions the simulator gates on)."""
    from crusty_spark import fetch as FE

    h = 1
    while True:
        fh, st, _ = FE.py_resolve_redirects(h)
        if st == 200:
            st_ms, ld_ms, oversz, _, _ = FE.py_fetch_phase(fh, h)
            if st_ms >= FE.STATUS_TIMEOUT_MS:
                k = "status_timeout"
            elif ld_ms >= FE.LOAD_TIMEOUT_MS:
                k = "load_timeout"
            elif oversz:
                k = "oversize"
            elif FE.py_content_ok(fh):
                k = "ok"
            else:
                k = "filtered"
            if k == kind:
                return h
        h += 1


def test_fetch_caps_terminate_before_parse(spark):
    """max_response_size / status_timeout / load_timeout analogs
    (conf/default.yaml:201-211): capped tasks are consumed but never
    reach the parser — no payload, no links — and metrics_task labels
    them (597/598 -> error, oversize -> oversize)."""
    from crusty_spark import fetch as FE
    from crusty_spark import metrics as M
    from crusty_spark.fixtures import images_df

    want = {k: _hash_hitting(k) for k in ("status_timeout", "load_timeout", "oversize", "ok")}
    tasks = spark.createDataFrame(
        [(f"http://cap{i}.com/p", int(uh), f"cap{i}.com", 0) for i, uh in enumerate(want.values())],
        "url string, url_hash long, domain string, depth int",
    )
    images = images_df(spark, 32)
    store = FE.payload_store(images)
    parsed = FE.fetch_and_parse(tasks, images, 32, store_bc=store)
    rows = {r.url_hash: r for r in parsed.collect()}

    r = rows[want["status_timeout"]]
    assert r.status == FE.STATUS_STATUS_TIMEOUT
    assert r.image_id is None and r.phash_ok is False and r.internal_paths == []
    r = rows[want["load_timeout"]]
    assert r.status == FE.STATUS_LOAD_TIMEOUT
    assert r.image_id is None and r.internal_paths == []
    r = rows[want["oversize"]]
    assert r.status == 200 and r.oversize
    assert r.read_size_b == FE.MAX_RESPONSE_SIZE  # read capped at the limit
    assert r.image_id is None and r.parse_time_micro == 0 and r.internal_paths == []
    r = rows[want["ok"]]
    assert not r.oversize and r.image_id is not None and r.parse_time_micro > 0
    assert 160 <= r.write_size_b < 640 and 0 <= r.wait_time_ms < 200

    terms = {r.domain: r.term_by for r in M.task_metrics(parsed, 1).collect()}
    by_dom = {k: f"cap{i}.com" for i, k in enumerate(want)}
    assert terms[by_dom["status_timeout"]] == "error"
    assert terms[by_dom["load_timeout"]] == "error"
    assert terms[by_dom["oversize"]] == "oversize"
    assert terms[by_dom["ok"]] == "ok"


def test_link_expansion_canonicalizes_href_forms(spark):
    """F2 wiring: raw hrefs in every emitted form (root-relative, bare,
    dot-relative) resolve against the page base to the SAME canonical
    URL; the nofollow fragment marker is honored BEFORE the
    canonicalizer would strip it."""
    from crusty_spark.fetch import expand_internal_links

    df = spark.createDataFrame(
        [("http://a.com/p3", None, 0, ["/p5", "p5", "./p5", "p6#nofollow"])],
        "url string, final_url string, depth int, internal_paths array<string>",
    )
    rows = expand_internal_links(df, links_per_page=100, max_depth=25).collect()
    assert [r.url for r in rows] == ["http://a.com/p5"] * 3
    assert all(r.depth == 1 for r in rows)
    # redirected page: hrefs resolve against the FINAL url's host/path
    df2 = spark.createDataFrame(
        [("http://a.com/p3", "http://a.com/r9", 2, ["p7"])],
        "url string, final_url string, depth int, internal_paths array<string>",
    )
    rows2 = expand_internal_links(df2, 100, 25).collect()
    assert [r.url for r in rows2] == ["http://a.com/p7"]


def test_content_type_admission(spark):
    """F9 second half (ContentType filters, rules.rs:83-97): ~4% of
    200-status documents synthesize a non-image type — they keep their
    status but yield no payload fields and no links, and are labeled
    'filtered' in metrics_task."""
    from crusty_spark import fetch as FE
    from crusty_spark import frontier as FR
    from crusty_spark import metrics as M
    from crusty_spark.fixtures import images_df, seed_urls

    cfg = FR.CrawlConfig(shard_total=4)
    tasks = FR.identity_for_urls(
        spark.createDataFrame([(u,) for u in seed_urls(400)], ["url"]), cfg
    )
    images = images_df(spark, 32)
    store = FE.payload_store(images)
    parsed = FE.fetch_and_parse(tasks, images, 32, store_bc=store)
    rows = parsed.collect()
    rejected = [
        r
        for r in rows
        if r.status == 200 and not r.oversize and not r.content_type.startswith("image/")
    ]
    admitted = [
        r
        for r in rows
        if r.status == 200 and not r.oversize and r.content_type.startswith("image/")
    ]
    assert rejected and admitted
    for r in rejected:
        assert r.image_id is None and r.internal_paths == [] and r.external_domains == []
    for r in admitted:
        assert r.image_id is not None
    terms = {r.term_by for r in M.task_metrics(parsed, 1).collect()}
    assert "filtered" in terms and "ok" in terms
