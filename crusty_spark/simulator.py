"""Pure-Python reference simulator — the ordering/membership oracle.

An exact re-implementation of the enqueue/dequeue/finish state machine
of the reference's Redis queue module (workspace/redis-queue/src/
lib.rs:29-197), its filter chain (rules.rs:56-93), and the discovery
filter (crusty.rs:250-274), using dicts/sets and the pure-Python twins
from urls.py / fetch.py / hashing.py. SPOP nondeterminism is replaced
by the same deterministic tie-break the engine uses (SURVEY §2.6 O3:
argmin(min_depth, domain) per addr_key; (depth, url_hash) per task).

Property under test (north_rule): given identical seeds, config, and
payload table, the Spark engine's per-epoch fetched-URL sets, final
URL-seen membership, and finished-domain set must equal this
simulator's exactly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from .fetch import INTERNAL_PATHS as _INTERNAL_PATHS
from .fetch import (  # noqa: F401
    LOAD_TIMEOUT_MS,
    STATUS_TIMEOUT_MS,
    py_content_ok,
    py_derive_links,
    py_fetch_phase,
    py_resolve_redirects,
    py_status_of,
)
from .fixtures import TLD_WHITELIST, gen_image_row, robots_rules_for
from .frontier import CrawlConfig
from .hashing import spark_xxhash64_str
from .urls import (
    canonicalize_series,
    py_addr_key_of,  # noqa: F401  (re-exported for tests)
    py_addr_key_policy,
    py_host_of,
    py_ip_blacklisted,
    py_shard_of,
    py_strip_www,
    py_tld_of,
    py_transform_domain,
)

_TLD_SET = {t.upper() for t in TLD_WHITELIST}


@dataclass
class SimTask:
    url: str
    url_hash: int
    domain: str
    addr_key: str
    shard: int
    depth: int
    state: str = "queued"
    blocked: bool = False


@dataclass
class SimJob:
    domain: str
    shard: int
    pages_crawled: int = 0
    tokens: float = 0.0
    last_refill_epoch: int = 0
    finished: bool = False


class SimCrawler:
    def __init__(self, n_images: int, cfg: CrawlConfig | None = None):
        self.cfg = cfg or CrawlConfig()
        self.n_images = n_images
        self._phash = {}
        self.tasks: dict[tuple[str, int], SimTask] = {}
        self.leases: dict[str, tuple[str, int, int]] = {}  # addr_key -> (domain, epoch, ttl)
        self.jobs: dict[str, SimJob] = {}
        self.seen: set[str] = set()
        self.robots: dict[str, tuple[list[str], int]] = {}
        self.domain_links: set[tuple[str, str]] = set()
        self.hits: dict[tuple[str, str], float] = {}
        self.hits_epoch: int = 0
        self.epoch = 0
        self.fetched_log: list[set[str]] = []

    # ----- helpers -----

    def _phash_of(self, idx: int) -> int:
        if idx not in self._phash:
            self._phash[idx] = gen_image_row(idx)[6]
        return self._phash[idx]

    def _robots_of(self, domain: str) -> tuple[list[str], int]:
        if domain not in self.robots:
            self.robots[domain] = robots_rules_for(domain)
        return self.robots[domain]

    def _blocked(self, domain: str, url: str) -> bool:
        dis, _ = self._robots_of(domain)
        rest = url.split("://", 1)[1]
        path = "/" + rest.split("/", 1)[1] if "/" in rest else "/"
        return any(path.startswith(d) for d in dis)

    def _enqueue_min(self, cands: list[tuple[str, str, int]]) -> None:
        """Batch enqueue with the engine's within-batch rule: duplicate
        (domain, url_hash) candidates reduce to the MIN-DEPTH one
        (frontier.enqueue_tasks groupBy-min-struct). Cross-batch the
        first epoch still wins (insert-if-absent)."""
        best: dict[tuple[str, int], tuple[str, str, int]] = {}
        for url, dom, depth in cands:
            key = (dom, spark_xxhash64_str(url))
            cur = best.get(key)
            if cur is None or depth < cur[2]:
                best[key] = (url, dom, depth)
        for url, dom, depth in best.values():
            self._enqueue(url, dom, depth)

    def _enqueue(self, url: str, domain: str, depth: int) -> None:
        uh = spark_xxhash64_str(url)
        key = (domain, uh)
        if key in self.tasks:
            return
        ak = py_addr_key_policy(
            domain,
            self.cfg.addr_ipv6_policy,
            self.cfg.addr_key_v4_mask,
            self.cfg.addr_key_v6_mask,
        )
        if ak is None:  # address policy resolved nothing: drop (types.rs:57-60)
            return
        # resolver net blacklist (default.yaml:246-247): drop domains
        # whose synthesized v4 identity is blacklisted
        if self.cfg.net_v4_blacklist and py_ip_blacklisted(
            domain, self.cfg.net_v4_blacklist
        ):
            return
        self.tasks[key] = SimTask(
            url=url,
            url_hash=uh,
            domain=domain,
            addr_key=ak,
            shard=py_shard_of(ak, self.cfg.shard_total),
            depth=depth,
            blocked=self._blocked(domain, url),
        )

    def seed(self, seed_urls: list[str]) -> None:
        for u in seed_urls:
            host = py_host_of(u)
            if host is None:
                continue
            self._enqueue(u, py_strip_www(host), 0)

    # ----- the epoch (mirrors Crawler.run_epoch step-for-step) -----

    def run_epoch(self) -> dict:
        cfg = self.cfg
        epoch = self.epoch + 1

        # lease expiry
        self.leases = {
            ak: v for ak, v in self.leases.items() if v[1] + v[2] > epoch
        }
        leased_domains = {v[0] for v in self.leases.values()}

        # dequeue: one domain per addr_key, argmin(min_depth, domain);
        # a scoped instance (default.yaml:35-43) only schedules its
        # shard range — enqueue still writes all shards
        scope_lo, scope_hi = cfg.shard_scope()
        cand: dict[str, dict[str, tuple[int, str, int]]] = {}
        for t in self.tasks.values():
            if t.state != "queued" or t.blocked:
                continue
            if not (scope_lo <= t.shard <= scope_hi):
                continue
            # reader.shard_min_last_read analog: shard read cadence
            k = cfg.shard_min_last_read_epochs
            if k > 1 and epoch % k != t.shard % k:
                continue
            j = self.jobs.get(t.domain)
            if j and j.finished:
                continue
            if t.addr_key in self.leases or t.domain in leased_domains:
                continue
            d = cand.setdefault(t.addr_key, {})
            prev = d.get(t.domain)
            if prev is None or t.depth < prev[0]:
                d[t.domain] = (t.depth, t.domain, t.shard)
        picked = []
        for ak, doms in cand.items():
            best = min(doms.values())  # (min_depth, domain, shard)
            picked.append((ak, best))
        # per-shard limit, rank by (min_depth, domain)
        by_shard: dict[int, list] = {}
        for ak, (md, dom, sh) in picked:
            by_shard.setdefault(sh, []).append((md, dom, ak, sh))
        n_dequeued = 0
        for sh, items in by_shard.items():
            items.sort()
            for md, dom, ak, s in items[: cfg.dequeue_limit]:
                self.leases[ak] = (dom, epoch, cfg.lease_ttl_epochs)
                n_dequeued += 1

        # allowance (token bucket) for every live lease
        allow: dict[str, int] = {}
        for ak, (dom, le, ttl) in self.leases.items():
            j = self.jobs.get(dom)
            if j is None:
                j = SimJob(domain=dom, shard=py_shard_of(ak, cfg.shard_total),
                           tokens=float(cfg.domain_concurrency), last_refill_epoch=epoch)
                self.jobs[dom] = j
            _, delay = self._robots_of(dom)
            # per-domain delay jitter (default.yaml:203-206), the same
            # hash-derived draw and double-op ORDER as frontier.allowance:
            # rate = cap / (1.0 + (delay + jitter))
            jit = (spark_xxhash64_str(dom) % 1000) / 1000.0 * cfg.delay_jitter
            rate = cfg.domain_concurrency / (1.0 + (delay + jit))
            dt = max(0, epoch - j.last_refill_epoch)
            j.tokens = min(j.tokens + rate * dt, float(cfg.domain_concurrency))
            j.last_refill_epoch = epoch
            remaining = max(0, cfg.page_budget - j.pages_crawled)
            allow[dom] = min(int(math.floor(j.tokens)), remaining)
            # job soft timeout (default.yaml:212-214): drain, don't start
            if (
                cfg.job_soft_timeout_epochs is not None
                and epoch - le >= cfg.job_soft_timeout_epochs
            ):
                allow[dom] = 0

        # fetch-task selection: (depth, url_hash) per domain
        per_domain: dict[str, list[SimTask]] = {}
        for t in self.tasks.values():
            if t.state == "queued" and not t.blocked and t.domain in allow and allow[t.domain] > 0:
                per_domain.setdefault(t.domain, []).append(t)
        fetched: list[SimTask] = []
        for dom, ts in per_domain.items():
            ts.sort(key=lambda t: (t.depth, t.url_hash))
            fetched.extend(ts[: allow[dom]])

        # fetch + parse + mark done
        internal_cands: list[tuple[str, str, int]] = []
        ext_pairs: list[tuple[str, str]] = []
        for t in fetched:
            t.state = "done"
            j = self.jobs[t.domain]
            j.pages_crawled += 1
            j.tokens -= 1.0
            # F9: follow the <=5-hop synthetic redirect chain exactly as
            # fetch.resolve_redirects_np does (rules.rs:79-86)
            final_hash, status, hops = py_resolve_redirects(t.url_hash, cfg.max_redirect)
            if status != 200:
                continue
            # fetch caps (default.yaml:201-211, fetch.py_fetch_phase):
            # status/load timeouts and oversized responses terminate
            # after the read, before the parser — no payload, no links
            st_ms, ld_ms, oversz, _, _ = py_fetch_phase(final_hash, t.url_hash)
            if st_ms >= STATUS_TIMEOUT_MS or ld_ms >= LOAD_TIMEOUT_MS or oversz:
                continue
            # F9 content-type admission (fetch.py_content_ok): non-image
            # documents terminate after the read — no payload, no links
            if not py_content_ok(final_hash):
                continue
            idx = final_hash % self.n_images
            ph = self._phash_of(idx)
            ints, exts = py_derive_links(final_hash, ph)
            nd = t.depth + 1
            # base for F2 href resolution: the redirect-followed page
            base = (
                f"http://{t.domain}/r{final_hash % _INTERNAL_PATHS}" if hops else t.url
            )
            for k, path in enumerate(ints):
                if k >= cfg.links_per_page or path.endswith("#nofollow") or nd > cfg.max_depth:
                    continue
                internal_cands.append((base, path, t.domain, nd))
            src_t = py_transform_domain(t.domain, cfg.second_level_only)
            for e in exts:
                # rules.rs:36-43: transform the linked name, suppress
                # self-links on the TRANSFORMED names
                et = py_transform_domain(e, cfg.second_level_only)
                if et != src_t:
                    self.domain_links.add((t.domain, et))
                ext_pairs.append((src_t, et))
        # discovery filter then batch dedup — same order as
        # discovery_candidates (transform, filter rows, THEN dropDuplicates)
        external_cands: list[str] = []
        ext_dedup: set[str] = set()
        for src_t, e in ext_pairs:
            if (
                len(e) >= 4
                and "." in e
                and e != src_t
                and py_tld_of(e) in _TLD_SET
                and e not in ext_dedup
            ):
                ext_dedup.add(e)
                external_cands.append(e)

        # internal enqueue: F2 canonicalize raw hrefs against their base
        # with the SAME vectorized resolver the engine uses, then the
        # min-depth rule for within-batch duplicates
        if internal_cands:
            import pandas as pd

            canon = canonicalize_series(
                pd.Series([p for _, p, _, _ in internal_cands]),
                pd.Series([b for b, _, _, _ in internal_cands]),
            )
            self._enqueue_min(
                [
                    (canon.iat[i], dom, depth)
                    for i, (_, _, dom, depth) in enumerate(internal_cands)
                ]
            )

        # discovery enqueue: minus known frontier domains, minus seen.
        # Identity-time drops (no address under the policy, blacklisted
        # net) happen BEFORE the discovered count, mirroring the engine
        # where identity_for_urls filters ahead of disc_id.count()
        frontier_domains = {t.domain for t in self.tasks.values()}
        n_disc = 0
        for e in external_cands:
            if e in frontier_domains or e in self.seen:
                continue
            if (
                py_addr_key_policy(
                    e,
                    cfg.addr_ipv6_policy,
                    cfg.addr_key_v4_mask,
                    cfg.addr_key_v6_mask,
                )
                is None
            ):
                continue
            if cfg.net_v4_blacklist and py_ip_blacklisted(e, cfg.net_v4_blacklist):
                continue
            frontier_domains.add(e)
            self._enqueue(f"http://{e}/", e, 0)
            n_disc += 1

        # finish
        queued_count: dict[str, int] = {}
        for t in self.tasks.values():
            if t.state == "queued" and not t.blocked:
                queued_count[t.domain] = queued_count.get(t.domain, 0) + 1
        done_domains = []
        hard = cfg.job_hard_timeout_epochs
        for ak, (dom, le, ttl) in list(self.leases.items()):
            j = self.jobs.get(dom)
            pages = j.pages_crawled if j else 0
            # job hard timeout + deterministic per-domain jitter
            # (default.yaml:215-217), mirroring frontier.finish_domains
            timed_out = hard is not None and epoch - le >= hard + (
                spark_xxhash64_str(dom) % (cfg.job_hard_timeout_jitter_epochs + 1)
            )
            if queued_count.get(dom, 0) == 0 or pages >= cfg.page_budget or timed_out:
                done_domains.append(dom)
                del self.leases[ak]
                if j:
                    j.finished = True
                self.seen.add(dom)
        # archive analog (redis-queue lib.rs:162-169 deletes a finished
        # job's bucket): finished domains' tasks leave the hot frontier;
        # queued_after below therefore tracks ACTIVE domains only
        if done_domains:
            done_set_tasks = set(done_domains)
            self.tasks = {
                key: t for key, t in self.tasks.items() if t.domain not in done_set_tasks
            }
            for dom in done_domains:
                queued_count.pop(dom, None)
        if done_domains:
            # decay prior hit state to this epoch, then add fresh counts
            for key in list(self.hits):
                self.hits[key] *= cfg.topk_decay ** (epoch - self.hits_epoch)
            self.hits_epoch = epoch
            counts: dict[str, float] = {}
            done_set = set(done_domains)
            for dom in done_domains:
                counts[dom] = counts.get(dom, 0.0) + 1.0
            for src, linked in list(self.domain_links):
                if src in done_set:
                    counts[linked] = counts.get(linked, 0.0) + 1.0
                    self.domain_links.discard((src, linked))
            for dom, c in counts.items():
                for tld in (py_tld_of(dom), ""):
                    k = (tld, dom)
                    self.hits[k] = self.hits.get(k, 0.0) + c
            # state bound, mirroring topk.add_hits exactly: drop
            # hits < eps, keep rank <= k*headroom per tld by
            # (hits desc, domain asc)
            keep = cfg.topk_k * cfg.topk_headroom
            by_tld: dict[str, list] = {}
            for (tld, dom), h in self.hits.items():
                if h >= cfg.topk_prune_eps:
                    by_tld.setdefault(tld, []).append((-h, dom))
            pruned: dict[tuple[str, str], float] = {}
            for tld, items in by_tld.items():
                items.sort()
                for neg_h, dom in items[:keep]:
                    pruned[(tld, dom)] = -neg_h
            self.hits = pruned

        self.epoch = epoch
        fetched_urls = {t.url for t in fetched}
        self.fetched_log.append(fetched_urls)
        return {
            "epoch": epoch,
            "dequeued": n_dequeued,
            "fetched": len(fetched),
            "discovered": n_disc,
            "finished": len(done_domains),
            "queued_after": sum(queued_count.values()),
            "fetched_urls": fetched_urls,
        }

    def run(self, n_epochs: int) -> list[dict]:
        return [self.run_epoch() for _ in range(n_epochs)]
