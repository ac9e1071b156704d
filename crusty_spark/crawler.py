"""The crawl loop: micro-batch epochs over checkpointed state tables.

Architecture (SURVEY §7): a driver-side loop, one epoch = one
micro-batch. The frontier is its own feedback loop (epoch k's output
is epoch k+1's input), which Structured Streaming cannot express as a
single query; an explicit loop with a snapshot commit per epoch gives
exact resumability instead (north_rule). Each epoch's state is written
to ``{checkpoint}/epoch={e}/<table>.parquet`` plus a ``manifest.json``;
reloading from disk every epoch also truncates the logical-plan
lineage, which would otherwise grow unboundedly in an iterative job.

The epoch dataflow mirrors the reference wiring (crusty.rs:514-592):

  dequeue (lease)  ->  token-bucket allowance  ->  fetch+parse
     -> mark done -> internal links re-enqueue -> discovery (bloom gate)
     -> finish (release lease, seen-commit, link-hit emit) -> metrics

On a real cluster each state table is an Iceberg table partitioned by
``shard`` and the snapshot commit is an Iceberg snapshot; the parquet
layout here is the sandbox stand-in with identical semantics (atomic
via write-then-rename of the manifest).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import bloom as B
from . import fetch as FE
from . import frontier as FR
from . import metrics as M
from . import topk as TK
from .fixtures import tld_whitelist_df
from .frontier import CrawlConfig

DOMAIN_LINKS_SCHEMA = "domain string, shard int, linked string"


@dataclass
class EpochStats:
    epoch: int
    dequeued: int
    fetched: int
    enqueued_tasks: int
    discovered_domains: int
    finished: int
    queued_after: int
    took_s: float


class Crawler:
    """Owns the state tables + the epoch loop. All state transforms are
    module-level pure functions (frontier.py / fetch.py / bloom.py /
    topk.py); this class only sequences them and persists snapshots."""

    # *_archive: cold storage for finished domains' rows (the reference
    # DELETES a finished job's queue bucket AND its job state,
    # redis-queue/src/lib.rs:162-169, keeping only the Bloom; we keep
    # the rows queryable but OUT of the hot tables, so per-epoch scans,
    # the F4 enqueue anti-join and the job_state merge all track ACTIVE
    # domains, not crawl age. Correctness needs no finished rows on the
    # hot path: archived domains have no queued tasks, and rediscovery
    # is gated by the seen Bloom — false negatives are impossible, so a
    # finished domain can never re-enter the frontier.)
    TABLES = (
        "frontier", "frontier_archive", "leases", "job_state",
        "job_state_archive", "seen_bloom", "domain_links", "domain_hits",
    )

    # Archives are APPEND-ONLY on disk: each finishing epoch writes only
    # its archived DELTA to ``{checkpoint}/archive/<name>/e{N}`` (the
    # same pattern the metrics tables use) and the logical table is the
    # union of deltas. Rewriting the whole cold table per epoch would
    # make checkpoint write cost O(total domains ever finished) — crawl
    # age, not active width. On Iceberg each delta is one append commit.
    # Archive deltas are never pruned (prune_snapshots expires epoch
    # snapshots only); resume reads deltas up to the manifest epoch.
    ARCHIVE_TABLES = ("frontier_archive", "job_state_archive")

    # payload auto-select bound: above this row count the images table is
    # treated as a genuine big table (equi-join fetch mode) instead of
    # being collect()ed into the UDF-resident broadcast store — the
    # driver-OOM guard for callers pointing the Crawler at a real payload
    # table. At ~3 KB/row this caps the driver copy at ~300 MB.
    PAYLOAD_STORE_MAX_ROWS = 100_000

    def __init__(
        self,
        spark: SparkSession,
        images: DataFrame,
        n_images: int,
        checkpoint_dir: str,
        cfg: CrawlConfig | None = None,
        robots: DataFrame | None = None,
        payload_in_udf: bool | None = None,
        robots_auto_extend: bool | None = None,
    ):
        self.spark = spark
        self.cfg = cfg or CrawlConfig()
        self.images = images
        self.n_images = n_images
        # UDF-resident payload fetch (see fetch.payload_store): the
        # faithful fetcher model when the synthetic payload universe is
        # broadcastable; the equi-join mode when `images` is a genuine
        # big table. Default (None) auto-selects by table size so a
        # large payload table never triggers a driver-side collect;
        # pass True/False to force a mode (results are identical —
        # tests/test_fetch_modes.py).
        if payload_in_udf is None:
            payload_in_udf = images.count() <= self.PAYLOAD_STORE_MAX_ROWS
        self.store_bc = FE.payload_store(images) if payload_in_udf else None
        self.ckpt = checkpoint_dir
        self.robots = robots
        # Auto-synthesis of robots rules for uncovered domains (the
        # sandbox's distributed stand-in for fetching robots.txt,
        # _extend_robots). Default: on iff `robots` was NOT supplied —
        # a caller-provided table is authoritative as given, so a
        # partial one is not silently completed with synthesized
        # disallow/delay rules that could newly block or slow seed URLs
        # (uncovered domains fall back to "no robots = allow" +
        # default delay, fetch.robots_blocked_col). Pass True to opt a
        # supplied table into completion, False to freeze even the
        # synthesized default. NOTE: the flag is a constructor choice,
        # not persisted state — a process that resume()s a crawl built
        # with robots_auto_extend=False must pass it again.
        if robots_auto_extend is None:
            robots_auto_extend = robots is None
        self.robots_auto_extend = robots_auto_extend
        self.tlds = tld_whitelist_df(spark)
        self.epoch = 0
        self.state: dict[str, DataFrame] = {}
        # per-epoch archive deltas, written append-only by checkpoint()
        self._archive_deltas: dict[str, DataFrame] = {}
        self.metrics_rows: list[dict] = []
        # cached domain-partitioned frontier handle (see _load_frontier)
        self._frontier_cache: DataFrame | None = None
        self._last_epoch_end: float | None = None
        # driver-action audit: number of count/collect actions the last
        # epoch issued (asserted by tests — the epoch contract is 4)
        self.last_epoch_actions = 0

    # ----- state bootstrap / persistence --------------------------------

    def init_empty(self) -> None:
        s = self.spark
        self.state = {
            "frontier": FR.empty_frontier(s),
            "frontier_archive": FR.empty_frontier(s),
            "leases": FR.empty_leases(s),
            "job_state": FR.empty_job_state(s),
            "job_state_archive": FR.empty_job_state(s),
            "seen_bloom": B.empty_bloom(s),
            "domain_links": s.createDataFrame([], DOMAIN_LINKS_SCHEMA),
            "domain_hits": TK.empty_hits(s),
        }
        self.epoch = 0

    def seed(self, seed_urls: list[str]) -> None:
        """send_seed_jobs analog (crusty.rs:491-512): host-less URLs are
        skipped; seeds enter the frontier at depth 0.

        Driver-free after the createDataFrame: robots for seed domains
        are synthesized by the same distributed ``_extend_robots`` path
        discovery uses (mapInPandas), not a driver-side collect of the
        domain list — a 10M-seed bootstrap stays executor-resident, and
        seed() issues no Spark action at all (the action-budget test
        covers it). Re-seeding a domain the crawl already FINISHED is a
        no-op: finished rows leave the hot tables for the archives
        (reference deletes the job outright, redis-queue/src/
        lib.rs:162-169), so seeds are anti-joined against
        job_state_archive — the exclusion the hot job_state
        ``finished`` filter provided before archiving existed."""
        raw = self.spark.createDataFrame([(u,) for u in seed_urls], ["url"])
        tasks = FR.identity_for_urls(raw, self.cfg)
        tasks = tasks.join(
            self.state["job_state_archive"].select("domain"), "domain", "left_anti"
        )
        if self.robots is None:
            from .fixtures import ROBOTS_SCHEMA

            self.robots = self.spark.createDataFrame([], ROBOTS_SCHEMA)
        self._extend_robots(tasks)
        tasks = FE.robots_blocked_col(tasks, self.robots)
        self.state["frontier"] = FR.enqueue_tasks(self.state["frontier"], tasks, epoch=0)

    def _extend_robots(self, new_domains: DataFrame) -> None:
        """Sandbox stand-in for fetching robots.txt of newly discovered
        domains (S6): rules are a deterministic function of the domain
        (fixtures.robots_rules_for), synthesized batch-wise. No-op when
        ``robots_auto_extend`` is off (caller-supplied tables are
        authoritative as given; uncovered domains read as allow)."""
        import pandas as pd

        if not self.robots_auto_extend:
            return

        from .fixtures import ROBOTS_SCHEMA, robots_rules_for

        def gen(batches):
            for pdf in batches:
                rows = [(d, *robots_rules_for(d)) for d in pdf["domain"]]
                yield pd.DataFrame(rows, columns=ROBOTS_SCHEMA.fieldNames())

        fresh = (
            new_domains.select("domain")
            .distinct()
            .join(self.robots.select("domain"), "domain", "left_anti")
            .mapInPandas(gen, ROBOTS_SCHEMA)
        )
        self.robots = self.robots.unionByName(fresh)

    def _epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.ckpt, f"epoch={epoch:06d}")

    def checkpoint(self, unchanged: set[str] = frozenset()) -> None:
        d = self._epoch_dir(self.epoch)
        if self.metrics_rows:
            # metrics_db analog (init.sql:7-16): per-epoch driver timings
            M.append_epoch_metrics(
                self.ckpt,
                "metrics_db",
                self.spark.createDataFrame([self.metrics_rows[-1]]),
                self.epoch,
            )
        prev = self._epoch_dir(self.epoch - 1)
        for name in self.TABLES:
            if name in self.ARCHIVE_TABLES:
                continue  # append-only deltas, written below
            # tables the epoch provably didn't touch (no finishes -> no
            # bloom/hits delta; no discoveries -> no robots delta)
            # hardlink the previous snapshot's immutable parquet files
            # instead of re-running a Spark write — the Iceberg analog
            # is simply not committing to an unchanged table
            if name in unchanged and os.path.isdir(os.path.join(prev, name)):
                self._link_table(os.path.join(prev, name), os.path.join(d, name))
                continue
            w = self.state[name].write.mode("overwrite")
            if name == "frontier":
                # shard-partitioned layout: epoch reads touching a shard
                # subset prune at the file level (Iceberg bucket() analog)
                w = w.partitionBy("shard")
            w.parquet(os.path.join(d, name))
        # archive deltas: only the rows archived THIS epoch are written
        # (append-only; one Iceberg append commit per finishing epoch) —
        # checkpoint write cost tracks the epoch's finish count, never
        # total crawl age
        for name in self.ARCHIVE_TABLES:
            delta = self._archive_deltas.pop(name, None)
            if delta is not None and name not in unchanged:
                delta.write.mode("overwrite").parquet(
                    os.path.join(self.ckpt, "archive", name, f"e{self.epoch:06d}")
                )
        if "robots" in unchanged and os.path.isdir(os.path.join(prev, "robots")):
            self._link_table(os.path.join(prev, "robots"), os.path.join(d, "robots"))
        else:
            self.robots.write.mode("overwrite").parquet(os.path.join(d, "robots"))
        manifest = {"epoch": self.epoch, "tables": list(self.TABLES)}
        tmp = os.path.join(self.ckpt, "_manifest.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.ckpt, "manifest.json"))
        # reload from disk: snapshot isolation + lineage truncation
        for name in self.TABLES:
            if name in self.ARCHIVE_TABLES:
                self.state[name] = self._read_archive(name, self.epoch)
                continue
            self.state[name] = self.spark.read.schema(self.state[name].schema).parquet(
                os.path.join(d, name)
            )
        self.state["frontier"] = self._load_frontier(self.state["frontier"])
        self.robots = self.spark.read.parquet(os.path.join(d, "robots"))

    def _archive_schema(self, name: str):
        return FR.FRONTIER_SCHEMA if name == "frontier_archive" else FR.JOB_STATE_SCHEMA

    def _archive_dirs(self, name: str, upto_epoch: int) -> list[str]:
        """Dirs composing the logical archive as of ``upto_epoch``: the
        newest compacted base (``base-e{M}`` = all deltas <= M folded
        into one dir by compact_archives) plus every delta STRICTLY
        newer than it. Dirs the newest base shadows (older bases,
        deltas <= M) are crash leftovers of an interrupted compaction —
        invisible here, swept by the next compact_archives call."""
        import glob

        base_dirs = sorted(
            p
            for p in glob.glob(os.path.join(self.ckpt, "archive", name, "base-e*"))
            if int(os.path.basename(p)[6:]) <= upto_epoch
        )
        base = base_dirs[-1] if base_dirs else None
        floor = int(os.path.basename(base)[6:]) if base else -1
        deltas = [
            p
            for p in sorted(glob.glob(os.path.join(self.ckpt, "archive", name, "e*")))
            if floor < int(os.path.basename(p)[1:]) <= upto_epoch
        ]
        return ([base] if base else []) + deltas

    def _read_archive(self, name: str, upto_epoch: int) -> DataFrame:
        """The logical archive table = union of per-epoch delta appends
        up to ``upto_epoch`` (deltas past the manifest epoch belong to a
        crashed, uncommitted epoch and are excluded)."""
        dirs = self._archive_dirs(name, upto_epoch)
        schema = self._archive_schema(name)
        if not dirs:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*dirs)

    def compact_archives(self, keep_deltas: int = 8) -> None:
        """Fold committed archive deltas older than the newest
        ``keep_deltas`` into a single base dir per archive table (the
        Iceberg rewrite_data_files analog). Without compaction,
        ``_read_archive`` unions one parquet dir per finishing epoch
        forever — scan fan-out grows with crawl age; with it the dir
        count stays <= keep_deltas + 1. Cost: one rewrite bounded by
        current archive size, amortized over the epochs between calls.

        Crash-safe at every step: only deltas at or below the MANIFEST
        epoch are folded (an uncommitted delta stays a delta for
        resume() to drop); the new base is written to a temp dir and
        renamed into place (the commit point — reads prefer the newest
        base and ignore everything it shadows), and the shadowed dirs
        are deleted after. An interruption anywhere leaves reads
        correct; the next call sweeps the leftovers."""
        import glob
        import shutil

        if keep_deltas < 0:
            raise ValueError("keep_deltas must be >= 0")
        try:
            with open(os.path.join(self.ckpt, "manifest.json")) as f:
                committed = json.load(f)["epoch"]
        except FileNotFoundError:
            return  # nothing committed yet
        for name in self.ARCHIVE_TABLES:
            adir = os.path.join(self.ckpt, "archive", name)
            live = self._archive_dirs(name, committed)
            # sweep ALL interrupted-compaction temp dirs first,
            # regardless of fold epoch: a _tmp-base-e* dir is never a
            # commit point (rename makes it a base), so it is always
            # safe to delete — keying the sweep on this call's fold
            # epoch would leak a crashed run's tmp dir forever
            for p in glob.glob(os.path.join(adir, "_tmp-base-e*")):
                shutil.rmtree(p, ignore_errors=True)
            # sweep dirs an earlier (possibly interrupted) compaction
            # already shadowed: bases older than the newest base, and
            # deltas at or below it
            for p in glob.glob(os.path.join(adir, "base-e*")) + glob.glob(
                os.path.join(adir, "e*")
            ):
                if p not in live and (
                    p.startswith(os.path.join(adir, "base-e"))
                    or int(os.path.basename(p)[1:]) <= committed
                ):
                    shutil.rmtree(p, ignore_errors=True)
            bases = [p for p in live if os.path.basename(p).startswith("base-")]
            deltas = [p for p in live if not os.path.basename(p).startswith("base-")]
            if len(deltas) <= keep_deltas:
                continue
            fold = deltas[: len(deltas) - keep_deltas]
            m = max(int(os.path.basename(p)[1:]) for p in fold)
            union = self.spark.read.schema(self._archive_schema(name)).parquet(
                *(bases + fold)
            )
            tmp = os.path.join(adir, f"_tmp-base-e{m:06d}")
            shutil.rmtree(tmp, ignore_errors=True)
            union.write.mode("overwrite").parquet(tmp)
            final = os.path.join(adir, f"base-e{m:06d}")
            os.rename(tmp, final)  # commit point
            for p in bases + fold:
                shutil.rmtree(p, ignore_errors=True)
            self.state[name] = self._read_archive(name, self.epoch)

    @staticmethod
    def _link_table(src: str, dst: str) -> None:
        """Snapshot an unchanged table by hardlinking its immutable
        parquet files (falls back to copy on filesystems without link
        support). Keeps every epoch dir a complete standalone snapshot
        — prune_snapshots/rmtree semantics are unaffected."""
        import shutil

        if os.path.exists(dst):
            shutil.rmtree(dst)

        def _link_or_copy(s, t, **kw):
            try:
                os.link(s, t)
            except OSError:
                shutil.copy2(s, t)

        shutil.copytree(src, dst, copy_function=_link_or_copy)

    def _load_frontier(self, raw: DataFrame) -> DataFrame:
        """Give a loaded frontier snapshot the layout every epoch branch
        assumes: hash-partitioned by domain, cached. One exchange per
        epoch, after which the dequeue aggregation (grouping keys
        contain `domain`), the fetch-selection shuffle-hash join AND
        its per-domain window, and the F4 enqueue anti-join all run
        WITHOUT moving the big side again (bench.py measures this
        layout; the loop now runs the measured plan). On Iceberg the
        snapshot table would be bucketed by domain and the exchange
        disappears entirely (storage-partitioned scan); shard stays the
        outer partition for file-level pruning."""
        n = raw.count()  # the snapshot-load action, not an epoch action
        if n < self.cfg.frontier_colocate_min_rows:
            # small snapshot: one in-epoch exchange beats the cache
            # bookkeeping; skip colocation entirely
            if self._frontier_cache is not None:
                self._frontier_cache.unpersist()
                self._frontier_cache = None
            return raw
        fr = (
            raw.repartition("domain")
            .sortWithinPartitions("domain", "depth", "url_hash")
            .cache()
        )
        # materialize NOW: a lazy cache reports its partitioning only
        # after it is built, so the next epoch's first query (the
        # dequeue) would plan its own exchange before the cache fills
        fr.count()
        if self._frontier_cache is not None:
            self._frontier_cache.unpersist()
        self._frontier_cache = fr
        return fr

    def close(self) -> None:
        """Release the cached frontier colocation (CacheManager holds
        cached plans until explicitly unpersisted — a long-lived session
        creating many Crawlers would otherwise accumulate them)."""
        if self._frontier_cache is not None:
            try:
                self._frontier_cache.unpersist()
            except Exception:
                pass  # session already stopped
            self._frontier_cache = None

    def __del__(self):  # best-effort: tests create many short-lived crawlers
        self.close()

    def prune_snapshots(self, keep: int = 3) -> None:
        """Expire old epoch snapshots, keeping the most recent `keep`
        (the Iceberg expire_snapshots analog — a week-long crawl must
        not accumulate one full state copy per epoch). The manifest's
        current epoch is always within the kept window; the append-only
        metrics tables under metrics/ are never pruned."""
        import glob
        import shutil

        if keep < 1:
            raise ValueError("keep must be >= 1")
        dirs = sorted(glob.glob(os.path.join(self.ckpt, "epoch=*")))
        for d in dirs[:-keep]:
            shutil.rmtree(d, ignore_errors=True)

    def resume(self) -> None:
        import glob
        import shutil

        with open(os.path.join(self.ckpt, "manifest.json")) as f:
            manifest = json.load(f)
        self.epoch = manifest["epoch"]
        d = self._epoch_dir(self.epoch)
        self.init_empty()
        self.epoch = manifest["epoch"]
        for name in self.TABLES:
            if name in self.ARCHIVE_TABLES:
                # drop any delta past the manifest epoch first: it
                # belongs to an epoch whose manifest commit never
                # happened (crash between delta write and manifest
                # rename) and would otherwise leak into a later
                # no-finish epoch's reload
                for p in sorted(glob.glob(os.path.join(self.ckpt, "archive", name, "e*"))):
                    if int(os.path.basename(p)[1:]) > self.epoch:
                        shutil.rmtree(p, ignore_errors=True)
                self.state[name] = self._read_archive(name, self.epoch)
                continue
            schema = self.state[name].schema
            self.state[name] = self.spark.read.schema(schema).parquet(os.path.join(d, name))
        self.state["frontier"] = self._load_frontier(self.state["frontier"])
        self.robots = self.spark.read.parquet(os.path.join(d, "robots"))

    # ----- the epoch ----------------------------------------------------

    def run_epoch(self) -> EpochStats:
        t0 = time.monotonic()
        since_last_ms = (
            0 if self._last_epoch_end is None else max(int((t0 - self._last_epoch_end) * 1000), 0)
        )
        self.last_epoch_actions = 0
        cfg, epoch = self.cfg, self.epoch + 1
        st = self.state
        frontier, leases, job_state = st["frontier"], st["leases"], st["job_state"]

        # J4 lease TTL expiry: dead nodes' work re-exposed (lib.rs:133-141)
        live = leases.filter(F.col("lease_epoch") + F.col("ttl_epochs") > F.lit(epoch))

        # S2/J2/J3/O2: dequeue under politeness. Cache BEFORE counting:
        # the count and the later leases-union materialization would
        # otherwise each run the whole dequeue chain.
        #
        # Driver-action audit (types.rs:142-154 per-op timing analog):
        # the epoch issues exactly FOUR count/collect actions, each
        # pulling triple duty as cache materializer, stage timer, and
        # gate/stat source — dequeue, fetch, discovery (gates robots
        # extension), and the fused finish+queue-depth collect. Tests
        # assert last_epoch_actions == 4.
        new_leases = FR.dequeue(frontier, live, job_state, epoch, cfg).cache()
        n_dequeued = new_leases.count()
        self.last_epoch_actions += 1
        t_deq = time.monotonic()
        leases = live.unionByName(new_leases).cache()

        # token-bucket allowance for every live lease
        allow = FR.allowance(job_state, leases, self.robots, epoch, cfg).cache()

        # S4: fetch + parse
        tasks = FR.select_fetch_tasks(frontier, allow, cfg).cache()
        parsed = FE.fetch_and_parse(
            tasks, self.images, self.n_images, store_bc=self.store_bc,
            max_redirect=cfg.max_redirect,
        ).cache()
        n_fetched = parsed.count()
        self.last_epoch_actions += 1
        t_fetch = time.monotonic()

        # mark fetched tasks done. The running frontier is referenced by
        # many downstream branches (enqueue anti-joins, discovery 'known',
        # finish counts): localCheckpoint truncates the shared subtree so
        # the epoch's plan stays bounded (durable state is the per-epoch
        # parquet snapshot, so this is a pure plan-size optimization).
        fetched_keys = tasks.select("domain", "url_hash")
        still_queued = frontier.join(fetched_keys, ["domain", "url_hash"], "left_anti")
        done_rows = frontier.join(fetched_keys, ["domain", "url_hash"], "left_semi").withColumn(
            "state", F.lit("done")
        )
        frontier = still_queued.unionByName(done_rows).localCheckpoint()

        # job_state merge: spend tokens, bump page counts
        per_domain = parsed.groupBy("domain").agg(F.count("*").alias("n_fetched"))
        updated = (
            allow.join(per_domain, "domain", "left")
            .withColumn("n_fetched", F.coalesce("n_fetched", F.lit(0)))
            .select(
                "domain",
                "shard",
                (F.col("pages_crawled") + F.col("n_fetched")).cast("int").alias("pages_crawled"),
                (F.col("tokens") - F.col("n_fetched")).alias("tokens"),
                F.col("last_refill_epoch"),
                F.col("finished"),
            )
        )
        job_state = job_state.join(updated.select("domain"), "domain", "left_anti").unionByName(
            updated
        )

        # F11/J1/J7: discovery -> bloom gate -> new jobs. Computed
        # against the PRE-enqueue frontier: internal links only add URLs
        # of domains already present, so the `known` domain set is
        # identical — and doing discovery first lets both enqueues share
        # ONE localCheckpoint below instead of materializing the full
        # frontier twice per epoch.
        disc = FE.discovery_candidates(parsed, self.tlds, cfg.second_level_only)
        disc_id = FR.identity_for_urls(
            disc.select(F.concat(F.lit("http://"), F.col("domain"), F.lit("/")).alias("url")),
            cfg,
        )
        # never re-discover a domain that's already a job or already seen
        known = frontier.select("domain").distinct()
        disc_id = disc_id.join(known, "domain", "left_anti")
        disc_id = B.bloom_filter_unseen(st["seen_bloom"], disc_id, "domain").cache()
        n_disc = disc_id.count()
        self.last_epoch_actions += 1
        t_disc = time.monotonic()
        if n_disc:
            self._extend_robots(disc_id)
        disc_id = FE.robots_blocked_col(disc_id, self.robots)

        # F5-F10: internal link expansion -> re-enqueue, then the
        # discovery enqueue (disjoint keys by construction: internal
        # links stay on existing domains, discovery domains passed the
        # `known` anti-join)
        internal = FE.expand_internal_links(parsed, cfg.links_per_page, cfg.max_depth)
        internal_tasks = FR.identity_for_urls(internal, cfg, depth_col="depth")
        internal_tasks = FE.robots_blocked_col(internal_tasks, self.robots)
        frontier = FR.enqueue_tasks(frontier, internal_tasks, epoch)
        frontier = FR.enqueue_tasks(frontier, disc_id, epoch).localCheckpoint()

        # link-graph state: per-job linked-domain set (rules.rs:12-48).
        # Linked names pass through transform_domain and the self-link
        # suppression compares the TRANSFORMED names (rules.rs:36-43):
        # under second_level_only, blog.foo.com -> foo.com is a
        # suppressed self-link, exactly like the reference.
        from .urls import transform_domain

        slo = cfg.second_level_only
        new_links = (
            parsed.select(
                F.col("domain"), F.explode("external_domains").alias("linked_raw")
            )
            .select(
                "domain",
                transform_domain(F.col("linked_raw"), slo).alias("linked"),
            )
            .filter(F.col("linked") != transform_domain(F.col("domain"), slo))
            .distinct()
            .join(
                leases.select("domain", "shard"), "domain", "left"
            )
            .select("domain", F.coalesce("shard", F.lit(0)).alias("shard"), "linked")
        )
        # append-only state growth: dedup ONLY the new links against the
        # existing set (left_anti) instead of re-distincting the whole
        # accumulated link graph — a full distinct is O(total links)
        # shuffle per epoch, so epoch cost would grow with crawl age
        fresh_links = new_links.join(
            st["domain_links"].select("domain", "linked"), ["domain", "linked"], "left_anti"
        )
        domain_links = st["domain_links"].unionByName(fresh_links)

        # finish: release leases, seen-commit, link-hit emit
        done = FR.finish_domains(frontier, leases, updated, epoch, cfg).cache()
        done_doms = done.select("domain")
        # archive finished domains' rows OUT of the hot frontier (the
        # reference deletes a finished job's queue bucket,
        # redis-queue/src/lib.rs:162-169): the F4 enqueue anti-join and
        # every frontier scan then grow with ACTIVE width, not crawl
        # age. Rediscovery stays gated by the seen Bloom (J1, committed
        # below); per-job URL dedup only needs active domains' rows.
        frontier_next = frontier.join(done_doms, "domain", "left_anti")
        archived = frontier.join(done_doms, "domain", "left_semi")
        # fused action 4: finish gate + post-archive queue depth in ONE
        # collect (both legs are tiny aggregates)
        fused = (
            done_doms.select(F.lit("finished").alias("k"))
            .unionByName(
                frontier_next.filter(
                    (F.col("state") == "queued") & ~F.col("blocked")
                ).select(F.lit("queued").alias("k"))
            )
            .groupBy("k")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        self.last_epoch_actions += 1
        t_finish = time.monotonic()
        fused_counts = {r.k: r.n for r in fused}
        n_finished = fused_counts.get("finished", 0)
        n_enq = fused_counts.get("queued", 0)
        leases_next = leases.join(done.select("domain"), "domain", "left_anti")
        job_state = (
            job_state.alias("js")
            .join(done.select("domain").withColumn("fin", F.lit(True)), "domain", "left")
            .select(
                "domain",
                "shard",
                "pages_crawled",
                "tokens",
                "last_refill_epoch",
                (F.coalesce("fin", F.lit(False)) | F.col("finished")).alias("finished"),
            )
        )
        # finished job state leaves the hot table with the frontier rows
        # (the reference deletes the whole job; the Bloom is the durable
        # record) — the hot job_state merge scales with ACTIVE domains
        js_fin = job_state.filter(F.col("finished"))
        job_state_archive = st["job_state_archive"].unionByName(js_fin)
        job_state = job_state.filter(~F.col("finished"))
        # the epoch's archive DELTAS — all checkpoint persists (append)
        self._archive_deltas = {"frontier_archive": archived, "job_state_archive": js_fin}
        seen_bloom = st["seen_bloom"]
        if n_finished:
            seen_bloom = B.bloom_insert(
                seen_bloom, done.select("shard", F.col("domain").alias("name")),
                **cfg.bloom_kwargs(),
            )
            # A1/A2: hits = 1 per finished job + 1 per linked domain
            finished_links = domain_links.join(done.select("domain"), "domain", "left_semi")
            job_hits = done.select(F.col("domain").alias("d"))
            link_hits = finished_links.select(F.col("linked").alias("d"))
            counts = (
                job_hits.unionByName(link_hits)
                .groupBy("d")
                .agg(F.count("*").cast("double").alias("hits"))
                .select(
                    F.upper(F.element_at(F.split("d", r"\."), -1)).alias("tld"),
                    F.col("d").alias("domain"),
                    "hits",
                )
            )
            st["domain_hits"] = TK.add_hits(
                st["domain_hits"], counts, epoch, cfg.topk_decay,
                k=cfg.topk_k, headroom=cfg.topk_headroom, eps=cfg.topk_prune_eps,
            )
            domain_links = domain_links.join(done.select("domain"), "domain", "left_anti")
            # persisted domain_topk history (types.rs:400-409,
            # init.sql:65-71): one snapshot per consume epoch so the
            # dashboard's argMax(hits, created_at) has stored history
            M.append_epoch_metrics(
                self.ckpt,
                "metrics_topk",
                TK.topk(st["domain_hits"], cfg.topk_k).withColumn(
                    "epoch", F.lit(epoch).cast("int")
                ),
                epoch,
            )

        # metrics_* appends (ClickHouse-dashboard analog, init.sql:7-71);
        # queue depth samples the HOT (post-archive) table
        M.append_epoch_metrics(self.ckpt, "metrics_task", M.task_metrics(parsed, epoch), epoch)
        M.append_epoch_metrics(self.ckpt, "metrics_job", M.job_metrics(done, epoch), epoch)
        M.append_epoch_metrics(
            self.ckpt, "metrics_queue", M.queue_metrics(frontier_next, leases_next, epoch), epoch
        )

        self.state.update(
            frontier=frontier_next,
            frontier_archive=st["frontier_archive"].unionByName(archived),
            leases=leases_next,
            job_state=job_state,
            job_state_archive=job_state_archive,
            seen_bloom=seen_bloom,
            domain_links=domain_links,
        )
        self.epoch = epoch
        # metrics_db analog row (init.sql:7-16; per-stage took_ms +
        # since_last_ms mirror the reference's per-DB-op timing columns,
        # types.rs:142-154, dashboard latency panels crusty.json:1517-1543)
        took = time.monotonic() - t0
        ms = lambda a, b: max(int((b - a) * 1000), 0)  # noqa: E731
        self.metrics_rows.append(
            {
                "epoch": epoch,
                "dequeued": n_dequeued,
                "fetched": n_fetched,
                "discovered": n_disc,
                "finished": n_finished,
                "queued": n_enq,
                "took_ms": max(int(took * 1000), 1),
                "dequeue_ms": ms(t0, t_deq),
                "fetch_ms": ms(t_deq, t_fetch),
                "expand_ms": ms(t_fetch, t_disc),
                "finish_ms": ms(t_disc, t_finish),
                "since_last_ms": since_last_ms,
            }
        )
        # tables this epoch provably didn't touch snapshot by hardlink
        unchanged: set[str] = set()
        if n_finished == 0:
            unchanged |= {
                "seen_bloom", "domain_hits", "frontier_archive", "job_state_archive",
            }
        if n_disc == 0:
            unchanged.add("robots")
        self.checkpoint(unchanged)
        self._last_epoch_end = time.monotonic()

        stats = EpochStats(
            epoch=epoch,
            dequeued=n_dequeued,
            fetched=n_fetched,
            enqueued_tasks=0,
            discovered_domains=n_disc,
            finished=n_finished,
            queued_after=n_enq,
            took_s=time.monotonic() - t0,
        )
        for df in (new_leases, leases, allow, tasks, parsed, done, disc_id):
            df.unpersist()
        return stats

    def run(
        self,
        n_epochs: int,
        stop_when_idle: bool = True,
        prune_keep: int | None = None,
        compact_keep: int | None = None,
    ) -> list[EpochStats]:
        out = []
        for _ in range(n_epochs):
            s = self.run_epoch()
            if prune_keep is not None:
                self.prune_snapshots(prune_keep)
            if compact_keep is not None:
                self.compact_archives(compact_keep)
            out.append(s)
            if stop_when_idle and s.fetched == 0 and s.queued_after == 0:
                break
        return out

    # ----- inspection helpers -------------------------------------------

    def fetched_urls(self) -> DataFrame:
        """All fetched URLs: hot frontier plus the archived rows of
        finished domains."""
        both = self.state["frontier"].unionByName(self.state["frontier_archive"])
        return both.filter(F.col("state") == "done").select("url")

    def seen_domains_exact(self) -> DataFrame:
        both = self.state["job_state"].unionByName(self.state["job_state_archive"])
        return both.filter(F.col("finished")).select("domain")

    def topk(self, k: int | None = None) -> DataFrame:
        return TK.topk(self.state["domain_hits"], k or self.cfg.topk_k)
