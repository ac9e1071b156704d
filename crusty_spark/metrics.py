"""Metrics tables — the ClickHouse-dashboard surface as DataFrames.

Mirrors the reference's five metrics tables (infra/clickhouse/
init.sql:7-71) and the Grafana aggregates over them
(infra/grafana/dashboards/crusty.json): per-task fetch outcomes,
per-job completions, queue-depth samples, and per-batch DB-op
timings. The crawler appends one parquet slice per epoch under
``{checkpoint}/metrics/<table>/epoch=N`` — on a real deployment these
are Iceberg table appends, one atomic commit per micro-batch
(clickhouse_utils.rs:37-121's batched inserter semantics).

Dashboard-equivalent aggregates (pages/sec by status, queue
throughput, RX rate) are plain groupBy queries over them — see
``pages_per_epoch`` / ``queue_throughput`` below, the analog of the
Grafana SQL at crusty.json:1682 and 1189-1215.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# metrics_task (init.sql:26-53): one row per fetched page, carrying the
# full fetch-phase breakdown (write_size_b, wait/status/load_time_ms,
# parse_time_micro — init.sql:43-52, types.rs:170-197) so the TX-rate
# and parse-latency dashboard panels are answerable
def task_metrics(parsed: DataFrame, epoch: int) -> DataFrame:
    return parsed.select(
        F.lit(epoch).cast("int").alias("epoch"),
        "domain",
        "url",
        "status",
        F.when(F.col("status") != 200, "error")
        .when(F.col("oversize"), "oversize")
        .when(~F.col("content_type").startswith("image/"), "filtered")
        .otherwise("ok")
        .alias("term_by"),
        F.coalesce("read_size_b", F.lit(0)).alias("read_size_b"),
        F.coalesce("write_size_b", F.lit(0)).alias("write_size_b"),
        F.coalesce("wait_time_ms", F.lit(0)).alias("wait_time_ms"),
        F.coalesce("status_time_ms", F.lit(0)).alias("status_time_ms"),
        F.coalesce("load_time_ms", F.lit(0)).alias("load_time_ms"),
        F.coalesce("parse_time_micro", F.lit(0)).alias("parse_time_micro"),
        F.coalesce("phash_ok", F.lit(False)).alias("payload_ok"),
    )


# metrics_job (init.sql:55-63): one row per finished domain, carrying
# WHY it ended (term_by — types.rs:330-361 labels timeouts vs "Ok")
# and the lease age at finish (duration_epochs — the epoch-cadence
# analog of duration_sec, types.rs:357), so the dashboard can split
# drained vs page_budget vs hard_timeout completions
def job_metrics(done: DataFrame, epoch: int) -> DataFrame:
    return done.select(
        F.lit(epoch).cast("int").alias("epoch"),
        "domain",
        "shard",
        F.col("pages_crawled"),
        "term_by",
        "duration_epochs",
    )


# metrics_queue (init.sql:18-24): backlog samples per epoch
def queue_metrics(frontier: DataFrame, leases: DataFrame, epoch: int) -> DataFrame:
    q = (
        frontier.groupBy("state")
        .agg(F.count("*").alias("n"))
        .select(F.lit(epoch).cast("int").alias("epoch"), F.col("state").alias("queue"), "n")
    )
    l = leases.agg(F.count("*").alias("n")).select(
        F.lit(epoch).cast("int").alias("epoch"), F.lit("leased").alias("queue"), "n"
    )
    return q.unionByName(l)


def append_epoch_metrics(base_dir: str, name: str, df: DataFrame, epoch: int) -> None:
    # plain subdir (not key=value): the epoch lives in the data, so no
    # partition-inference collision on read
    df.write.mode("overwrite").parquet(os.path.join(base_dir, "metrics", name, f"e{epoch:06d}"))


def read_metrics(spark: SparkSession, base_dir: str, name: str) -> DataFrame:
    # mergeSchema: a checkpoint resumed across an engine upgrade holds
    # per-epoch deltas with different schemas (e.g. metrics_job rows
    # written before term_by/duration_epochs existed); schema inference
    # from one footer would drop the new columns for old epochs or fail
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(os.path.join(base_dir, "metrics", name, "e*"))
    )


# --- dashboard-equivalent aggregates (Grafana SQL analogs) -------------


def pages_per_epoch(task_m: DataFrame) -> DataFrame:
    """pages/sec ok|error per epoch (crusty.json:1682)."""
    return task_m.groupBy("epoch", "term_by").agg(
        F.count("*").alias("pages"), F.sum("read_size_b").alias("rx_bytes")
    )


def tx_rx_per_epoch(task_m: DataFrame) -> DataFrame:
    """RX/TX rate panel analog (crusty.json:1357 plots both directions
    over read_size_b/write_size_b): bytes read and written per epoch."""
    return task_m.groupBy("epoch").agg(
        F.sum("read_size_b").alias("rx_bytes"),
        F.sum("write_size_b").alias("tx_bytes"),
        F.count("*").alias("pages"),
    )


def parse_time_stats(task_m: DataFrame) -> DataFrame:
    """Parse-latency panel analog (over metrics_task.parse_time_micro,
    init.sql:52): mean parse time per parsed page and per MB read."""
    ok = task_m.filter(F.col("term_by") == "ok")
    return ok.groupBy("epoch").agg(
        F.round(F.avg("parse_time_micro"), 1).alias("avg_parse_micro"),
        F.round(
            F.sum("parse_time_micro") / (F.sum("read_size_b") / F.lit(1_000_000.0)), 1
        ).alias("micro_per_mb"),
        F.count("*").alias("parsed_pages"),
    )


def job_finish_breakdown(job_m: DataFrame) -> DataFrame:
    """Finish-attribution panel analog (metrics_job.term_by,
    init.sql:55-63): how many jobs ended each way per epoch, with the
    mean lease age at finish — a dashboard reading this distinguishes
    a healthy crawl (drained/page_budget) from one force-killing stuck
    jobs (hard_timeout)."""
    return job_m.groupBy("epoch", "term_by").agg(
        F.count("*").alias("jobs"),
        F.round(F.avg("duration_epochs"), 2).alias("avg_duration_epochs"),
        F.sum("pages_crawled").alias("pages"),
    )


def queue_throughput(queue_m: DataFrame) -> DataFrame:
    """queued/leased/done depth per epoch (crusty.json:1189-1215)."""
    return queue_m.groupBy("epoch").pivot("queue").agg(F.first("n"))


def stage_latency(db_m: DataFrame) -> DataFrame:
    """Which stage regressed? — the Grafana queue-op latency panel
    analog (crusty.json:1517-1543 over the reference's per-DB-op
    took_ms/since_last_ms columns, types.rs:142-154): mean and max ms
    per pipeline stage across epochs, slowest stage first."""
    stages = ["dequeue_ms", "fetch_ms", "expand_ms", "finish_ms"]
    stacked = None
    for s in stages:
        one = db_m.select(
            F.lit(s.removesuffix("_ms")).alias("stage"), F.col(s).alias("ms")
        )
        stacked = one if stacked is None else stacked.unionByName(one)
    return (
        stacked.groupBy("stage")
        .agg(
            F.round(F.avg("ms"), 1).alias("avg_ms"),
            F.max("ms").alias("max_ms"),
            F.count("*").alias("n_epochs"),
        )
        .orderBy(F.desc("avg_ms"))
    )


def domain_topk_latest(topk_m: DataFrame) -> DataFrame:
    """Grafana domain-topk panel analog (crusty.json:1008:
    ``argMax(hits, created_at)``) over the persisted per-consume-epoch
    ``metrics_topk`` history (reference table types.rs:400-409,
    infra/clickhouse/init.sql:65-71): each domain's hits as of its most
    recent snapshot."""
    return topk_m.groupBy("tld", "domain").agg(
        F.max_by("hits", "epoch").alias("hits"), F.max("epoch").alias("epoch")
    )
