"""Structured Streaming surface.

The crawl loop itself is a driver-side micro-batch iteration (SURVEY
§7: the frontier is its own feedback loop — epoch k's output feeds
epoch k+1 — which a single streaming query cannot express, and
snapshot-per-epoch gives exact resumability). What *is* stream-shaped
in the reference is the metrics plane: channel-depth sampling every
second and batched metric inserts (reference crusty.rs:10-55,
clickhouse_utils.rs:37-121). This module expresses that plane as a
real Structured Streaming pipeline: an event stream -> watermarked
tumbling-window aggregation -> sink per trigger, the Spark-native
replacement for crusty's permit-emitter + relabuf batching
(crusty.rs:216-230, conf/default.yaml:62-65).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def task_event_stream(spark: SparkSession, rows_per_second: int = 500) -> DataFrame:
    """Synthetic metrics_task event stream from the rate source: each
    tick becomes a fetch-outcome event with a hash-derived status,
    shaped like types.rs:170-197's TaskMeasurement rows."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    r = F.pmod(F.xxhash64("value"), F.lit(50))
    return rate.select(
        F.col("timestamp").alias("ts"),
        F.col("value").alias("task_id"),
        F.when(r == 0, 404).when(r == 1, 500).otherwise(200).alias("status"),
        (F.pmod(F.xxhash64("value", F.lit(1)), F.lit(20000)) + 500).alias("read_size_b"),
    )


def windowed_task_rates(events: DataFrame, window: str = "2 seconds", watermark: str = "2 seconds") -> DataFrame:
    """Watermarked tumbling-window pages/RX aggregation — the streaming
    twin of the Grafana pages/sec panel (crusty.json:1682). Late rows
    beyond the watermark are dropped, state is bounded."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("w"),
            F.when(F.col("status") == 200, "ok").otherwise("error").alias("term_by"),
        )
        .agg(
            F.count("*").alias("pages"),
            F.sum("read_size_b").alias("rx_bytes"),
        )
        .select(F.col("w.start").alias("window_start"), "term_by", "pages", "rx_bytes")
    )


def url_event_stream(spark: SparkSession, rows_per_second: int = 500, n_domains: int = 8, n_paths: int = 40) -> DataFrame:
    """Synthetic discovered-URL stream: repeats are frequent by
    construction (value space n_domains x n_paths), which is what the
    stateful seen-filter below exists to drop."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return rate.select(
        F.col("timestamp").alias("ts"),
        F.concat(
            F.lit("site"), F.pmod(F.xxhash64("value"), F.lit(n_domains)).cast("string"),
            F.lit(".com"),
        ).alias("domain"),
        F.pmod(F.xxhash64("value", F.lit(7)), F.lit(n_paths)).alias("url_hash"),
    )


def jittered_url_event_stream(
    spark: SparkSession,
    rows_per_second: int = 500,
    n_domains: int = 8,
    max_late_s: float = 2.0,
) -> DataFrame:
    """Synthetic OUT-OF-ORDER request stream: event time lags arrival
    by a hash-derived jitter in [0, max_late_s] (quantized to 1/4 s),
    so events arrive up to max_late_s late relative to event order —
    the bounded-disorder regime the buffered token bucket's
    ``late_buffer_s`` exists for. url_hash is the unique tick value so
    (ts, url_hash) is a total order."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    late = (
        F.pmod(F.xxhash64("value", F.lit(3)), F.lit(int(4 * max_late_s) + 1)).cast(
            "double"
        )
        / 4.0
    )
    return rate.select(
        F.timestamp_seconds(
            F.unix_micros("timestamp").cast("double") / 1e6 - late
        ).alias("ts"),
        F.concat(
            F.lit("site"), F.pmod(F.xxhash64("value"), F.lit(n_domains)).cast("string"),
            F.lit(".com"),
        ).alias("domain"),
        F.col("value").alias("url_hash"),
    )


def streaming_seen_filter(events: DataFrame, max_state: int = 100_000) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): a
    per-domain URL-seen set that passes only FIRST occurrences through —
    the in-stream analog of the crawl loop's J7 discovery dedup / J1
    history gate (reference lib.rs:187-194), for deployments that feed
    the frontier from a continuous discovery stream instead of epoch
    batches. State per domain is a bounded array of seen url_hashes
    (beyond ``max_state`` new URLs are dropped, the LRU-cap analog of
    conf/default.yaml:249-254)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def dedup(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        out = []
        for pdf in pdfs:
            for uh in pdf["url_hash"]:
                uh = int(uh)
                if uh not in seen and len(seen) < max_state:
                    seen.add(uh)
                    out.append((key[0], uh))
        state.update((list(seen),))
        yield pd.DataFrame(out, columns=["domain", "url_hash"])

    return events.groupBy("domain").applyInPandasWithState(
        dedup,
        outputStructType="domain string, url_hash long",
        stateStructType="seen array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_token_bucket(
    events: DataFrame,
    concurrency: int = 2,
    delay_s: float = 1.0,
    late_buffer_s: float | None = None,
) -> DataFrame:
    """Custom stateful streaming operator: per-domain politeness token
    bucket over a fetch-request stream — the in-stream analog of
    ``frontier.allowance`` (reference per-domain politeness:
    concurrency + crawl-delay, conf/default.yaml:199-207), for
    deployments that admit fetches from a continuous request stream
    instead of epoch batches. rate = concurrency/(1+delay) tokens/sec,
    cap = concurrency; each request refills by rate*Δt(event time),
    then is admitted iff a whole token is available (and spends it) —
    rejected requests pass through flagged for re-queue, mirroring how
    the reference defers rather than drops.

    State per domain is two doubles. Within a micro-batch, a domain's
    requests are processed in (event-time, url_hash) order; for an
    IN-EVENT-TIME-ORDER stream (events never arrive in a later batch
    with an earlier timestamp than the persisted clock) admission is
    therefore independent of micro-batch boundaries, which is what
    makes the exact-equality test against the scalar twin
    (:func:`py_token_bucket`) possible. A LATE event — one arriving
    after the state clock has already advanced past its timestamp —
    gets no retroactive refill and is judged against the advanced
    clock (``last = max(last, ts)``), so out-of-order deployments
    should not expect twin equality from the unbuffered mode. The
    per-group loop runs over one domain's requests in a batch (bounded
    by the domain's request rate), not per-row Python over the
    stream.

    ``late_buffer_s`` opts into EVENT-TIME-EXACT admission under
    bounded lateness (the watermark-buffer pattern): each domain's
    requests are held in state and only processed — in (event-time,
    url_hash) order — once the domain's max observed event time has
    advanced ``late_buffer_s`` past them, so any event arriving within
    that bound lands in its correct event-time position and the
    admitted flags equal the scalar twin replayed over the sorted
    sequence. The trade is emission latency (an event is emitted one
    buffer-width after its position is safe) and state (the buffer
    holds ~rate x late_buffer_s rows per domain). Disorder BEYOND the
    bound degrades gracefully to the unbuffered rule: the straggler is
    processed in the next batch against the advanced clock, no
    retroactive refill. Events still inside the buffer when the query
    stops are unemitted (same as any windowed stream's tail)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cap = float(concurrency)
    rate = cap / (1.0 + delay_s)

    def gate(key, pdfs, state: GroupState):
        tokens, last = state.get if state.exists else (cap, float("-inf"))
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "url_hash"], kind="mergesort")
        admitted = []
        for t in rows["ts"]:
            ts = t.timestamp()
            if last != float("-inf") and ts > last:
                tokens = min(tokens + rate * (ts - last), cap)
            last = max(last, ts)
            if tokens >= 1.0:
                tokens -= 1.0
                admitted.append(True)
            else:
                admitted.append(False)
        state.update((tokens, last))
        out = rows.assign(domain=key[0], admitted=admitted)
        yield out[["domain", "url_hash", "ts", "admitted"]]

    def gate_buffered(key, pdfs, state: GroupState):
        if state.exists:
            tokens, last, buf_ts, buf_uh, clock = state.get
            pending = list(zip(buf_ts, buf_uh))
        else:
            tokens, last, pending, clock = cap, float("-inf"), [], float("-inf")
        rows = pd.concat(list(pdfs), ignore_index=True)
        for t, uh in zip(rows["ts"], rows["url_hash"]):
            ts = t.timestamp()
            pending.append((ts, int(uh)))
            clock = max(clock, ts)
        horizon = clock - late_buffer_s
        pending.sort()
        out, keep = [], []
        for ts, uh in pending:
            if ts > horizon:
                keep.append((ts, uh))
                continue
            if last != float("-inf") and ts > last:
                tokens = min(tokens + rate * (ts - last), cap)
            last = max(last, ts)
            if tokens >= 1.0:
                tokens -= 1.0
                out.append((key[0], uh, ts, True))
            else:
                out.append((key[0], uh, ts, False))
        state.update(
            (tokens, last, [t for t, _ in keep], [u for _, u in keep], clock)
        )
        df = pd.DataFrame(out, columns=["domain", "url_hash", "ts", "admitted"])
        # round float seconds to whole microseconds: Spark timestamps
        # are us-precision and Arrow refuses a lossy ns->us cast
        df["ts"] = pd.to_datetime(
            (df["ts"] * 1e6).round().astype("int64"), unit="us"
        )
        yield df

    if late_buffer_s is None:
        fn, state_schema = gate, "tokens double, last_ts double"
    else:
        fn = gate_buffered
        state_schema = (
            "tokens double, last_ts double, buf_ts array<double>, "
            "buf_uh array<long>, clock double"
        )
    return events.groupBy("domain").applyInPandasWithState(
        fn,
        outputStructType="domain string, url_hash long, ts timestamp, admitted boolean",
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def py_token_bucket(
    rows: list[tuple[float, int]], concurrency: int = 2, delay_s: float = 1.0
) -> list[bool]:
    """Scalar twin of streaming_token_bucket for ONE domain: rows =
    [(ts_seconds, url_hash)] in arrival order; returns admitted flags
    after sorting by (ts, url_hash) — batch-boundary-independent, so it
    must match the streaming operator exactly."""
    cap = float(concurrency)
    rate = cap / (1.0 + delay_s)
    tokens, last = cap, float("-inf")
    flags: dict[tuple[float, int], bool] = {}
    for ts, uh in sorted(rows):
        if last != float("-inf") and ts > last:
            tokens = min(tokens + rate * (ts - last), cap)
        last = max(last, ts)
        if tokens >= 1.0:
            tokens -= 1.0
            flags[(ts, uh)] = True
        else:
            flags[(ts, uh)] = False
    return [flags[(ts, uh)] for ts, uh in sorted(rows)]


def run_metrics_stream(spark: SparkSession, seconds: float = 15.0, rows_per_second: int = 500) -> DataFrame:
    """NOTE: append mode emits a window only after the watermark passes
    its end AND a later trigger fires — budget `seconds` accordingly
    (>= ~3x window + watermark)."""
    return _run_metrics_stream(spark, seconds, rows_per_second)


def _run_metrics_stream(spark: SparkSession, seconds: float, rows_per_second: int) -> DataFrame:
    """Run the metrics stream into an in-memory sink for `seconds`,
    return the collected windows as a batch DataFrame."""
    import time
    import uuid

    name = f"metrics_stream_{uuid.uuid4().hex[:8]}"
    q = (
        windowed_task_rates(task_event_stream(spark, rows_per_second))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # NOTE: no processAllAvailable() — the rate source is unbounded,
        # so "all available" never arrives; run wall-clock then stop.
        time.sleep(seconds)
    finally:
        q.stop()
    return spark.table(name)
