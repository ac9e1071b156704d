"""Extra benchmarks for optimization work (round 6). NOT the frozen
driver bench — see bench.py for the measurement of record.

Modes (all print one JSON line):

  python bench_extra.py epoch-stages [cpus] [rows]
      One pops-bench epoch (same pipeline as bench.py's one_epoch) with
      each stage isolated behind a noop sink (guide section 1.4):
      dequeue alone, dequeue+select, full epoch. Pinned like bench.py.

  python bench_extra.py headline [sf_dir]
      Per-query noop timing of the 12 headline queries (same protocol
      as bench.py part 1) without the scaling part.

  python bench_extra.py explain <query> [sf_dir] [out_file]
      Write .explain("formatted") for a declared query to out_file.

  python bench_extra.py kernel [rows]
      Micro-benchmark of the fetch+parse Arrow kernel alone (no Spark):
      feeds synthetic batches straight through the parse kernel.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time

from pyspark.sql import functions as F


def _get_spark(cpus: int, app: str):
    from crusty_spark.session import get_spark

    return get_spark(app=app, parallelism=cpus, shuffle_partitions=max(2 * cpus, 8))


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


def epoch_stages(cpus: int, n_rows: int) -> None:
    # BENCH_EXTRA_CPUSET="8-23" pins to an explicit range (e.g. to avoid
    # a concurrently running test suite); default mirrors bench.py.
    cpuset = os.environ.get("BENCH_EXTRA_CPUSET")
    if cpuset:
        lo, hi = cpuset.split("-")
        cores = set(range(int(lo), int(hi) + 1))
        assert len(cores) == cpus, f"cpuset {cpuset} != {cpus} cpus"
    else:
        cores = set(range(cpus))
    try:
        os.sched_setaffinity(0, cores)
    except (AttributeError, OSError):
        pass
    import bench as B
    from crusty_spark import fetch as FE
    from crusty_spark import frontier as FR
    from crusty_spark.fixtures import images_df
    from crusty_spark.frontier import CrawlConfig

    spark = _get_spark(cpus, f"bench_extra_stages_{cpus}")
    cfg = CrawlConfig(shard_total=32, dequeue_limit=500_000, domain_concurrency=8)
    t0 = time.monotonic()
    frontier = (
        B.synth_frontier(spark, n_rows, cfg)
        .repartition(spark.sparkContext.defaultParallelism * 2, "domain")
        .sortWithinPartitions("domain", "depth", "url_hash")
        .cache()
    )
    frontier.count()
    t_mat = round(time.monotonic() - t0, 3)
    images = images_df(spark, B.N_IMAGES, sizes=[B.IMAGE_SIZE]).cache()
    images.count()
    store = FE.payload_store(images)

    out = {"cpus": cpus, "rows": n_rows, "materialize_s": t_mat}

    def mk_leases():
        return FR.dequeue(frontier, FR.empty_leases(spark), FR.empty_job_state(spark), 1, cfg)

    def mk_tasks():
        leases = mk_leases()
        allow = leases.select(
            "domain", "shard", F.lit(cfg.domain_concurrency).cast("int").alias("allowed")
        )
        return FR.select_fetch_tasks(frontier, allow, cfg)

    def mk_parsed():
        return FE.fetch_and_parse(mk_tasks(), images, B.N_IMAGES, store_bc=store)

    # warmup full epoch once (JIT, worker fork)
    spark.sparkContext.setJobDescription("warmup full epoch")
    mk_parsed().count()

    for name, mk in [("dequeue", mk_leases), ("select_tasks", mk_tasks), ("full_epoch", mk_parsed)]:
        spark.sparkContext.setJobDescription(f"stage: {name}")
        out[name + "_s"] = _noop(mk())
    # count-based full epoch (what bench.py times)
    t0 = time.monotonic()
    out["full_epoch_pops"] = mk_parsed().count()
    out["full_epoch_count_s"] = round(time.monotonic() - t0, 3)
    print(json.dumps(out))
    spark.stop()


def headline(sf_dir: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as E
    import bench as B

    queries = E.queries()
    spark = _get_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), "bench_extra_headline")
    for name in B.HEADLINE:  # warmup on smallest sf
        queries[name](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    per_q = {}
    for name in B.HEADLINE:
        spark.sparkContext.setJobDescription(name)
        per_q[name] = _noop(queries[name](spark, sf_dir))
    print(json.dumps({"sf_dir": sf_dir, "total": round(sum(per_q.values()), 3), "queries": per_q}))
    spark.stop()


def explain(query: str, sf_dir: str, out_file: str | None) -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as E

    queries = E.queries()
    spark = _get_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), "bench_extra_explain")
    df = queries[query](spark, sf_dir)
    buf = io.StringIO()
    stdout, sys.stdout = sys.stdout, buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = stdout
    text = buf.getvalue()
    if out_file:
        with open(out_file, "w") as f:
            f.write(text)
    else:
        print(text)
    spark.stop()


def kernel(n_rows: int, batch_rows: int = 65536) -> None:
    """Time the parse kernel alone on synthetic Arrow batches.
    Default batch size mirrors the session's narrow-row Arrow batching
    (maxRecordsPerBatch=65536 under the 16 MB byte cap — session.py);
    pass a second arg to measure other sizes (4096 was the old cap:
    1.28M rows/s/core vs 1.83M at 65536)."""
    import numpy as np
    import pandas as pd

    from crusty_spark import fetch as FE
    from crusty_spark.fixtures import gen_image_row

    n_images = 512
    rng = np.random.default_rng(7)
    ids = np.empty(n_images, dtype=object)
    captions = np.empty(n_images, dtype=object)
    phashes = np.zeros(n_images, dtype=np.int64)
    blobs = []
    for i in range(n_images):
        image_id, data, w, h, fmt, caption, ph = gen_image_row(i, sizes=[64])
        ids[i] = image_id
        captions[i] = caption
        phashes[i] = ph
        blobs.append(bytes(data))

    class FakeBC:
        value = {"image_id": ids, "bytes": blobs, "caption": captions, "phash": phashes}

    import pyarrow as pa

    batches = []
    for start in range(0, n_rows, batch_rows):
        m = min(batch_rows, n_rows - start)
        uh = rng.integers(-(2**62), 2**62, size=m, dtype=np.int64)
        batches.append(
            pa.RecordBatch.from_arrays(
                [
                    pa.array([f"http://host{i}.com/p{i % 1000}" for i in range(m)]),
                    pa.array(uh),
                    pa.array([f"host{i}.com" for i in range(m)]),
                    pa.array(np.zeros(m, dtype=np.int32)),
                ],
                names=["url", "url_hash", "domain", "depth"],
            )
        )
    t0 = time.monotonic()
    total = 0
    for out in FE._parse_arrow(iter(batches), n_images, FakeBC):
        total += out.num_rows
    took = time.monotonic() - t0
    print(
        json.dumps(
            {"rows": total, "sec": round(took, 3), "rows_per_sec": round(total / took, 1)}
        )
    )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "epoch-stages"
    if mode == "epoch-stages":
        epoch_stages(
            int(sys.argv[2]) if len(sys.argv) > 2 else 16,
            int(sys.argv[3]) if len(sys.argv) > 3 else 16_000_000,
        )
    elif mode == "headline":
        headline(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1")
    elif mode == "explain":
        explain(
            sys.argv[2],
            sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1",
            sys.argv[4] if len(sys.argv) > 4 else None,
        )
    elif mode == "kernel":
        kernel(
            int(sys.argv[2]) if len(sys.argv) > 2 else 100_000,
            int(sys.argv[3]) if len(sys.argv) > 3 else 65536,
        )
    else:
        raise SystemExit(f"unknown mode {mode}")
