"""SparkSession factory tuned for the crawl engine.

Local-mode testing uses ``local[N]``; on a real cluster the same
builder (minus master) is used via ``spark-submit --py-files``. The
shuffle-partition count tracks parallelism so the frontier's
per-shard operators neither underfill cores nor fragment into tiny
tasks; AQE handles runtime coalescing and skew splits on top.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession


def _package_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_pythonpath() -> None:
    """Python workers are separate processes: they must be able to import
    crusty_spark even when the driver wasn't launched from the repo.
    Local mode inherits PYTHONPATH; real clusters get the zip via
    ``--py-files`` (ship_package_zip)."""
    root = _package_root()
    pp = os.environ.get("PYTHONPATH", "")
    if root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{root}{os.pathsep}{pp}" if pp else root
    # One BLAS thread per Python worker: N workers x multithreaded GEMM
    # oversubscribes the box and *anti-scales* (measured 3.5x slowdown
    # at local[32] vs local[8] before this). Spark tasks are the
    # parallelism unit; the math kernels must stay single-threaded.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")


def ship_package_zip(spark: SparkSession) -> str:
    """Zip crusty_spark and addPyFile it — the spark-submit --py-files
    equivalent for sessions created programmatically (works on real
    multi-executor clusters, not just local mode)."""
    root = _package_root()
    tmp = tempfile.mkdtemp(prefix="crusty_spark_pyfiles_")
    zip_base = os.path.join(tmp, "crusty_spark")
    path = shutil.make_archive(zip_base, "zip", root_dir=root, base_dir="crusty_spark")
    spark.sparkContext.addPyFile(path)
    return path


def local_scratch_root() -> str:
    """Per-USER tmpfs scratch root for spark.local.dir — the uid in the
    path means no two users' Spark dirs ever share a parent, so scratch
    cleanup can never race another user's live JVM."""
    return f"/dev/shm/crusty-spark-local-{os.getuid()}"


def local_scratch_dir() -> str:
    """Per-PROCESS scratch dir: {root}/{pid}. A crashed JVM leaves its
    dir behind (tmpfs = RAM), but the owning pid is in the name, so
    ``cleanup_stale_scratch`` can safely reap exactly the dirs whose
    process is gone — no pgrep pattern-match, no TOCTOU against a JVM
    that starts mid-cleanup."""
    return os.path.join(local_scratch_root(), str(os.getpid()))


def _dir_in_use(path: str) -> bool:
    """True if any live process holds an open fd (or its cwd) inside
    ``path`` — the belt-and-suspenders guard for the orphan window
    where a Python driver died but its child JVM briefly outlives it
    and is still writing shuffle files into the driver-pid-named dir.
    Scans /proc; unreadable entries (raced exits, permissions) are
    skipped — absence of evidence keeps the dir eligible, which only
    risks a leak, never a delete-under-a-live-writer in the cases we
    can observe."""
    prefix = path.rstrip(os.sep) + os.sep
    try:
        pids = [e for e in os.listdir("/proc") if e.isdigit()]
    except OSError:
        return False
    for pid in pids:
        try:
            cwd = os.readlink(f"/proc/{pid}/cwd")
            if cwd == path or cwd.startswith(prefix):
                return True
            for fd in os.listdir(f"/proc/{pid}/fd"):
                tgt = os.readlink(f"/proc/{pid}/fd/{fd}")
                if tgt.startswith(prefix):
                    return True
        except OSError:
            continue  # process exited mid-scan or fd not readable
    return False


def cleanup_stale_scratch() -> list[str]:
    """Remove scratch dirs under this user's root whose owning process
    no longer exists. Only ever touches dirs this module created (the
    uid-scoped root), and only those whose pid is dead — a live pid's
    dir is left alone even if that process isn't Spark. A dead-pid dir
    is additionally kept while any live process still has files open
    inside it (the dying-driver / surviving-JVM orphan window)."""
    root = local_scratch_root()
    removed: list[str] = []
    if not os.path.isdir(root):
        return removed
    for entry in os.listdir(root):
        path = os.path.join(root, entry)
        if not entry.isdigit() or not os.path.isdir(path):
            continue
        pid = int(entry)
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)  # signal 0: existence probe only
            alive = True
        except ProcessLookupError:
            alive = False
        except PermissionError:
            alive = True  # exists, owned by someone else somehow: keep
        if not alive and not _dir_in_use(path):
            shutil.rmtree(path, ignore_errors=True)
            removed.append(path)
    return removed


def get_spark(
    app: str = "crusty_spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    _ensure_pythonpath()
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(parallelism, 8)
    b = (
        SparkSession.builder.master(f"local[{parallelism}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(parallelism))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch sizing is BYTES-adaptive (guide section 4.2): the
        # row-count cap alone can't fit both shapes this engine ships —
        # narrow scheduler rows (~70 B: a 4k cap meant 280 KB batches
        # and per-batch numpy/pyarrow overhead dominated; measured
        # kernel throughput 1.28M -> 1.83M rows/s/core at 64k rows) and
        # multi-KB image payloads (where 64k rows would be ~1 GB per
        # in-flight batch). maxBytesPerBatch=16m closes a batch by size
        # first, so payload rows batch at ~16 MB (5k rows of 3 KB, 1.3k
        # rows of 12 KB) while narrow rows reach the 64k row cap
        # (~4.5 MB) — strictly tighter memory than the old 4k cap gave
        # 12 KB image rows (48 MB), and 13x less per-batch overhead on
        # the scheduler hot path.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(16 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("CRUSTY_SPARK_DRIVER_MEM", "24g"))
        # an iterative driver (epoch loop) churns localCheckpoint blocks
        # and shuffle files that the ContextCleaner only reclaims after a
        # JVM GC; the 30min default lets a long session accumulate to
        # heap-thrash (measured: later crawls 6x slower). Collect every
        # minute instead — cheap, bounded accumulation.
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # local-mode shuffle files all land on one device and serialize the
    # executors at high parallelism; tmpfs removes the disk from the
    # path, at which point compression is pure CPU overhead
    if os.path.isdir("/dev/shm"):
        b = (
            b.config("spark.local.dir", local_scratch_dir())
            .config("spark.shuffle.compress", "false")
            .config("spark.shuffle.spill.compress", "false")
        )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
