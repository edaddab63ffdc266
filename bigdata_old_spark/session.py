"""SparkSession factory with engine-appropriate defaults.

Tuned for correctness tests on local[32]; the same settings are the
right starting point on a real cluster (AQE handles the rest at scale).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "bigdata-old-spark", shuffle_partitions: int | None = None) -> SparkSession:
    # Python workers (mapInPandas/pandas-UDF paths, e.g. the streaming
    # N-Triples parser) must be able to import this package no matter
    # what the DRIVER's cwd is: export the package root on PYTHONPATH
    # before the JVM forks workers (a driver running from /tmp with a
    # sys.path hack would otherwise fail only at worker-deserialize
    # time).  On a real cluster the same role is played by --py-files.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SQL_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime re-planning — coalesce post-shuffle partitions,
        # convert to broadcast joins when a side turns out small, split
        # skewed partitions.  This replaces the reference's runtime
        # optimizer (RTO / JGraph cutoff sampling).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for the (rare) pandas-UDF paths.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # zstd parquet: 40% smaller store than snappy (224 vs 378 MB at
        # sf0.1) at equal warm write time (5.4 vs 5.1-5.4 s) and equal
        # or better scan time — at 100 TB that is 40% less read I/O for
        # free (guide §6).  Parameterized for deployments that must
        # match an existing lake codec.
        .config("spark.sql.parquet.compression.codec",
                os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "zstd"))
        # Large scan splits (guide §9): fewer map tasks per scan cuts
        # task-launch overhead locally (q01/q08/q16 medians 0.19 →
        # ≤0.15 s, q03 unchanged — interleaved A/B) and reduces the map
        # side of every shuffle at scale (§2.2).  Bucketed serving
        # scans keep their per-bucket parallelism regardless.
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "1g"))
        .config("spark.sql.files.openCostInBytes",
                os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES",
                               str(16 * 1024 * 1024)))
        # xsd:dateTime lexical handling is UTC-normalized (parse strips
        # a trailing Z, STR() renders with a 'Z' suffix) — that is only
        # correct when the session timezone IS UTC, so pin it rather
        # than inherit the driver's local zone.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # PySpark 4 captures a Python call site per DataFrame/Column op
        # for enriched errors — one JVM round-trip + stack walk EACH.
        # Measured ~1.4 s of a 2.1 s q03 plan build (cProfile: 499
        # _with_origin wrappers, 7302 py4j send_commands).  An engine
        # building thousands of Column expressions per query wants this
        # off; errors still carry the JVM-side context.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # Scheduler mode is workload-dependent: FAIR + per-request pools
        # (server.SparqlHandler tags them) lifts CONCURRENT serving
        # substantially — read-only 685.8 → 921.0 QMpH @ 4 clients and
        # the 1-writer mix 452.5 → 654.1 on the sf0.1 harness
        # (BENCH_QMPH.md addendum 3; bench.py --qmph sets FAIR) — but an
        # alternating fresh-process A/B measured FAIR 15-25% SLOWER for
        # single-threaded batch (headline medians 6.6-8.1 s vs FIFO
        # 5.0-6.1 s interleaved on one box session), so the default
        # stays FIFO and concurrent deployments opt in with
        # SPARK_GRAFT_SCHEDULER_MODE=FAIR.
        .config("spark.scheduler.mode",
                os.environ.get("SPARK_GRAFT_SCHEDULER_MODE", "FIFO"))
        # file:// without client-side .crc twins: the default
        # ChecksumFileSystem doubles every file create, and with no
        # native-hadoop lib each create's setPermission FORKS a chmod
        # (jstack'd: RawLocalFileSystem.setPermission → Shell.execCommand
        # inside every parquet-writer open).  A 1,824-file bucketed
        # store write spent 23 of 28 s/task blocked in those forks;
        # RawLocalFileSystem cut the write stage 28 → 7 s/task (now
        # CPU-bound).  Parquet pages carry their own checksums and real
        # clusters checksum at the storage layer (HDFS/S3), so local
        # client-side CRC is pure overhead; only the file:// scheme is
        # affected.
        .config("spark.hadoop.fs.file.impl",
                "org.apache.hadoop.fs.RawLocalFileSystem")
    )
    return builder.getOrCreate()
