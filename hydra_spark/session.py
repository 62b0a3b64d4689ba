"""SparkSession factory for the engine.

Local sandbox runs on local[N] (single JVM); on a real cluster the same
builder config applies unchanged except master/memory. Every knob here
scales with `cores` so the local[8] vs local[32] scaling-efficiency
measurement (BASELINE.md) is apples-to-apples: shuffle partitions,
state-store partitions and source partitioning all track parallelism —
no fixed-width stage that would flatten the scaling curve.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# RocksDB-backed state store: state spills to disk instead of growing the
# JVM heap — required posture for 10^12-key state at cluster scale.
ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def _set_allocator_env() -> None:
    """glibc malloc tunables, exported BEFORE the JVM starts so the
    pyspark daemon and every forked worker inherit them.

    The decode path streams multi-MB Arrow batches through the Python
    workers; with default glibc behavior every batch is mmap'd on
    allocation and munmap'd on free, so every pass re-faults gigabytes
    of zero pages. At 32 concurrent workers the kernel zone-lock
    contention makes page faults the dominant cost (measured: 12M
    faults/pass, 60-80%% sys time, and local[32] SLOWER than local[8]).
    Raising the mmap/trim thresholds keeps freed blocks on the heap for
    reuse: measured 12M -> 1.3M faults and ~3x decode throughput at 32
    cores. Same knobs apply per-executor on a real cluster
    (spark.executorEnv.*)."""
    defaults = {
        "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
        "MALLOC_TRIM_THRESHOLD_": str(1 << 30),
        "MALLOC_TOP_PAD_": str(1 << 26),
        "MALLOC_ARENA_MAX": "2",
    }
    for k, v in defaults.items():
        os.environ.setdefault(k, v)


def get_spark(
    cores: int | None = None,
    app_name: str = "hydra_spark",
    shuffle_partitions: int | None = None,
    driver_memory: str = "48g",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    _set_allocator_env()
    # Python workers must be able to import the engine package: classes
    # pickled BY REFERENCE (e.g. the hydra_cdf streaming DataSource)
    # resolve through the worker's import path, not cloudpickle. Export
    # before the JVM/daemon starts; on a real cluster the package ships
    # via --py-files / the image and this is a no-op.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = repo_root + (os.pathsep + pp if pp else "")
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # at cluster scale: 2-3x total executor cores; locally: = cores
        shuffle_partitions = cores

    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # audio rows carry ~10-60 KB binary payloads; cap Arrow batch rows
        # so a decode batch stays ~10-60 MB, not 10k-row default x 60 KB.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
        # incremental (changelog) state checkpoints: upload per-batch
        # deltas, not a full RocksDB snapshot per store per batch
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
        # per-op row counting in RocksDB costs a get per put; metrics
        # come from the listener instead
        .config("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "false")
        .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # INT64 micros, not legacy INT96: INT96 timestamps carry NO
        # parquet column stats, which blinds manifest-level file
        # skipping (tables.plan_files) to every time-range predicate —
        # and Iceberg spec forbids INT96 anyway.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # local FS: driver-side file listing is microseconds; the default
        # threshold (32 paths) launches a 128-task listing job per stream
        # start — pure scheduling overhead here. On object storage with
        # 10^5+ files per table, drop this back to the default so listing
        # distributes.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.maxResultSize", "4g")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
